package graft.multimodal

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import AudioVideo.{WavCodec, Y4mCodec}

class AudioVideoSpec extends SparkTestBase {

  private def testPcm(n: Int): WavCodec.Pcm =
    WavCodec.Pcm(8000, Array.tabulate(n)(i => ((i * 2531 + 7) % 65536 - 32768).toShort))

  test("WAV round-trips PCM16 bit-exactly through real chunk walking") {
    for (n <- Seq(1, 159, 160, 4001)) {
      val pcm = testPcm(n)
      val dec = WavCodec.decode(WavCodec.encode(pcm))
      assert(dec.sampleRate == 8000)
      assert(dec.samples.toSeq == pcm.samples.toSeq, s"n=$n")
    }
  }

  test("WAV decoder skips unknown chunks with RIFF even-byte padding") {
    // The encoder already writes an odd-sized JUNK chunk; a parser that
    // forgets the pad byte lands mid-stream and must not reach data
    // intact. Also check a hand-built layout with a trailing LIST chunk.
    val pcm = testPcm(10)
    val base = WavCodec.encode(pcm)
    assert(new String(base, 36, 4, "US-ASCII") == "JUNK") // odd JUNK is really there
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withTail = base ++ list
    // patch the RIFF size to cover the appended chunk
    val bb = java.nio.ByteBuffer.wrap(withTail).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withTail.length - 8)
    val dec = WavCodec.decode(withTail)
    assert(dec.samples.toSeq == pcm.samples.toSeq)
  }

  test("malformed WAV fails loudly, never a silent wrong decode") {
    val good = WavCodec.encode(testPcm(8))
    intercept[IllegalArgumentException](WavCodec.decode("OggS----".getBytes))
    intercept[IllegalArgumentException](WavCodec.decode(good.dropRight(3))) // truncated data
    // stereo / float / 8-bit fmt variants are out of contract
    def patched(off: Int, v: Short): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(off, v)
      b
    }
    intercept[IllegalArgumentException](WavCodec.decode(patched(20, 3))) // IEEE float
    intercept[IllegalArgumentException](WavCodec.decode(patched(22, 2))) // stereo
    intercept[IllegalArgumentException](WavCodec.decode(patched(34, 8))) // 8-bit
  }

  private def testVideo(chroma: String, nf: Int): Y4mCodec.Video =
    Y4mCodec.Video(8, 4, chroma,
      Array.tabulate(nf)(f => Array.tabulate(32)(j => ((f * 97 + j * 13) % 256).toByte)))

  test("Y4M round-trips luma through C444 and C420 chroma plane math") {
    for (chroma <- Seq("444", "420jpeg", "420")) {
      val v = testVideo(chroma, 3)
      val enc = Y4mCodec.encode(v, (f, c) => ((f + c) % 256).toByte)
      val dec = Y4mCodec.decode(enc)
      assert(dec.width == 8 && dec.height == 4 && dec.chroma == chroma)
      assert(dec.yPlanes.length == 3, chroma)
      for (f <- 0 until 3)
        assert(dec.yPlanes(f).toSeq == v.yPlanes(f).toSeq, s"C$chroma frame $f")
    }
    // C444 vs C420 of the same luma: different container length (the
    // chroma planes), identical decoded luma — the q81 contract.
    val y = testVideo("444", 2).yPlanes
    val full = Y4mCodec.encode(Y4mCodec.Video(8, 4, "444", y), (_, _) => 1.toByte)
    val sub = Y4mCodec.encode(Y4mCodec.Video(8, 4, "420jpeg", y), (_, _) => 1.toByte)
    assert(full.length > sub.length)
    assert(Y4mCodec.decode(full).yPlanes.map(_.toSeq).toSeq ==
      Y4mCodec.decode(sub).yPlanes.map(_.toSeq).toSeq)
  }

  test("Y4M header tags parse in any order; FRAME params are tolerated") {
    val y = Array.tabulate(32)(j => j.toByte)
    val bytes = "YUV4MPEG2 F25:1 C444 H4 Ip W8 A1:1\nFRAME Xsome=param\n"
      .getBytes("US-ASCII") ++ y ++ new Array[Byte](64)
    val dec = Y4mCodec.decode(bytes)
    assert(dec.width == 8 && dec.height == 4 && dec.yPlanes.length == 1)
    assert(dec.yPlanes(0).toSeq == y.toSeq)
  }

  test("malformed Y4M fails loudly") {
    val good = Y4mCodec.encode(testVideo("444", 2), (_, _) => 0.toByte)
    intercept[IllegalArgumentException](Y4mCodec.decode("MPEG-TS\n".getBytes))
    intercept[IllegalArgumentException](Y4mCodec.decode(good.dropRight(5))) // truncated frame
    intercept[IllegalArgumentException]( // unsupported chroma
      Y4mCodec.decode("YUV4MPEG2 W8 H4 C422\nFRAME\n".getBytes ++ new Array[Byte](64)))
    intercept[IllegalArgumentException]( // C420 needs even dims
      Y4mCodec.decode("YUV4MPEG2 W7 H3 C420jpeg\nFRAME\n".getBytes ++ new Array[Byte](32)))
    val headerOnly = good.take(good.indexOf('\n'.toByte) + 1)
    intercept[IllegalArgumentException](Y4mCodec.decode(headerOnly)) // zero frames
  }

  test("malformed media never escapes as raw index errors (fuzz)") {
    // same contract as the binlog decoder's fuzz pin: every codec has
    // exactly ONE failure mode (IllegalArgumentException) — truncation,
    // bit flips, and garbage must never leak array/number errors
    val goodWav = WavCodec.encode(testPcm(300))
    val goodY4m = Y4mCodec.encode(testVideo("420jpeg", 3), (f, c) => (f ^ c).toByte)
    val goodPpm = Multimodal.ImageCodecs.encodePpm(
      Multimodal.ImageCodecs.Image(6, 4, Array.tabulate(72)(_.toByte)))
    val goodBmp = Multimodal.ImageCodecs.encodeBmp(
      Multimodal.ImageCodecs.Image(5, 3, Array.tabulate(45)(_.toByte)))
    val rnd = new scala.util.Random(7)
    val cases: Seq[(String, Array[Byte] => Any, Array[Byte])] = Seq(
      ("wav", WavCodec.decode _, goodWav),
      ("y4m", Y4mCodec.decode _, goodY4m),
      ("ppm", Multimodal.ImageCodecs.decode _, goodPpm),
      ("bmp", Multimodal.ImageCodecs.decode _, goodBmp))
    for ((name, dec, good) <- cases; i <- 1 to 200) {
      val mutated = rnd.nextInt(3) match {
        case 0 => good.take(rnd.nextInt(good.length))
        case 1 =>
          val b = good.clone(); val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => good.take(rnd.nextInt(12)) ++
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      }
      try dec(mutated)
      catch {
        case _: IllegalArgumentException => // the ONE allowed failure mode
        case e: Throwable =>
          fail(s"$name iteration $i leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("binaryFile ingestion: WAV files on disk decode to the same features") {
    // the claimed 100 TB shape: media arrives as FILES through Spark's
    // binaryFile source, not synthesized — prove the decode stage is
    // indifferent to how the binary column was produced
    val docs = graft.Tables.documents(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
    val media = AudioVideo.attachAudio(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("wav-files")
    media.collect().foreach { r =>
      java.nio.file.Files.write(
        dir.resolve(f"${r.getAs[Long]("doc_id")}%06d.wav"),
        r.getAs[Array[Byte]]("content"))
    }
    val fromFiles = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir.toString)
      .select(
        org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.col("path"), "(\\d+)\\.wav$", 1)
          .cast("long").as("doc_id"),
        org.apache.spark.sql.functions.col("content"),
        org.apache.spark.sql.functions.lit("wav").as("kind"))
    val a = AudioVideo.audioFeatures(spark, fromFiles)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = AudioVideo.audioFeatures(spark, media)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("audio pipeline: decode real WAVs, exact features, no shuffle") {
    val docs = Tables.documents(spark, sf001)
    val media = AudioVideo.attachAudio(spark, docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = AudioVideo.audioFeatures(spark, media)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage must not shuffle:\n$plan")

    val texts = docs.filter(col("doc_id") < 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byId = feats.filter(col("doc_id") < 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(0L, 1L)) {
      val s = texts(id).getBytes("UTF-8").toSeq
      val sm = (0 until 2 * s.length).map(j => ((s(j % s.length) & 0xff) - 96) * 256L)
      val row = byId(id)
      assert(row.getAs[Long]("n_samples") == 2L * s.length)
      assert(row.getAs[Long]("duration_ms") == 2L * s.length * 1000 / 8000)
      assert(row.getAs[Long]("peak") == sm.map(math.abs).max)
      assert(row.getAs[Long]("energy") == sm.map(x => x * x).sum)
      assert(row.getAs[Long]("zero_cross") ==
        (1 until sm.length).count(j => (sm(j) >= 0) != (sm(j - 1) >= 0)))
    }
  }

  test("video pipeline: both chroma modes yield identical luma algebra") {
    val s = spark
    import s.implicits._
    val text = "The quick brown fox jumps over the lazy dog again and again!" * 3
    // same text under an even and an odd doc_id → C444 and C420 fixtures
    val docs = Seq((2L, text), (3L, text)).toDF("doc_id", "text")
    val frames = AudioVideo.videoFrames(spark, AudioVideo.attachVideo(spark, docs))
    val rows = frames.collect()
    val even = rows.filter(_.getAs[Long]("doc_id") == 2L)
      .sortBy(_.getAs[Long]("frame_idx")).map(r => (r.getLong(2), r.getLong(3))).toSeq
    val odd = rows.filter(_.getAs[Long]("doc_id") == 3L)
      .sortBy(_.getAs[Long]("frame_idx")).map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(even.nonEmpty && even == odd, "C444 and C420 must decode to the same luma")
    // exact against the generator
    val b = text.getBytes("UTF-8")
    val nf = (b.length + 47) / 48
    assert(even.length == nf)
    for (f <- 0 until nf) {
      val ys = (0 until 32).map(j => b((96 * f + j) % b.length) & 0xff)
      assert(even(f) == ((ys.map(_.toLong).sum, ys.count(_ >= 96).toLong)), s"frame $f")
    }
  }
}
