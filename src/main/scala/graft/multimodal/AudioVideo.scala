package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio and video multimodal columns: media as opaque `binary` with a
  * REAL container codec per modality, completing the image/audio/video
  * triple next to [[Multimodal.ImageCodecs]].
  *
  * Audio is RIFF/WAVE carrying 16-bit little-endian PCM (the canonical
  * uncompressed interchange format). The decoder walks RIFF chunks
  * properly — unknown chunks are skipped with the spec's even-byte
  * padding — so the fixture WAVs deliberately carry an odd-sized JUNK
  * chunk between `fmt ` and `data`: a parser that assumes a fixed
  * 44-byte header or forgets chunk padding desyncs and fails loudly.
  *
  * Video is YUV4MPEG2 (Y4M): an ASCII parameter header, then per-frame
  * `FRAME` markers followed by raw planar YUV. Even doc_ids encode as
  * C444 (full chroma planes), odd as C420jpeg (quarter chroma planes) —
  * feature extraction reads ONLY the luma plane, so both chroma modes
  * share one oracle, but a decoder with wrong C420 plane math loses
  * frame alignment and either throws or corrupts luma (hash mismatch).
  *
  * Like the image path, decode + feature extraction is a narrow
  * per-partition pass — no shuffle; at 100 TB the binary column comes
  * from a parquet/`binaryFile` scan with the same schema and the same
  * mapPartitions shape applies unchanged.
  */
object AudioVideo {

  case class MediaRecord(doc_id: Long, content: Array[Byte], kind: String)

  /** Decoded-audio features, all exact integers: header fields
    * (n_samples, sample_rate), integer-division duration, peak
    * amplitude, exact sum-of-squares energy (< 2^63 by construction:
    * |s| ≤ 2^15 so each term ≤ 2^30), and sign-flip zero crossings. */
  case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Long,
      duration_ms: Long, peak: Long, energy: Long, zero_cross: Long)

  case class AudioFrame(doc_id: Long, frame_idx: Long, fenergy: Long)

  case class VideoFrame(doc_id: Long, frame_idx: Long, ysum: Long,
      bright: Long)

  /** RIFF/WAVE with 16-bit LE PCM. Chunk grammar per the RIFF spec:
    * fourcc + u32 size + payload, payload padded to even length (the
    * pad byte is NOT counted in size). */
  object WavCodec {

    case class Pcm(sampleRate: Int, samples: Array[Short])

    /** Encodes mono 16-bit PCM. Inserts a 5-byte JUNK chunk (odd size →
      * exercises the decoder's even-padding rule) between fmt and data. */
    def encode(pcm: Pcm): Array[Byte] = {
      val dataLen = 2 * pcm.samples.length
      val junkPayload = 5 // odd on purpose; stored padded to 6
      val riffSize = 4 + (8 + 16) + (8 + junkPayload + 1) + (8 + dataLen)
      val out = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(pcm.sampleRate)
        .putInt(pcm.sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      out.put("JUNK".getBytes("US-ASCII")).putInt(junkPayload)
        .put("padb!".getBytes("US-ASCII")).put(0.toByte) // +1 pad byte
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < pcm.samples.length) { out.putShort(pcm.samples(i)); i += 1 }
      out.array()
    }

    /** Chunk-walking decoder: only RIFF/WAVE, PCM, mono, 16-bit is in
      * contract; anything else throws — never a silent wrong decode. */
    def decode(b: Array[Byte]): Pcm = {
      require(b.length >= 12, "media too short for a RIFF header")
      require(fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE",
        s"not a RIFF/WAVE container (got ${fourcc(b, 0)}/${fourcc(b, 8)})")
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val riffEnd = math.min(b.length.toLong, 8L + (buf.getInt(4) & 0xffffffffL))
      var p = 12L
      var sampleRate = -1
      var data: Array[Byte] = null
      while (p + 8 <= riffEnd) {
        val id = fourcc(b, p.toInt)
        val size = buf.getInt(p.toInt + 4) & 0xffffffffL
        val body = p + 8
        require(body + size <= riffEnd, s"truncated $id chunk")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too short ($size)")
            val audioFormat = buf.getShort(body.toInt) & 0xffff
            val channels = buf.getShort(body.toInt + 2) & 0xffff
            sampleRate = buf.getInt(body.toInt + 4)
            val bits = buf.getShort(body.toInt + 14) & 0xffff
            require(audioFormat == 1, s"unsupported WAV format $audioFormat (PCM only)")
            require(channels == 1, s"unsupported channel count $channels (mono only)")
            require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
          case "data" =>
            data = java.util.Arrays.copyOfRange(b, body.toInt, (body + size).toInt)
          case _ => () // JUNK/LIST/...: skip
        }
        p = body + size + (size & 1) // RIFF even-byte padding
      }
      require(sampleRate > 0, "missing fmt chunk")
      require(data != null, "missing data chunk")
      require(data.length % 2 == 0, "odd PCM16 data length")
      val samples = new Array[Short](data.length / 2)
      var i = 0
      while (i < samples.length) {
        samples(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
        i += 1
      }
      Pcm(sampleRate, samples)
    }

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")
  }

  /** YUV4MPEG2: `YUV4MPEG2 <tags>\n` then per frame `FRAME[ params]\n`
    * + planar Y,U,V. Supported colourspaces: C444 (full chroma) and
    * C420/C420jpeg/C420mpeg2/C420paldv (quarter chroma — siting
    * differences don't change plane sizes). */
  object Y4mCodec {

    case class Video(width: Int, height: Int, chroma: String,
        yPlanes: Array[Array[Byte]])

    private def chromaPlaneBytes(chroma: String, w: Int, h: Int): Int =
      chroma match {
        case "444" => w * h
        case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
          require(w % 2 == 0 && h % 2 == 0,
            s"C$chroma needs even dimensions, got ${w}x$h")
          (w / 2) * (h / 2)
        case other =>
          throw new IllegalArgumentException(s"unsupported colourspace C$other")
      }

    /** Encodes with a chroma generator so C444 and C420 fixtures carry
      * real (different-sized) chroma planes the decoder must skip. */
    def encode(v: Video, chromaByte: (Int, Int) => Byte): Array[Byte] = {
      val header =
        s"YUV4MPEG2 W${v.width} H${v.height} F25:1 Ip A1:1 C${v.chroma}\n"
          .getBytes("US-ASCII")
      val cLen = chromaPlaneBytes(v.chroma, v.width, v.height)
      val frameHdr = "FRAME\n".getBytes("US-ASCII")
      val bos = new java.io.ByteArrayOutputStream(
        header.length + v.yPlanes.length * (frameHdr.length + v.width * v.height + 2 * cLen))
      bos.write(header)
      var f = 0
      while (f < v.yPlanes.length) {
        bos.write(frameHdr)
        require(v.yPlanes(f).length == v.width * v.height, s"bad Y plane $f")
        bos.write(v.yPlanes(f))
        var c = 0
        while (c < 2 * cLen) { bos.write(chromaByte(f, c) & 0xff); c += 1 }
        f += 1
      }
      bos.toByteArray
    }

    def decode(b: Array[Byte]): Video = {
      val nl0 = indexOfNl(b, 0)
      require(nl0 > 0, "missing Y4M stream header line")
      val header = new String(b, 0, nl0, "US-ASCII")
      val toks = header.split(" ").filter(_.nonEmpty)
      require(toks.nonEmpty && toks(0) == "YUV4MPEG2",
        s"not a YUV4MPEG2 stream (got '${toks.headOption.getOrElse("")}')")
      var w = -1; var h = -1; var chroma = "420jpeg" // spec default
      def num(t: String): Int =
        try t.drop(1).toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad Y4M header tag '$t'")
        }
      toks.drop(1).foreach { t =>
        t.charAt(0) match {
          case 'W' => w = num(t)
          case 'H' => h = num(t)
          case 'C' => chroma = t.drop(1)
          case _ => () // F (rate), I (interlace), A (aspect), X (extension): not needed
        }
      }
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
        s"bad Y4M dimensions ${w}x$h") // size cap keeps w*h in Int range
      val cLen = chromaPlaneBytes(chroma, w, h)
      val yLen = w * h
      val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var p = nl0 + 1
      while (p < b.length) {
        val nl = indexOfNl(b, p)
        require(nl >= 0, "truncated FRAME marker")
        val marker = new String(b, p, nl - p, "US-ASCII")
        require(marker == "FRAME" || marker.startsWith("FRAME "),
          s"expected FRAME marker, got '$marker'")
        val body = nl + 1
        // subtraction form: near-2GB inputs must not wrap the bound
        require(b.length - body >= yLen + 2 * cLen,
          s"truncated frame ${planes.length}")
        planes += java.util.Arrays.copyOfRange(b, body, body + yLen)
        p = body + yLen + 2 * cLen
      }
      require(planes.nonEmpty, "Y4M stream with no frames")
      Video(w, h, chroma, planes.toArray)
    }

    private def indexOfNl(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      if (i < b.length) i else -1
    }
  }

  // ---------------------------------------------------------------------
  // Deterministic synthesis from the text corpus (fixture generators; at
  // scale the binary column arrives from storage with the same schema).
  // ---------------------------------------------------------------------

  /** The synthesis contract shared with the image fixtures: byte == char
    * only holds for ASCII, and the oracle indexes CHARACTERS — enforce
    * it loudly instead of silently diverging on a non-ASCII corpus
    * (a lead byte ≥ 0xE1 would also wrap the Short sample negative). */
  private def asciiBytes(text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    require(!bytes.exists(b => (b & 0xff) >= 128),
      "media synthesis is defined over ASCII corpora only (byte == char)")
    bytes
  }

  /** Sample j of a document's audio: `(byte(j mod len) - 96) * 256`,
    * n_samples = 2·len at 8 kHz. ASCII text straddles 96 (letters above,
    * space/digits below), so real sign structure: nonzero crossings. */
  private[multimodal] def synthesizePcm(text: String): WavCodec.Pcm = {
    val bytes = asciiBytes(text)
    val n = 2 * bytes.length
    val samples = new Array[Short](n)
    var j = 0
    while (j < n) {
      samples(j) = (((bytes(j % bytes.length) & 0xff) - 96) * 256).toShort
      j += 1
    }
    WavCodec.Pcm(8000, samples)
  }

  /** 8×4 luma frames, ⌈len/48⌉ of them; luma byte j of frame f is text
    * byte (96f+j) mod len (as if indexing a C444 triple-plane stream —
    * the SAME generator regardless of actual chroma mode, which only
    * changes the chroma planes feature extraction never reads). */
  private[multimodal] def synthesizeVideo(text: String, chroma: String): Y4mCodec.Video = {
    val bytes = asciiBytes(text)
    val w = 8; val h = 4
    val nf = math.max((bytes.length + 47) / 48, 1)
    val planes = Array.tabulate(nf) { f =>
      Array.tabulate(w * h)(j => bytes((96 * f + j) % bytes.length))
    }
    Y4mCodec.Video(w, h, chroma, planes)
  }

  def attachAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty) // NULL text: drop, like the oracle
      .map { case (id, text) =>
        MediaRecord(id, WavCodec.encode(synthesizePcm(text)), "wav")
      }
      .toDF()
  }

  /** Even doc_ids → C444, odd → C420jpeg; chroma bytes come from the
    * same text stream offset past the luma so they're real data the
    * decoder must measure-and-skip correctly. */
  def attachVideo(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty) // NULL text: drop, like the oracle
      .map { case (id, text) =>
        val chroma = if (id % 2 == 0) "444" else "420jpeg"
        val v = synthesizeVideo(text, chroma)
        val bytes = asciiBytes(text)
        val enc = Y4mCodec.encode(v,
          (f, c) => bytes((96 * f + 32 + c) % bytes.length))
        MediaRecord(id, enc, if (id % 2 == 0) "c444" else "c420")
      }
      .toDF()
  }

  /** Narrow decode → exact integer audio features; no shuffle. */
  def audioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val pcm = WavCodec.decode(r.content)
          val n = pcm.samples.length
          var peak = 0L; var energy = 0L; var zc = 0L
          var i = 0
          while (i < n) {
            val s = pcm.samples(i).toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s * s
            if (i > 0 && (s >= 0) != (pcm.samples(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioFeatures(r.doc_id, n.toLong, pcm.sampleRate.toLong,
            n.toLong * 1000L / pcm.sampleRate, peak, energy, zc)
        }
      }
      .toDF()
  }

  /** 160-sample (20 ms @ 8 kHz) non-overlapping frames over the decoded
    * PCM — the 1:N flatMap shape of a real acoustic frontend; per-frame
    * feature is the exact energy. Documents shorter than one frame emit
    * no rows (matching `n // 160` in the oracle). */
  def audioFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val frameLen = 160
    media.as[MediaRecord]
      .flatMap { r =>
        val pcm = WavCodec.decode(r.content)
        val nf = pcm.samples.length / frameLen
        (0 until nf).iterator.map { k =>
          var e = 0L
          var i = k * frameLen
          val lim = i + frameLen
          while (i < lim) {
            val s = pcm.samples(i).toLong; e += s * s; i += 1
          }
          AudioFrame(r.doc_id, k.toLong, e)
        }
      }
      .toDF()
  }

  /** Per-frame luma stats from the decoded Y planes (chroma skipped by
    * the container math, never read): exact byte sum + bright count. */
  def videoFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .flatMap { r =>
        val v = Y4mCodec.decode(r.content)
        v.yPlanes.iterator.zipWithIndex.map { case (y, f) =>
          var s = 0L; var bright = 0L
          var i = 0
          while (i < y.length) {
            val px = y(i) & 0xff
            s += px
            if (px >= 96) bright += 1
            i += 1
          }
          VideoFrame(r.doc_id, f.toLong, s, bright)
        }
      }
      .toDF()
  }
}
