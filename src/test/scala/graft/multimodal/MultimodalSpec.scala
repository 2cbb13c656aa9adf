package graft.multimodal

import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._
import Multimodal.ImageCodecs
import Multimodal.ImageCodecs.Image

class MultimodalSpec extends SparkTestBase {

  private def testImage(w: Int, h: Int): Image = {
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
    Image(w, h, rgb)
  }

  test("PPM round-trips bit-exactly, header comments and whitespace parse") {
    val img = testImage(5, 3)
    val dec = ImageCodecs.decode(ImageCodecs.encodePpm(img))
    assert(dec.width == 5 && dec.height == 3)
    assert(dec.rgb.toSeq == img.rgb.toSeq)
    // spec-permitted header variations: comments + mixed whitespace
    val funky = ("P6 # a comment\n# another line\n 5\t3 # dims\n255\n")
      .getBytes("US-ASCII") ++ img.rgb
    val dec2 = ImageCodecs.decode(funky)
    assert(dec2.width == 5 && dec2.height == 3 && dec2.rgb.toSeq == img.rgb.toSeq)
  }

  test("BMP round-trips through bottom-up BGR rows and 4-byte padding") {
    // width 5 → 15-byte rows padded to 16: exercises the padding path
    for ((w, h) <- Seq((5, 3), (8, 2), (1, 1))) {
      val img = testImage(w, h)
      val bytes = ImageCodecs.encodeBmp(img)
      val dec = ImageCodecs.decode(bytes)
      assert(dec.width == w && dec.height == h, s"${w}x$h")
      assert(dec.rgb.toSeq == img.rgb.toSeq, s"${w}x$h pixel mismatch")
    }
  }

  test("boxHalve: exact truncating 2x2 means, odd edges use in-bounds pixels") {
    // 4x3 fixture: channel value = 10*(y*4+x) + c, hand-checkable
    val rgb = Array.tabulate(3 * 4 * 3) { i =>
      val pix = i / 3; val c = i % 3
      (10 * pix + c).toByte
    }
    val img = Image(4, 3, rgb)
    val rz = ImageCodecs.boxHalve(img)
    assert(rz.width == 2 && rz.height == 2)
    def px(im: Image, x: Int, y: Int, c: Int): Int =
      im.rgb(3 * (im.width * y + x) + c) & 0xff
    // out (0,0) = mean of src (0,0),(1,0),(0,1),(1,1) = (0+10+40+50)/4 = 25
    assert(px(rz, 0, 0, 0) == 25 && px(rz, 0, 0, 1) == 26)
    // out (1,0) = (20+30+60+70)/4 = 45
    assert(px(rz, 1, 0, 0) == 45)
    // odd bottom row: out (0,1) = (80+90)/2 = 85; out (1,1) = (100+110)/2 = 105
    assert(px(rz, 0, 1, 0) == 85 && px(rz, 1, 1, 0) == 105)
    // truncation: 1x2 of values 3 and 4 -> (3+4)/2 = 3 (floor)
    val tiny = Image(1, 2, Array[Byte](3, 3, 3, 4, 4, 4))
    assert(ImageCodecs.boxHalve(tiny).rgb.toSeq == Seq[Byte](3, 3, 3))
    // re-encode round-trip preserves the resized pixels bit-exactly
    val rt = ImageCodecs.decode(ImageCodecs.encodePpm(rz))
    assert(rt.rgb.toSeq == rz.rgb.toSeq && rt.width == 2 && rt.height == 2)
  }

  test("both containers decode to the same pixels for the same image") {
    val img = testImage(8, 4)
    val p = ImageCodecs.decode(ImageCodecs.encodePpm(img))
    val b = ImageCodecs.decode(ImageCodecs.encodeBmp(img))
    assert(p.rgb.toSeq == b.rgb.toSeq)
  }

  test("malformed media fails loudly, never a silent wrong decode") {
    intercept[IllegalArgumentException](
      ImageCodecs.decode(Array[Byte]('G', 'I', 'F', '8'))) // unsupported magic
    val img = testImage(4, 4)
    val truncatedPpm = ImageCodecs.encodePpm(img).dropRight(5)
    intercept[IllegalArgumentException](ImageCodecs.decode(truncatedPpm))
    val truncatedBmp = ImageCodecs.encodeBmp(img).dropRight(5)
    intercept[IllegalArgumentException](ImageCodecs.decode(truncatedBmp))
    // 16-bit PPM (maxval 65535) is out of contract
    val deep = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](24)
    intercept[IllegalArgumentException](ImageCodecs.decode(deep))
    // review repro: a sign-flipped BMP dataOffset passed the additive
    // bound via overflow and leaked ArrayIndexOutOfBoundsException
    val evil = ImageCodecs.encodeBmp(img).clone()
    evil(13) = (evil(13) | 0x80).toByte // dataOffset MSB
    intercept[IllegalArgumentException](ImageCodecs.decode(evil))
  }

  test("attachImage + imageFeatures decode real pixels, no shuffle") {
    val docs = Tables.documents(spark, sf001)
    val media = Multimodal.attachImage(spark, docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.imageFeatures(spark, media)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage must not shuffle:\n$plan")

    // doc 0 encodes as PPM, doc 1 as BMP; check exact stats vs the text
    val byId = feats.filter(col("doc_id") < 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val texts = docs.filter(col("doc_id") < 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for (id <- Seq(0L, 1L)) {
      val img = Multimodal.synthesize(texts(id))
      val row = byId(id)
      assert(row.getAs[String]("kind") == (if (id % 2 == 0) "ppm" else "bmp"))
      assert(row.getAs[Long]("width") == img.width.toLong)
      assert(row.getAs[Long]("height") == img.height.toLong)
      val rs = (0 until img.width * img.height).map(i => img.rgb(3 * i) & 0xff)
      assert(row.getAs[Long]("sum_r") == rs.map(_.toLong).sum)
    }
    // deterministic across runs
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = Multimodal.imageFeatures(spark, media).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("frameFeatures emits one frame per decoded pixel row with exact sums") {
    val s = spark
    import s.implicits._
    val text = "abcdefgh" * 14 // 112 bytes → 38 pixels → h = 5
    val media = Seq((7L, text)).toDF("doc_id", "text")
    val frames = Multimodal.frameFeatures(spark, Multimodal.attachImage(spark, media))
      .orderBy("frame_idx").collect()
    val img = Multimodal.synthesize(text)
    assert(frames.length == img.height)
    val want = (0 until img.height).map { k =>
      (0 until 24).foldLeft(0L)((a, i) =>
        (a + (img.rgb(24 * k + i) & 0xff)) % 1000000007L)
    }
    assert(frames.map(_.getAs[Long]("fsum")).toSeq == want)
    val plan = Multimodal.frameFeatures(spark, Multimodal.attachImage(spark, media))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame stage must not shuffle:\n$plan")
  }
}
