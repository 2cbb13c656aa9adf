package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, bpp: Int): PngCodec.Png =
    PngCodec.Png(w, h, if (bpp == 4) 6 else 2,
      Array.tabulate(bpp * w * h)(i => ((i * 37 + 11) % 256).toByte))

  test("RGB and RGBA round-trip through all five filters") {
    // height ≥ 5 ⇒ the encoder's y%5 rotation emits every filter type
    for (bpp <- Seq(3, 4); (w, h) <- Seq((8, 7), (1, 6), (5, 5), (3, 1))) {
      val src = img(w, h, bpp)
      val got = PngCodec.decode(PngCodec.encode(src))
      assert(got.width == w && got.height == h && got.colorType == src.colorType)
      assert(java.util.Arrays.equals(got.pix, src.pix), s"${w}x$h bpp=$bpp")
    }
  }

  test("every filter type actually appears in the encoded stream") {
    // inflate the IDAT ourselves and read the per-row filter bytes — a
    // lazily all-zero encoder would silently weaken q102's coverage
    val src = img(4, 10, 3)
    val bytes = PngCodec.encode(src)
    // IDAT starts after signature(8) + IHDR chunk(12+13); its body offset
    val idatLen = java.nio.ByteBuffer.wrap(bytes, 33, 4).getInt
    val body = java.util.Arrays.copyOfRange(bytes, 41, 41 + idatLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(body)
    val raw = new Array[Byte]((3 * 4 + 1) * 10)
    var got = 0
    while (got < raw.length && !inf.finished())
      got += inf.inflate(raw, got, raw.length - got)
    assert(got == raw.length)
    val filters = (0 until 10).map(y => raw((3 * 4 + 1) * y).toInt)
    assert(filters == Seq(0, 1, 2, 3, 4, 0, 1, 2, 3, 4))
  }

  test("Adam7 round-trip: ragged dims, degenerate dims, both color types") {
    // 9x7 exercises ragged pass widths/heights; 1x1 leaves six of the
    // seven passes EMPTY (zero scanlines, not zero-width scanlines);
    // 8x8 is the full grid; 2x2 touches only passes 1/4/6/7 partially
    for (bpp <- Seq(3, 4);
         (w, h) <- Seq((9, 7), (1, 1), (8, 8), (2, 2), (16, 3), (3, 16))) {
      val src = img(w, h, bpp)
      val bytes = PngCodec.encodeAdam7(src)
      assert(bytes(8 + 8 + 12) == 1, "IHDR must declare interlace 1")
      val got = PngCodec.decode(bytes)
      assert(got.width == w && got.height == h && got.colorType == src.colorType)
      assert(java.util.Arrays.equals(got.pix, src.pix),
        s"adam7 ${w}x$h bpp=$bpp")
    }
  }

  test("Adam7 and sequential encodes of the same image decode identically") {
    val src = img(13, 11, 3)
    val a = PngCodec.decode(PngCodec.encodeAdam7(src))
    val s = PngCodec.decode(PngCodec.encode(src))
    assert(java.util.Arrays.equals(a.pix, s.pix))
  }

  test("malformed Adam7 PNGs keep the single-IAE contract (fuzz)") {
    val good = PngCodec.encodeAdam7(img(9, 7, 3))
    val rnd = new scala.util.Random(13)
    for (i <- 1 to 400) {
      val mutated = rnd.nextInt(3) match {
        case 0 => good.take(rnd.nextInt(good.length))
        case 1 =>
          val b = good.clone(); val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => good.take(rnd.nextInt(12)) ++
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      }
      try PngCodec.decode(mutated)
      catch {
        case _: IllegalArgumentException => // the ONE allowed failure mode
        case t: Throwable =>
          fail(s"iteration $i leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }

  test("generic sniff decodes RGB PNG, refuses lossy RGBA flattening") {
    val rgb = img(6, 5, 3)
    val viaSniff = Multimodal.ImageCodecs.decode(PngCodec.encode(rgb))
    assert(viaSniff.width == 6 && viaSniff.height == 5)
    assert(java.util.Arrays.equals(viaSniff.rgb, rgb.pix))
    intercept[IllegalArgumentException](
      Multimodal.ImageCodecs.decode(PngCodec.encode(img(6, 5, 4))))
  }

  test("malformed PNGs fail loudly with the single declared failure mode") {
    val good = PngCodec.encode(img(8, 6, 3))
    // targeted malformations
    intercept[IllegalArgumentException](PngCodec.decode(Array[Byte](1, 2, 3)))
    val badCrc = good.clone()
    badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0x40).toByte
    intercept[IllegalArgumentException](PngCodec.decode(badCrc))
    // interlace flag flipped to Adam7 on a SEQUENTIAL stream (byte 28 =
    // last IHDR byte, CRC fixed so the size check is what fires): the
    // seven-pass layout has a different total scanline size, so the
    // stream must be rejected as a size mismatch, not decoded askew
    val inter = good.clone()
    inter(8 + 8 + 12) = 1
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(inter, 29, 4).putInt(crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](PngCodec.decode(inter))
    assert(e.getMessage.contains("size mismatch"), e.getMessage)
    // interlace method 2 does not exist
    val bad2 = good.clone()
    bad2(8 + 8 + 12) = 2
    val crc2 = new java.util.zip.CRC32()
    crc2.update(bad2, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(bad2, 29, 4).putInt(crc2.getValue.toInt)
    val e2 = intercept[IllegalArgumentException](PngCodec.decode(bad2))
    assert(e2.getMessage.contains("interlace"), e2.getMessage)
    // fuzz: truncation, bit flips, garbage — IAE is the only escape
    val rnd = new scala.util.Random(11)
    for (i <- 1 to 400) {
      val mutated = rnd.nextInt(3) match {
        case 0 => good.take(rnd.nextInt(good.length))
        case 1 =>
          val b = good.clone(); val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => good.take(rnd.nextInt(12)) ++
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      }
      try PngCodec.decode(mutated)
      catch {
        case _: IllegalArgumentException => // the ONE allowed failure mode
        case t: Throwable =>
          fail(s"iteration $i leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }
}
