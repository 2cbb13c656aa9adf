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
    // interlaced flag (byte 28 of file = last IHDR byte) — fix the CRC so
    // the check reaches the interlace require
    val inter = good.clone()
    inter(8 + 8 + 12) = 1
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 12, 4 + 13)
    java.nio.ByteBuffer.wrap(inter, 29, 4).putInt(crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](PngCodec.decode(inter))
    assert(e.getMessage.contains("interlaced"))
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
