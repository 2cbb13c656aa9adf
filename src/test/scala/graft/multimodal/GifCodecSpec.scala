package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def pal(seed: Int): Array[Byte] =
    Array.tabulate(768)(i => ((i * 31 + seed) % 256).toByte)

  private def gif(w: Int, h: Int, f: Int => Int): GifCodec.Gif =
    GifCodec.Gif(w, h, pal(7), Array.tabulate(w * h)(i => (f(i) & 0xff).toByte))

  private def roundTrip(src: GifCodec.Gif, label: String): Unit = {
    val got = GifCodec.decode(GifCodec.encode(src))
    assert(got.width == src.width && got.height == src.height, label)
    assert(java.util.Arrays.equals(got.palette, src.palette), label)
    assert(java.util.Arrays.equals(got.indices, src.indices), label)
  }

  test("round-trips: random, constant, single-pixel, full-alphabet") {
    val rnd = new scala.util.Random(3)
    roundTrip(gif(1, 1, _ => 42), "1x1")
    roundTrip(gif(8, 4, _ => 0), "constant")
    roundTrip(gif(16, 16, i => i), "ramp")
    roundTrip(gif(8, 100, _ => rnd.nextInt(256)), "random")
  }

  test("KwKwK (code == next undefined entry) round-trips") {
    // the classic cScSc shape emits a code the decoder hasn't finished
    // defining; 'ababab…' and 'aaaa…' both force it
    roundTrip(gif(8, 8, i => if (i % 2 == 0) 97 else 98), "abab")
    roundTrip(gif(8, 8, _ => 97), "aaaa")
  }

  test("dictionary fill forces a clear-and-reset mid-stream") {
    // ~160k varied-but-compressible pixels define >4096 phrases, so the
    // encoder's reset protocol (and the decoder's) must engage
    val big = gif(256, 640, i => (i * 7 + i / 13) )
    roundTrip(big, "reset")
  }

  test("width-growth boundaries round-trip at every small length") {
    // sweep lengths so the define counter crosses the 9→10-bit boundary
    // in every alignment — including the end-of-stream define (the EOI
    // off-by-one) — with incompressible data (defines ≈ length/2) and
    // compressible data (defines < length)
    val rnd = new scala.util.Random(17)
    for (n <- 1 to 40) {
      val len = n * 40
      roundTrip(GifCodec.Gif(len, 1, pal(n),
        Array.fill(len)(rnd.nextInt(256).toByte)), s"rand-$len")
      roundTrip(GifCodec.Gif(len, 1, pal(n),
        Array.tabulate(len)(i => ((i / 3) % 7 + 40).toByte)), s"runs-$len")
    }
  }

  test("87a signature accepted; extensions walked; malformed GIFs fail as IAE only") {
    val good = GifCodec.encode(gif(8, 6, i => i * 5))
    // GIF87a variant of the same bytes decodes too
    val g87 = good.clone(); g87(4) = '7'.toByte
    assert(GifCodec.decode(g87).width == 8)
    // targeted malformations
    intercept[IllegalArgumentException](GifCodec.decode(Array[Byte](1, 2, 3)))
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    intercept[IllegalArgumentException](GifCodec.decode(badSig))
    val noTrailer = good.dropRight(1)
    intercept[IllegalArgumentException](GifCodec.decode(noTrailer))
    val interlaced = good.clone()
    // image descriptor packed byte: header(13) + GCT(768) + GCE(8) + 9
    interlaced(13 + 768 + 8 + 9) = 0x40.toByte
    val e = intercept[IllegalArgumentException](GifCodec.decode(interlaced))
    assert(e.getMessage.contains("interlaced"))
    // fuzz: truncation, bit flips, garbage — IAE is the only escape
    val rnd = new scala.util.Random(11)
    for (i <- 1 to 400) {
      val mutated = rnd.nextInt(3) match {
        case 0 => good.take(rnd.nextInt(good.length))
        case 1 =>
          val b = good.clone(); val p = rnd.nextInt(b.length)
          b(p) = (b(p) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => good.take(rnd.nextInt(13)) ++
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      }
      try GifCodec.decode(mutated)
      catch {
        case _: IllegalArgumentException => // the ONE allowed failure mode
        case t: Throwable =>
          fail(s"iteration $i leaked ${t.getClass.getName}: ${t.getMessage}")
      }
    }
  }
}
