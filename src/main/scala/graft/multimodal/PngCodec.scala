package graft.multimodal

/** PNG container codec (r8 verdict item 6) — the first real-world
  * compressed image container in the multimodal family, written from
  * the public specification (RFC 2083 / W3C PNG second edition) with
  * zero dependencies: zlib inflate/deflate via `java.util.zip`, CRC32
  * via `java.util.zip.CRC32`.
  *
  * Scope: 8-bit-per-sample truecolor — color type 2 (RGB) and 6
  * (RGBA), interlace methods 0 (sequential) AND 1 (Adam7, r11: the
  * seven reduced-image passes of the W3C spec §8.2, each pass
  * filtered as an independent image over its own previous scanline,
  * empty passes contributing zero scanlines). All five scanline
  * filters (None/Sub/Up/Average/Paeth) are implemented on BOTH sides;
  * the encoder deliberately rotates the filter type per row (y mod 5),
  * so every filter's unfilter path sits under q102's pixel-algebra
  * oracle — a wrong Paeth predictor or average truncation
  * hash-mismatches immediately, it cannot hide behind an all-None
  * encode. The Adam7 encoder does the same per pass row, so q152's
  * oracle covers every (pass, filter) combination the fixture reaches.
  *
  * Failure contract (the family's fuzz pin): exactly ONE failure mode —
  * IllegalArgumentException — for any malformed input: bad signature,
  * chunk CRC mismatch, truncation, zlib corruption, wrong inflated
  * size, unsupported depth/color/interlace. Array/number errors never
  * escape.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Decoded PNG: `pix` is row-major with `bpp` interleaved channels
    * (3 = RGB, 4 = RGBA), 8 bits per sample. */
  final case class Png(width: Int, height: Int, colorType: Int,
      pix: Array[Byte]) {
    def bpp: Int = if (colorType == 6) 4 else 3
    require(colorType == 2 || colorType == 6,
      s"unsupported PNG color type $colorType")
    require(pix.length == bpp * width * height,
      s"pix length ${pix.length} != $bpp*$width*$height")
  }

  // ---- encode ------------------------------------------------------------

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val c = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    out.write(len); out.write(t); out.write(data); out.write(c)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass grid: (xOrig, yOrig, xStep, yStep) per pass, W3C §8.2. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** (passWidth, passHeight) of an image's reduced image for one pass;
    * zero in either dim ⇒ the pass contributes NO scanlines at all. */
  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, xs, ys) = p
    (math.max(0, (w - x0 + xs - 1) / xs), math.max(0, (h - y0 + ys - 1) / ys))
  }

  /** Filter a contiguous pw×ph image into its (pw·bpp+1)·ph raw
    * scanline bytes, rotating the filter per row (y mod 5). */
  private def filterImage(pix: Array[Byte], pw: Int, ph: Int,
      bpp: Int): Array[Byte] = {
    val stride = bpp * pw
    val raw = new Array[Byte]((stride + 1) * ph)
    var y = 0
    while (y < ph) {
      val ft = y % 5
      val rowOut = (stride + 1) * y
      raw(rowOut) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = pix(y * stride + x) & 0xff
        val left = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pix((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(rowOut + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    zipped.toByteArray
  }

  private def container(png: Png, interlace: Int,
      idat: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(png.width).putInt(png.height)
      .put(8.toByte).put(png.colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", idat)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode with per-row filter rotation (row y uses filter y mod 5). */
  def encode(png: Png): Array[Byte] =
    container(png, 0,
      deflate(filterImage(png.pix, png.width, png.height, png.bpp)))

  /** Adam7-interlaced encode: the seven reduced images extracted on the
    * pass grid, each filtered independently (per-pass-row rotation) and
    * concatenated into one zlib stream — the exact layout §8.2 scans. */
  def encodeAdam7(png: Png): Array[Byte] = {
    val bpp = png.bpp
    val stride = bpp * png.width
    val raw = new java.io.ByteArrayOutputStream()
    Adam7.foreach { pass =>
      val (x0, y0, xs, ys) = pass
      val (pw, ph) = passDims(png.width, png.height, pass)
      if (pw > 0 && ph > 0) {
        val sub = new Array[Byte](bpp * pw * ph)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            val src = (y0 + j * ys) * stride + (x0 + i * xs) * bpp
            System.arraycopy(png.pix, src, sub, (j * pw + i) * bpp, bpp)
            i += 1
          }
          j += 1
        }
        raw.write(filterImage(sub, pw, ph, bpp))
      }
    }
    container(png, 1, deflate(raw.toByteArray))
  }

  // ---- decode ------------------------------------------------------------

  def decode(b: Array[Byte]): Png = try decodeImpl(b) catch {
    case e: IllegalArgumentException => throw e
    // zlib corruption and any arithmetic the requires didn't anticipate
    // collapse to the family's single declared failure mode
    case e: Throwable =>
      throw new IllegalArgumentException(s"malformed PNG: ${e.getMessage}", e)
  }

  private def decodeImpl(b: Array[Byte]): Png = {
    require(b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, 0, 8), Signature), "bad PNG signature")
    var p = 8
    var w = 0; var h = 0; var colorType = -1; var adam7 = false
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(b.length - p >= 12, "truncated PNG chunk")
      val buf = java.nio.ByteBuffer.wrap(b, p, 8)
      val len = buf.getInt
      require(len >= 0 && b.length - (p + 12) >= len,
        s"truncated PNG chunk body (declared $len)")
      val typ = new String(b, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, p + 4, 4 + len)
      val stored = java.nio.ByteBuffer.wrap(b, p + 8 + len, 4).getInt
      require(crc.getValue.toInt == stored, s"PNG chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          val ih = java.nio.ByteBuffer.wrap(b, p + 8, 13)
          w = ih.getInt; h = ih.getInt
          val depth = ih.get() & 0xff
          colorType = ih.get() & 0xff
          val compression = ih.get() & 0xff
          val filterMethod = ih.get() & 0xff
          val interlace = ih.get() & 0xff
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
            s"bad PNG dimensions ${w}x$h")
          require(depth == 8, s"unsupported PNG bit depth $depth (8 only)")
          require(colorType == 2 || colorType == 6,
            s"unsupported PNG color type $colorType (2/6 only)")
          require(compression == 0, s"unsupported PNG compression $compression")
          require(filterMethod == 0, s"unsupported PNG filter method $filterMethod")
          require(interlace == 0 || interlace == 1,
            s"unsupported PNG interlace method $interlace")
          adam7 = interlace == 1
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(b, p + 8, len)
        case "IEND" => seenIend = true
        case _ => // ancillary chunk: CRC-checked above, content skipped
      }
      p += 12 + len
    }
    require(seenIhdr, "missing IHDR")
    val bpp = if (colorType == 6) 4 else 3
    val expected =
      if (!adam7) (bpp * w + 1) * h
      else Adam7.map { pass =>
        val (pw, ph) = passDims(w, h, pass)
        if (pw > 0 && ph > 0) (bpp * pw + 1) * ph else 0
      }.sum
    val raw = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    while (got < expected && !inflater.finished()) {
      val n = inflater.inflate(raw, got, expected - got)
      require(n > 0 || inflater.finished(),
        "truncated or non-advancing PNG zlib stream")
      got += n
    }
    val leftover = inflater.inflate(new Array[Byte](1))
    inflater.end()
    require(got == expected && leftover == 0,
      s"PNG pixel stream size mismatch (got $got, expected $expected)")

    if (!adam7)
      Png(w, h, colorType, unfilterImage(raw, 0, w, h, bpp))
    else {
      // seven reduced images back to back; unfilter each independently
      // and scatter onto the pass grid
      val stride = bpp * w
      val pix = new Array[Byte](stride * h)
      var off = 0
      Adam7.foreach { pass =>
        val (x0, y0, xs, ys) = pass
        val (pw, ph) = passDims(w, h, pass)
        if (pw > 0 && ph > 0) {
          val sub = unfilterImage(raw, off, pw, ph, bpp)
          off += (bpp * pw + 1) * ph
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              val dst = (y0 + j * ys) * stride + (x0 + i * xs) * bpp
              System.arraycopy(sub, (j * pw + i) * bpp, pix, dst, bpp)
              i += 1
            }
            j += 1
          }
        }
      }
      Png(w, h, colorType, pix)
    }
  }

  /** Unfilter a (pw·bpp+1)·ph scanline block at `off` into the pw×ph
    * contiguous pixel array — the previous scanline is the previous
    * row OF THIS BLOCK (for Adam7, each reduced image is filtered as
    * an independent image, §8.2). */
  private def unfilterImage(raw: Array[Byte], off: Int, pw: Int, ph: Int,
      bpp: Int): Array[Byte] = {
    val stride = bpp * pw
    val pix = new Array[Byte](stride * ph)
    var y = 0
    while (y < ph) {
      val ft = raw(off + (stride + 1) * y) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft on row $y")
      val rowIn = off + (stride + 1) * y + 1
      var x = 0
      while (x < stride) {
        val f = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pix((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        pix(y * stride + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    pix
  }
}
