package graft.multimodal

/** GIF container codec (r9 verdict item 9) — the second real-world
  * compressed image container in the multimodal family, written from
  * the public GIF89a specification (CompuServe, 1990; also covered by
  * RFC-free W3C notes) with zero dependencies: the LZW entropy coder is
  * implemented from scratch, both directions.
  *
  * Scope: single-frame, non-interlaced, 256-entry global color table,
  * 8-bit LZW minimum code size. The encoder is a REAL LZW compressor
  * (prefix-dictionary, variable code width 9→12, clear-and-reset at
  * 4096 entries), not the "uncompressed GIF" literal trick — so the
  * decoder's dictionary walk, width growth, reset handling and the
  * KwKwK first-use case (a code referencing the entry being defined)
  * all sit under the q133 oracle and the round-trip spec.
  *
  * Failure contract (the family's fuzz pin, like [[PngCodec]]): exactly
  * ONE failure mode — IllegalArgumentException — for any malformed
  * input: bad signature, truncation, missing color table, bad LZW code,
  * sub-block overrun, pixel-count mismatch. Array/number errors never
  * escape.
  */
object GifCodec {

  /** Decoded GIF: `palette` is 768 bytes (256 RGB triples), `indices`
    * row-major palette indices, one byte per pixel. */
  final case class Gif(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte]) {
    require(palette.length == 768, s"palette length ${palette.length} != 768")
    require(indices.length == width * height,
      s"indices length ${indices.length} != $width*$height")
  }

  private val MinCodeSize = 8          // 256-literal alphabet
  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxCode = 4096           // 12-bit ceiling (spec)

  // ---- encode ------------------------------------------------------------

  /** LSB-first bit packer into 255-byte data sub-blocks. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    private val block = new Array[Byte](255)
    private var blen = 0
    private def byteOut(b: Int): Unit = {
      block(blen) = b.toByte; blen += 1
      if (blen == 255) flushBlock()
    }
    private def flushBlock(): Unit = if (blen > 0) {
      out.write(blen); out.write(block, 0, blen); blen = 0
    }
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { byteOut((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    def finish(): Unit = {
      if (nbits > 0) byteOut((acc & 0xff).toInt)
      flushBlock()
      out.write(0) // block terminator
    }
  }

  private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** Real LZW compression of the index stream: hash-map prefix
    * dictionary keyed by (prefixCode << 8 | nextByte), clear-and-reset
    * when the table reaches 4096 entries (the spec's ceiling). */
  def encode(gif: Gif): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(out, gif.width); u16(out, gif.height)
    out.write(0xf7) // GCT present, 8 bits/channel, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    out.write(gif.palette)
    // a Graphic Control Extension, so the decoder's extension walk is
    // exercised by every fixture, not just hand-built ones
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); u16(out, 0); out.write(0); out.write(0)
    // image descriptor: full-frame, no local table, not interlaced
    out.write(0x2c); u16(out, 0); u16(out, 0)
    u16(out, gif.width); u16(out, gif.height); out.write(0)
    out.write(MinCodeSize)
    val bw = new BitWriter(out)
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var next = FirstFree
    var width = MinCodeSize + 1
    bw.write(ClearCode, width)
    var prefix = -1
    var i = 0
    while (i < gif.indices.length) {
      val k = gif.indices(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val key = Integer.valueOf((prefix << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          bw.write(prefix, width)
          if (next < MaxCode) {
            dict.put(key, Integer.valueOf(next))
            if (next == (1 << width) && width < 12) width += 1
            next += 1
          } else {
            // table full: emit clear, reset (the spec's reset protocol)
            bw.write(ClearCode, width)
            dict.clear(); next = FirstFree; width = MinCodeSize + 1
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      bw.write(prefix, width)
      // the decoder performs ONE MORE define after reading this final
      // data code (it lags the encoder by one define) and may bump its
      // code width on it — mirror that bump so EOI is read at the width
      // it was written (the classic end-of-stream off-by-one)
      if (next == (1 << width) && width < 12) width += 1
    }
    bw.write(EoiCode, width)
    bw.finish()
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  def decode(b: Array[Byte]): Gif = try decodeImpl(b) catch {
    case e: IllegalArgumentException => throw e
    case e: Throwable =>
      throw new IllegalArgumentException(s"malformed GIF: ${e.getMessage}", e)
  }

  private def decodeImpl(b: Array[Byte]): Gif = {
    require(b.length >= 13, "truncated GIF header")
    val sig = new String(b, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"bad GIF signature '$sig'")
    def u16at(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    val w = u16at(6); val h = u16at(8)
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bad GIF dimensions ${w}x$h")
    val packed = b(10) & 0xff
    require((packed & 0x80) != 0, "GIF without a global color table unsupported")
    val gctSize = 3 * (2 << (packed & 7))
    require(gctSize == 768, s"GIF global color table of $gctSize bytes (768 only)")
    require(b.length >= 13 + gctSize, "truncated GIF color table")
    val palette = java.util.Arrays.copyOfRange(b, 13, 13 + 768)
    var p = 13 + 768

    // walk extensions to the (single) image descriptor
    def skipSubBlocks(start: Int): Int = {
      var q = start
      while ({ require(q < b.length, "truncated GIF sub-blocks"); (b(q) & 0xff) != 0 }) {
        val len = b(q) & 0xff
        require(b.length - (q + 1) >= len, "truncated GIF sub-block body")
        q += 1 + len
      }
      q + 1
    }
    var sep = 0
    while ({ require(p < b.length, "missing GIF image descriptor")
             sep = b(p) & 0xff; sep == 0x21 }) {
      require(p + 2 <= b.length, "truncated GIF extension")
      p = skipSubBlocks(p + 2)
    }
    require(sep == 0x2c, f"unexpected GIF block 0x$sep%02x (image descriptor expected)")
    require(b.length - p >= 10, "truncated GIF image descriptor")
    val iw = u16at(p + 5); val ih = u16at(p + 7)
    val ipacked = b(p + 9) & 0xff
    require(u16at(p + 1) == 0 && u16at(p + 3) == 0 && iw == w && ih == h,
      "sub-frame GIF images unsupported")
    require((ipacked & 0x80) == 0, "GIF local color table unsupported")
    require((ipacked & 0x40) == 0, "interlaced GIF unsupported")
    p += 10
    require(p < b.length, "missing GIF LZW code size")
    val minCode = b(p) & 0xff
    require(minCode == MinCodeSize, s"GIF LZW min code size $minCode (8 only)")
    p += 1

    // gather the LZW bytes from the data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var q = p
    while ({ require(q < b.length, "truncated GIF image data"); (b(q) & 0xff) != 0 }) {
      val len = b(q) & 0xff
      require(b.length - (q + 1) >= len, "truncated GIF image sub-block")
      data.write(b, q + 1, len)
      q += 1 + len
    }
    q += 1
    require(q < b.length && (b(q) & 0xff) == 0x3b, "missing GIF trailer")
    val lzw = data.toByteArray

    // LZW decode: dictionary of (prefixCode, appendedByte); a chain walk
    // materializes each emitted string back-to-front.
    val expected = w * h
    val pix = new Array[Byte](expected)
    var got = 0
    val prefixOf = new Array[Int](MaxCode)
    val byteOf = new Array[Byte](MaxCode)
    var next = FirstFree
    var width = MinCodeSize + 1
    var prev = -1
    var acc = 0L; var nbits = 0; var bi = 0
    val tail = new Array[Byte](MaxCode) // scratch for one chain, max len
    def emit(code: Int, extra: Int): Int = {
      // write chain `code` (+ optional first-byte repeat for KwKwK)
      var n = 0
      var c = code
      while (c >= FirstFree) {
        require(c < next, s"GIF LZW code $c beyond dictionary")
        tail(n) = byteOf(c); n += 1; c = prefixOf(c)
      }
      tail(n) = c.toByte; n += 1
      val first = c
      require(got + n + (if (extra >= 0) 1 else 0) <= expected,
        "GIF pixel stream overruns the declared dimensions")
      var j = n - 1
      while (j >= 0) { pix(got) = tail(j); got += 1; j -= 1 }
      if (extra >= 0) { pix(got) = extra.toByte; got += 1 }
      first
    }
    var done = false
    while (!done) {
      while (nbits < width && bi < lzw.length) {
        acc |= (lzw(bi) & 0xffL) << nbits; nbits += 8; bi += 1
      }
      require(nbits >= width, "truncated GIF LZW stream (no EOI)")
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == ClearCode) {
        next = FirstFree; width = MinCodeSize + 1; prev = -1
      } else if (code == EoiCode) {
        done = true
      } else if (prev < 0) {
        require(code < 256, s"GIF first LZW code $code not a literal")
        pix(got) = code.toByte; got += 1; prev = code
        require(got <= expected, "GIF pixel stream overruns the declared dimensions")
      } else if (code < next) {
        val first = emit(code, -1)
        if (next < MaxCode) {
          prefixOf(next) = prev; byteOf(next) = first.toByte
          if (next == (1 << width) - 1 && width < 12) width += 1
          next += 1
        }
        prev = code
      } else {
        // KwKwK: the code being defined right now — its string is
        // prev's string plus prev's first byte
        require(code == next && next < MaxCode, s"GIF LZW code $code beyond dictionary")
        var c = prev
        while (c >= FirstFree) c = prefixOf(c)
        emit(prev, c)
        prefixOf(next) = prev; byteOf(next) = c.toByte
        if (next == (1 << width) - 1 && width < 12) width += 1
        next += 1
        prev = code
      }
    }
    require(got == expected,
      s"GIF pixel count mismatch (got $got, expected $expected)")
    Gif(w, h, palette, pix)
  }
}
