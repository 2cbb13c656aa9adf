package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (north star): media as opaque `binary`
  * columns with typed metadata, a REAL decode stage for two public
  * image containers, and pixel-level feature extraction.
  *
  * The decode stage parses actual image bytes — binary PPM (P6, the
  * Netpbm format: ASCII header with comment support + raw RGB) and
  * uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  * bottom-up BGR rows padded to 4 bytes) — through a per-partition
  * mapPartitions with no shuffle. Both containers round-trip through
  * [[ImageCodecs]] and decode to the same row-major RGB, so the same
  * pixel stats come out of either. Audio (RIFF/WAVE PCM) and video
  * (YUV4MPEG2) get the same treatment in [[AudioVideo]]; compressed
  * codecs (JPEG/ffmpeg) stay out of scope in this container — their
  * seam is the same mapPartitions shape with a codec call per record.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, content: Array[Byte], kind: String)

  /** Decoded-image features, all exact integers: dimensions from the
    * parsed header, per-channel sums, and the count of dark pixels
    * (integer luma (299r+587g+114b)/1000 < 128). */
  case class ImageFeatures(doc_id: Long, kind: String, width: Long,
      height: Long, sum_r: Long, sum_g: Long, sum_b: Long, n_dark: Long)

  case class FrameFeature(doc_id: Long, frame_idx: Long, fsum: Long)

  /** Features of a box-downsampled image (q94): output dims plus exact
    * per-channel sums over the resized pixels. */
  case class ResizedFeatures(doc_id: Long, kind: String, out_w: Long,
      out_h: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real encoders/decoders for the two public image containers. */
  object ImageCodecs {

    /** Row-major RGB image, 8 bits per channel. */
    case class Image(width: Int, height: Int, rgb: Array[Byte]) {
      require(rgb.length == 3 * width * height,
        s"rgb length ${rgb.length} != 3*$width*$height")
    }

    /** Binary PPM (P6), maxval 255. */
    def encodePpm(img: Image): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      header ++ img.rgb
    }

    /** Uncompressed 24-bit BMP: 14-byte file header, 40-byte
      * BITMAPINFOHEADER, bottom-up BGR rows padded to 4-byte multiples. */
    def encodeBmp(img: Image): Array[Byte] = {
      val rowBytes = img.width * 3
      val pad = (4 - rowBytes % 4) % 4
      val imageSize = (rowBytes + pad) * img.height
      val dataOffset = 14 + 40
      val out = java.nio.ByteBuffer.allocate(dataOffset + imageSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
        .putInt(dataOffset + imageSize).putShort(0).putShort(0).putInt(dataOffset)
      out.putInt(40).putInt(img.width).putInt(img.height) // +height = bottom-up
        .putShort(1).putShort(24).putInt(0).putInt(imageSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = img.height - 1
      while (y >= 0) { // bottom row first
        var x = 0
        while (x < img.width) {
          val p = 3 * (y * img.width + x)
          out.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p)) // BGR
          x += 1
        }
        var i = 0
        while (i < pad) { out.put(0.toByte); i += 1 }
        y -= 1
      }
      out.array()
    }

    /** Container sniff + decode: "P6" → PPM, "BM" → BMP, \x89"PN" → PNG
      * (RGB only here — the RGBA form carries an alpha channel this RGB
      * Image can't represent losslessly, so it must go through
      * [[PngCodec.decode]] / [[Multimodal.pngFeatures]] instead of
      * being silently flattened); anything else (or a malformed body)
      * throws — never a silent wrong decode. */
    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 2, "media too short to sniff")
      if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
      else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
      else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
        val png = PngCodec.decode(bytes)
        require(png.colorType == 2,
          "RGBA PNG has no lossless RGB view - use PngCodec.decode")
        Image(png.width, png.height, png.pix)
      } else throw new IllegalArgumentException(
        f"unsupported media container (magic 0x${bytes(0)}%02x${bytes(1)}%02x)")
    }

    /** 2×2 box-downsample with exact integer math: output pixel (ox,
      * oy) is the truncating mean of the up-to-4 source pixels
      * {2ox, 2ox+1}×{2oy, 2oy+1} that exist (odd edges average the 2
      * in-bounds pixels), per channel. Output dims ⌈w/2⌉ × ⌈h/2⌉. */
    def boxHalve(img: Image): Image = {
      val ow = (img.width + 1) / 2
      val oh = (img.height + 1) / 2
      val out = new Array[Byte](3 * ow * oh)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var c = 0
          while (c < 3) {
            var s = 0
            var n = 0
            var dy = 0
            while (dy < 2) {
              val y = 2 * oy + dy
              if (y < img.height) {
                var dx = 0
                while (dx < 2) {
                  val x = 2 * ox + dx
                  if (x < img.width) {
                    s += img.rgb(3 * (img.width * y + x) + c) & 0xff
                    n += 1
                  }
                  dx += 1
                }
              }
              dy += 1
            }
            out(3 * (ow * oy + ox) + c) = (s / n).toByte
            c += 1
          }
          ox += 1
        }
        oy += 1
      }
      Image(ow, oh, out)
    }

    /** PPM header per the Netpbm spec: tokens separated by whitespace,
      * `#` comments run to end of line, a single whitespace byte ends
      * the header; maxval must be 255 (8-bit samples). */
    private def decodePpm(b: Array[Byte]): Image = {
      var p = 2
      def token(): Int = {
        // skip whitespace and comments
        var inComment = false
        while (p < b.length && (inComment || b(p).toChar.isWhitespace || b(p) == '#')) {
          if (b(p) == '#') inComment = true
          else if (b(p) == '\n') inComment = false
          p += 1
        }
        var v = 0
        while (p < b.length && b(p) >= '0' && b(p) <= '9') {
          v = v * 10 + (b(p) - '0'); p += 1
        }
        v
      }
      val w = token(); val h = token(); val maxval = token()
      p += 1 // the single whitespace after maxval
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
        s"bad PPM dimensions ${w}x$h") // cap keeps 3*w*h in Int range
      require(maxval == 255, s"unsupported PPM maxval $maxval (8-bit only)")
      require(b.length - p >= 3 * w * h,
        s"truncated PPM: need ${3 * w * h} pixel bytes, have ${b.length - p}")
      Image(w, h, java.util.Arrays.copyOfRange(b, p, p + 3 * w * h))
    }

    private def decodeBmp(b: Array[Byte]): Image = {
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(b.length >= 54, "truncated BMP header")
      val dataOffset = buf.getInt(10)
      val headerSize = buf.getInt(14)
      require(headerSize >= 40, s"unsupported BMP header size $headerSize")
      val w = buf.getInt(18)
      val hRaw = buf.getInt(22)
      val bottomUp = hRaw > 0
      val h = math.abs(hRaw)
      val bpp = buf.getShort(28)
      val compression = buf.getInt(30)
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
        s"bad BMP dimensions ${w}x$hRaw") // cap keeps stride*h in Int range
      require(bpp == 24, s"unsupported BMP bit depth $bpp (24bpp only)")
      require(compression == 0, s"unsupported BMP compression $compression")
      val rowBytes = w * 3
      val stride = rowBytes + (4 - rowBytes % 4) % 4
      // subtraction form: a negative or huge dataOffset must not pass
      // the bound via Int overflow (fuzz contract: IAE only)
      require(dataOffset >= 54 && b.length - dataOffset >= stride * h,
        "truncated BMP pixel data")
      val rgb = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val srcRow = dataOffset + stride * (if (bottomUp) h - 1 - y else y)
        var x = 0
        while (x < w) {
          val s = srcRow + 3 * x
          val d = 3 * (y * w + x)
          rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s) // BGR → RGB
          x += 1
        }
        y += 1
      }
      Image(w, h, rgb)
    }
  }

  import ImageCodecs._

  /** Deterministic image synthesis from a text corpus (the fixture
    * generator: at 100 TB the binary column comes from a parquet/lance
    * scan or `binaryFile` source with the same schema). Pixel byte j of
    * a width-8 RGB image is the document's text byte j mod len, height
    * grows with the text; even doc_ids encode as PPM, odd as BMP — so
    * BOTH real containers flow through every downstream stage and must
    * decode to identical pixel algebra. */
  def attachImage(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty) // NULL text: drop, like the oracle
      .map { case (id, text) =>
        val img = synthesize(text)
        if (id % 2 == 0) MediaRecord(id, encodePpm(img), "ppm")
        else MediaRecord(id, encodeBmp(img), "bmp")
      }
      .toDF()
  }

  /** width 8, height ⌈⌈len/3⌉/8⌉, RGB bytes = text bytes repeated. */
  private[multimodal] def synthesize(text: String): Image = {
    val bytes = text.getBytes("UTF-8")
    val w = 8
    val nPixels = (bytes.length + 2) / 3
    val h = math.max((nPixels + w - 1) / w, 1)
    val rgb = new Array[Byte](3 * w * h)
    var j = 0
    while (j < rgb.length) { rgb(j) = bytes(j % bytes.length); j += 1 }
    Image(w, h, rgb)
  }

  /** Decoded-PNG features: dims, color type, exact channel sums
    * (sum_a = 0 for RGB), dark-pixel count over the RGB channels. */
  case class PngFeatures(doc_id: Long, color_type: Long, width: Long,
      height: Long, sum_r: Long, sum_g: Long, sum_b: Long, sum_a: Long,
      n_dark: Long)

  case class GifFeatures(doc_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, n_dark: Long)

  /** The q133 palette: entry v → (v, (7v+3) mod 256, 255−v). A fixed
    * bijective-ish ramp the oracle can recompute per index in SQL. */
  private def gifPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var v = 0
    while (v < 256) {
      p(3 * v) = v.toByte
      p(3 * v + 1) = ((7 * v + 3) % 256).toByte
      p(3 * v + 2) = (255 - v).toByte
      v += 1
    }
    p
  }

  /** GIF twin of [[attachPng]]: pixel j's palette INDEX is text byte
    * (j mod len), width 8, height ⌈len/8⌉ — one byte per pixel, the
    * indexed-color synthesis rule — encoded through GifCodec's real
    * LZW compressor. The palette is [[gifPalette]]'s fixed ramp, so the
    * oracle maps index→RGB per pixel in SQL. */
  def attachGif(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val w = 8
        val h = math.max((bytes.length + w - 1) / w, 1)
        val idx = new Array[Byte](w * h)
        var j = 0
        while (j < idx.length) { idx(j) = bytes(j % bytes.length); j += 1 }
        MediaRecord(id, GifCodec.encode(GifCodec.Gif(w, h, gifPalette, idx)), "gif")
      }
      .toDF()
  }

  /** GIF decode stage: header/extension walk, LZW decode (variable
    * width, clear-reset, KwKwK), palette mapping, exact integer pixel
    * stats — one narrow mapPartitions like every codec stage. */
  def gifFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val g = GifCodec.decode(r.content)
          var sr = 0L; var sg = 0L; var sb = 0L; var dark = 0L
          var i = 0
          val n = g.width * g.height
          while (i < n) {
            val v = g.indices(i) & 0xff
            val r8 = g.palette(3 * v) & 0xff
            val g8 = g.palette(3 * v + 1) & 0xff
            val b8 = g.palette(3 * v + 2) & 0xff
            sr += r8; sg += g8; sb += b8
            if ((299L * r8 + 587L * g8 + 114L * b8) / 1000L < 128L) dark += 1
            i += 1
          }
          GifFeatures(r.doc_id, g.width.toLong, g.height.toLong, sr, sg, sb, dark)
        }
      }
      .toDF()
  }

  /** PNG twin of [[attachImage]]: even doc_ids encode as truecolor RGB
    * (color type 2), odd as RGBA (color type 6) — byte j of the pixel
    * stream is text byte j mod len, exactly the [[synthesize]] rule at
    * the container's own channel width, so the oracle recomputes the
    * pixel algebra straight from the text. Each row y is encoded with
    * filter y mod 5 (PngCodec's rotation), putting all five unfilter
    * paths under the q102 hash. */
  def attachPng(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val colorType = if (id % 2 == 0) 2 else 6
        val bpp = if (colorType == 6) 4 else 3
        val w = 8
        val nPixels = (bytes.length + bpp - 1) / bpp
        val h = math.max((nPixels + w - 1) / w, 1)
        val pix = new Array[Byte](bpp * w * h)
        var j = 0
        while (j < pix.length) { pix(j) = bytes(j % bytes.length); j += 1 }
        MediaRecord(id, PngCodec.encode(PngCodec.Png(w, h, colorType, pix)), "png")
      }
      .toDF()
  }

  /** Adam7 twin of [[attachPng]] (r11): the same byte-cycling pixel
    * synthesis ENCODED INTERLACED through [[PngCodec.encodeAdam7]], at
    * width 9 so every pass hits the ragged-width/height edge cases
    * (w=8 would tile the pass grid exactly). The decode side is the
    * same [[pngFeatures]] — the container layout must be transparent
    * to the pixel algebra, which is precisely what q152's oracle
    * hash-checks. */
  def attachPngAdam7(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val colorType = if (id % 2 == 0) 2 else 6
        val bpp = if (colorType == 6) 4 else 3
        val w = 9
        val nPixels = (bytes.length + bpp - 1) / bpp
        val h = math.max((nPixels + w - 1) / w, 1)
        val pix = new Array[Byte](bpp * w * h)
        var j = 0
        while (j < pix.length) { pix(j) = bytes(j % bytes.length); j += 1 }
        MediaRecord(id,
          PngCodec.encodeAdam7(PngCodec.Png(w, h, colorType, pix)), "png")
      }
      .toDF()
  }

  /** PNG decode stage: the real chunk walk / CRC verify / zlib inflate /
    * unfilter per record inside one narrow mapPartitions — same shape as
    * [[imageFeatures]], plus the alpha channel sum for RGBA. */
  def pngFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val png = PngCodec.decode(r.content)
          val bpp = png.bpp
          var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var dark = 0L
          var i = 0
          val n = png.width * png.height
          while (i < n) {
            val r8 = png.pix(bpp * i) & 0xff
            val g8 = png.pix(bpp * i + 1) & 0xff
            val b8 = png.pix(bpp * i + 2) & 0xff
            sr += r8; sg += g8; sb += b8
            if (bpp == 4) sa += png.pix(bpp * i + 3) & 0xff
            if ((299L * r8 + 587L * g8 + 114L * b8) / 1000L < 128L) dark += 1
            i += 1
          }
          PngFeatures(r.doc_id, png.colorType.toLong, png.width.toLong,
            png.height.toLong, sr, sg, sb, sa, dark)
        }
      }
      .toDF()
  }

  /** The decode stage: narrow (partition-preserving), no shuffle;
    * decoder state initializes once per partition, not per row. Parses
    * the REAL container bytes (PPM or BMP per record) and reduces the
    * pixel array to exact integer stats. */
  def imageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec init)
        it.map { r =>
          val img = decode(r.content)
          var sr = 0L; var sg = 0L; var sb = 0L; var dark = 0L
          var i = 0
          val n = img.width * img.height
          while (i < n) {
            val r8 = img.rgb(3 * i) & 0xff
            val g8 = img.rgb(3 * i + 1) & 0xff
            val b8 = img.rgb(3 * i + 2) & 0xff
            sr += r8; sg += g8; sb += b8
            if ((299L * r8 + 587L * g8 + 114L * b8) / 1000L < 128L) dark += 1
            i += 1
          }
          ImageFeatures(r.doc_id, r.kind, img.width.toLong, img.height.toLong,
            sr, sg, sb, dark)
        }
      }
      .toDF()
  }

  /** The resize stage (q94): decode → exact 2×2 box-downsample →
    * re-encode into a PPM container → re-decode → features, all inside
    * one narrow mapPartitions (no shuffle; codec state per partition).
    * The deliberate container round-trip makes the WRITE path of the
    * codec part of the verified op, not just the parser: a broken
    * encoder (header, row order, channel order) hash-mismatches q94
    * even though the pure resize math would have been right. */
  def resizedFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val img = decode(encodePpm(boxHalve(decode(r.content))))
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          val n = img.width * img.height
          while (i < n) {
            sr += img.rgb(3 * i) & 0xff
            sg += img.rgb(3 * i + 1) & 0xff
            sb += img.rgb(3 * i + 2) & 0xff
            i += 1
          }
          ResizedFeatures(r.doc_id, r.kind, img.width.toLong,
            img.height.toLong, sr, sg, sb)
        }
      }
      .toDF()
  }

  /** Frame sampling over DECODED pixel data: each image row is a
    * "frame" (the 1:N flatMap shape a real frame sampler produces);
    * the per-frame feature is the row's RGB byte sum mod 1e9+7. */
  def frameFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val P = 1000000007L
    media.as[MediaRecord]
      .flatMap { r =>
        val img = decode(r.content)
        val rowBytes = 3 * img.width
        (0 until img.height).iterator.map { k =>
          var s = 0L
          var i = k * rowBytes
          val lim = i + rowBytes
          while (i < lim) { s = (s + (img.rgb(i) & 0xff)) % P; i += 1 }
          FrameFeature(r.doc_id, k.toLong, s)
        }
      }
      .toDF()
  }
}
