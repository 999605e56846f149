package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM PNG codec (RFC 2083), no codec library.
  *
  * Like [[Jpeg]], this upgrades the multimodal image path from stub to
  * REAL decode for another wire format users actually have: chunk walk →
  * zlib inflate (`java.util.zip`, part of the JDK) → per-scanline
  * unfilter (all five filter types incl. Paeth) → pixels. Supports 8-bit
  * greyscale (color type 0), truecolor (2), palette (3), greyscale+alpha
  * (4) and truecolor+alpha (6), non-interlaced. The matching encoder
  * (adaptive per-row filter selection + zlib deflate) exists so tests can
  * round-trip and cross-validate against the JDK's independent ImageIO
  * PNG codec in both directions.
  *
  * PNG is lossless, so unlike JPEG the oracle closed form is exact for
  * ANY fixture image — `p_png_decode` recomputes the channel means over
  * the same deterministic gradient the fixture draws.
  *
  * The reference engine has no media decode (SURVEY §2 multimodal
  * extension rows); this is north-star pipeline surface, not parity.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Decoded image: row-major 0xRRGGBB pixels (alpha dropped on decode —
    * feature extraction wants channel intensities, not compositing). */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  // ---- byte helpers (PNG is big-endian, unlike the RIFF/BMP family) ------

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  // ---- encode ------------------------------------------------------------

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length); out.write(len)
    val tb = typ.getBytes("US-ASCII"); out.write(tb)
    out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt); out.write(c)
  }

  /** Encode row-major 0xRRGGBB pixels as 8-bit truecolor PNG. Each row's
    * filter is chosen adaptively (minimum sum of absolute signed residuals
    * — the spec's recommended heuristic), so a round-trip through our own
    * decoder exercises every filter type on realistic content. */
  def encodeRgb(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height, "bad dimensions")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Byte](stride)
    val prior = new Array[Byte](stride) // zero for row 0, per spec
    val trial = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        cur(3 * x) = (p >>> 16).toByte; cur(3 * x + 1) = (p >>> 8).toByte; cur(3 * x + 2) = p.toByte
        x += 1
      }
      // pick the filter minimizing sum |signed residual|
      var bestF = 0; var bestCost = Long.MaxValue
      val bestRow = new Array[Byte](stride)
      var f = 0
      while (f <= 4) {
        var cost = 0L; var i = 0
        while (i < stride) {
          val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
          val b = prior(i) & 0xff
          val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >>> 1
            case 4 => paeth(a, b, c)
          }
          val r = ((cur(i) & 0xff) - pred).toByte
          trial(i) = r
          cost += math.abs(r.toInt)
          i += 1
        }
        if (cost < bestCost) { bestCost = cost; bestF = f; System.arraycopy(trial, 0, bestRow, 0, stride) }
        f += 1
      }
      raw((stride + 1) * y) = bestF.toByte
      System.arraycopy(bestRow, 0, raw, (stride + 1) * y + 1, stride)
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    // zlib-wrap the filtered stream
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // truecolor
    // ihdr(10..12) = compression 0, filter 0, interlace 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------------

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse + inflate + unfilter a non-interlaced 8-bit PNG. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Signature), "not a PNG stream")
    var off = 8
    var width = 0; var height = 0; var colorType = -1; var bitDepth = 0
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (off + 8 <= bytes.length && !sawEnd) {
      val len = be32(bytes, off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      require(len >= 0 && dataOff + len + 4 <= bytes.length, s"chunk $typ overruns stream")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = be32(bytes, dataOff); height = be32(bytes, dataOff + 4)
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          require(width > 0 && height > 0, "corrupt dimensions")
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (8-bit only)")
          require(Set(0, 2, 3, 4, 6)(colorType), s"unsupported color type $colorType")
          require((bytes(dataOff + 12) & 0xff) == 0, "interlaced PNG unsupported (Adam7)")
        case "PLTE" =>
          require(len % 3 == 0, "bad PLTE length")
          palette = Array.tabulate(len / 3) { i =>
            ((bytes(dataOff + 3 * i) & 0xff) << 16) |
              ((bytes(dataOff + 3 * i + 1) & 0xff) << 8) | (bytes(dataOff + 3 * i + 2) & 0xff)
          }
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk — skip
      }
      off = dataOff + len + 4 // skip CRC
    }
    require(colorType >= 0, "missing IHDR")
    require(sawEnd, "missing IEND")
    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val stride = width * bpp
    // inflate
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte]((stride + 1) * height)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || !inf.needsInput(), "truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"short pixel stream: $got of ${raw.length}")
    // unfilter in place, row by row
    val pixels = new Array[Int](width * height)
    val cur = new Array[Byte](stride)
    val prior = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      val f = raw((stride + 1) * y) & 0xff
      require(f <= 4, s"bad filter type $f")
      System.arraycopy(raw, (stride + 1) * y + 1, cur, 0, stride)
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prior(i) & 0xff
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >>> 1
          case 4 => paeth(a, b, c)
        }
        cur(i) = ((cur(i) & 0xff) + pred).toByte
        i += 1
      }
      var x = 0
      while (x < width) {
        pixels(y * width + x) = colorType match {
          case 0 => val g = cur(x) & 0xff; (g << 16) | (g << 8) | g
          case 2 => ((cur(3 * x) & 0xff) << 16) | ((cur(3 * x + 1) & 0xff) << 8) | (cur(3 * x + 2) & 0xff)
          case 3 =>
            require(palette != null, "palette image without PLTE")
            palette(cur(x) & 0xff)
          case 4 => val g = cur(2 * x) & 0xff; (g << 16) | (g << 8) | g
          case 6 => ((cur(4 * x) & 0xff) << 16) | ((cur(4 * x + 1) & 0xff) << 8) | (cur(4 * x + 2) & 0xff)
        }
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Image(width, height, pixels)
  }

  /** Decode to the shared image-feature shape (dimensions + channel means). */
  def decodeFeatures(bytes: Array[Byte]): MediaCodecs.BmpInfo = {
    val img = decode(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
      i += 1
    }
    val n = img.pixels.length.toLong
    MediaCodecs.BmpInfo(img.width, img.height, 24,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ---- fixture + batched operator ----------------------------------------

  /** Deterministic gradient PNG, 5+(id%6) × 4+(id%3), channels
    * (x·5+y·11+3·id)%256 / (x·13+y·3+5·id)%256 / (x·2+y·7+7·id)%256.
    * Lossless ⇒ the oracle recomputes the exact means over the same grid. */
  def pngFixture(id: Long): Array[Byte] = {
    val w = (5 + id % 6).toInt; val h = (4 + id % 3).toInt
    encodeRgb(Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((((x * 5 + y * 11 + 3 * id) % 256).toInt << 16) |
        (((x * 13 + y * 3 + 5 * id) % 256).toInt << 8) |
        ((x * 2 + y * 7 + 7 * id) % 256).toInt)
    }, w, h)
  }

  /** Batched per-partition PNG decode: `(id, payload)` → feature columns
    * (same shape as the BMP/JPEG operators — blobs stay in the partition,
    * only fixed-width features leave). */
  def decodeImages(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val f = decodeFeatures(bytes)
        (id, f.width, f.height, f.meanR, f.meanG, f.meanB)
      }
    }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }
}
