package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM GIF87a/89a codec: logical-screen parse → LZW decode
  * (variable 3–12-bit codes, clear/EOI, little-endian bit packing) →
  * palette lookup, with Adam-less 4-pass interlace support and a real
  * LZW encoder for round-trip fixtures. Fourth wire format of the image
  * family ([[MediaCodecs.decodeBmp]], [[Jpeg]], [[Png]]); same batched
  * per-partition operator shape.
  *
  * The reference engine has no media decode (SURVEY §2 multimodal
  * extension rows); this is north-star pipeline surface, not parity.
  */
object Gif {

  final case class Image(width: Int, height: Int, pixels: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---- LZW ----------------------------------------------------------------

  /** GIF-variant LZW decode: `minCodeSize` literal bits, codes grow to 12
    * bits, `clear` resets the table, little-endian bit order. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](expected)
    var outLen = 0
    // dictionary as (prefixCode, appendByte); literals are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var dictSize = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var pos = 0
    val firstOf = new Array[Int](4096) // first byte of each code's expansion
    (0 until clear).foreach(c => firstOf(c) = c)

    def emit(code: Int): Unit = {
      // expand code to out (reversed walk) — bounded by 4096 depth
      val stack = new Array[Int](4097)
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = append(c); sp += 1; c = prefix(c) }
      stack(sp) = c; sp += 1
      while (sp > 0) {
        sp -= 1
        if (outLen < expected) { out(outLen) = stack(sp); outLen = outLen + 1 }
      }
    }

    var done = false
    while (!done && outLen < expected) {
      while (accBits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8; pos += 1
      }
      if (accBits < codeSize) done = true // stream exhausted
      else {
        val code = (acc & ((1 << codeSize) - 1)).toInt
        acc >>>= codeSize; accBits -= codeSize
        if (code == clear) {
          dictSize = eoi + 1; codeSize = minCodeSize + 1; prev = -1
        } else if (code == eoi) done = true
        else {
          require(code <= dictSize, s"corrupt LZW stream: code $code > dict $dictSize")
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev
            append(dictSize) = if (code == dictSize) firstOf(prev) else firstOf(code)
            firstOf(dictSize) = firstOf(prev)
            dictSize += 1
            if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          emit(code)
          prev = code
        }
      }
    }
    require(outLen == expected, s"LZW decode produced $outLen of $expected pixels")
    out
  }

  /** GIF-variant LZW encode (greedy longest-match with a hash map),
    * emitting an initial clear code and a trailing EOI. */
  private def lzwEncode(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var dictSize = eoi + 1
    put(clear)
    var prev = -1
    indices.foreach { sym =>
      if (prev < 0) prev = sym
      else {
        val key = (prev.toLong << 12) | sym
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (dictSize < 4096) {
            dict.put(key, Integer.valueOf(dictSize)); dictSize += 1
            if (dictSize == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
            // GIF writers bump code size when the NEXT code would overflow:
            // the decoder grows at dictSize == 1<<codeSize, the encoder one
            // later because the just-added code is not yet emitted
          } else {
            put(clear)
            dict = new java.util.HashMap[Long, Integer]()
            dictSize = eoi + 1; codeSize = minCodeSize + 1
          }
          prev = sym
        }
      }
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // ---- container ----------------------------------------------------------

  /** Encode an indexed image (palette ≤ 256 colors) as a non-interlaced
    * GIF89a with a global color table. */
  def encodeIndexed(indices: Array[Int], width: Int, height: Int,
      palette: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && indices.length == width * height, "bad dimensions")
    require(palette.nonEmpty && palette.length <= 256, "palette of 1..256 colors")
    require(indices.forall(i => i >= 0 && i < palette.length), "index out of palette")
    // color table size = next power of two ≥ max(2, palette)
    var ctBits = 1
    while ((1 << ctBits) < palette.length) ctBits += 1
    val ctSize = 1 << ctBits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0x80 | ((ctBits - 1) & 7)) // GCT present, size bits
    out.write(0); out.write(0) // bg index, aspect
    (0 until ctSize).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    // image descriptor
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0) // no LCT, not interlaced
    val minCode = math.max(2, ctBits)
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the FIRST image of a GIF87a/89a stream (animation frames
    * beyond the first are out of scope for feature extraction). */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 13, "truncated GIF stream")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF stream: $sig")
    val sw = le16(bytes, 6); val sh = le16(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      gct = Array.tabulate(n)(i => ((bytes(pos + 3 * i) & 0xff) << 16) |
        ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val w = le16(bytes, pos + 5); val h = le16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            ct = Array.tabulate(n)(i => ((bytes(pos + 3 * i) & 0xff) << 16) |
              ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
            pos += 3 * n
          }
          require(ct != null, "image without any color table")
          val interlaced = (ip & 0x40) != 0
          val minCode = bytes(pos) & 0xff; pos += 1
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          val px = new Array[Int](w * h)
          if (!interlaced) {
            var i = 0
            while (i < idx.length) { px(i) = ct(idx(i)); i += 1 }
          } else {
            // 4-pass interlace: rows 0,8,16… then 4,12… then 2,6… then 1,3…
            val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
            var src = 0
            var p = 0
            while (p < 4) {
              var y = starts(p)
              while (y < h) {
                var x = 0
                while (x < w) { px(y * w + x) = ct(idx(src)); src += 1; x += 1 }
                y += steps(p)
              }
              p += 1
            }
          }
          return Image(if (w > 0) w else sw, if (h > 0) h else sh, px)
        case 0x3b => throw new IllegalArgumentException("GIF trailer before any image")
        case other => throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalArgumentException("no image block in GIF stream")
  }

  /** Shared image-feature shape (dimensions + channel means). */
  def decodeFeatures(bytes: Array[Byte]): MediaCodecs.BmpInfo = {
    val img = decode(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    img.pixels.foreach { p =>
      sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
    }
    val n = img.pixels.length.toLong
    MediaCodecs.BmpInfo(img.width, img.height, 8,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Deterministic fixture: 6+(id%5) × 3+(id%4) indexed image over a
    * 16-color derived palette; index = (x·3 + y·5 + id) % 16, palette
    * color c = rgb((c·17+id)%256, (c·29+2·id)%256, (c·43+3·id)%256) —
    * closed forms the oracle recomputes. */
  def gifFixture(id: Long): Array[Byte] = {
    val w = (6 + id % 5).toInt; val h = (3 + id % 4).toInt
    val palette = Array.tabulate(16)(c =>
      ((((c * 17 + id) % 256).toInt << 16) |
        (((c * 29 + 2 * id) % 256).toInt << 8) |
        ((c * 43 + 3 * id) % 256).toInt))
    val idx = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5 + id).toInt % 16)
    encodeIndexed(idx, w, h, palette)
  }

  /** Batched per-partition GIF decode (same shape as the other codecs). */
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
