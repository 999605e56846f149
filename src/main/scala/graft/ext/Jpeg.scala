package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit): a
  * real entropy-coded decoder — marker parse, canonical Huffman decode,
  * zigzag + dequantization, separable IDCT, sampling-factor upsampling,
  * YCbCr→RGB — plus the encoder used to synthesize deterministic fixtures
  * (and to round-trip in tests). This closes the JPEG half of the
  * [[Multimodal]] decode story with no codec library: baseline JPEG needs
  * none — Huffman and an 8×8 IDCT are ~400 lines of plain code.
  *
  * Supported: baseline DCT (SOF0), 8-bit precision, 1 or 3 components,
  * sampling factors 1–2 (4:4:4, 4:2:2, 4:2:0), restart intervals (DRI +
  * RSTn), multiple DQT/DHT segments, unknown APPn/COM segments skipped.
  * Rejected loudly: progressive (SOF2), arithmetic coding, 12-bit,
  * hierarchical — a training pipeline wants a crisp error, not a wrong
  * image.
  *
  * Determinism contract (what the oracle pins): a grayscale image that is
  * CONSTANT within each 8×8 block encodes to DC-only coefficients
  * (F(0,0) = 8·(v−128), every AC exactly 0), so with a flat quantization
  * table the decode is bit-exact — the fixture means have closed forms
  * the DuckDB oracle recomputes over the block grid (`p_jpeg_decode`),
  * the same pattern as [[MediaCodecs.bmpFixture]]. Lossy-path accuracy is
  * covered in `JpegSpec` by round-trip bounds and cross-validation
  * against the JDK's independent ImageIO codec.
  *
  * Reference correspondence: the reference has no media decode at all
  * (`/root/reference/src/data/adapter.h:216` consumes already-decoded
  * numerics); like [[MediaCodecs]], this is the user-code stage made a
  * first-class, oracle-checked operator.
  */
object Jpeg {

  // ---- tables --------------------------------------------------------------

  /** Zigzag scan: zigzag position → raster index in the 8×8 block. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K.3 typical Huffman tables (bits[1..16], values). */
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Separable IDCT basis c(x)(u) = C(u)/2 · cos((2x+1)uπ/16). */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- canonical Huffman ---------------------------------------------------

  /** Decode side (T.81 F.2.2.3): per code length, the smallest/largest
    * code and the index of its first value. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.readBit()
      var l = 1
      while (l < 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.readBit()
        l += 1
      }
      require(maxCode(l) >= 0 && code <= maxCode(l), "corrupt Huffman stream")
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Encode side: symbol → (code, length), canonical order. */
  private def huffEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[Int] = {
    // packed code<<5 | length, indexed by symbol
    val table = new Array[Int](256)
    java.util.Arrays.fill(table, -1)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        table(vals(k) & 0xff) = (code << 5) | l
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  // ---- bit IO with 0xFF byte stuffing --------------------------------------

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    /** true if positioned at a marker (0xFF xx, xx != 0) — caller decides. */
    def atMarker: Boolean =
      cnt == 0 && pos + 1 < bytes.length &&
        (bytes(pos) & 0xff) == 0xff && bytes(pos + 1) != 0
    def readBit(): Int = {
      if (cnt == 0) {
        require(pos < bytes.length, "entropy stream truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "entropy stream truncated at 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else b = 0xff // marker reached mid-read: only valid via resync
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def resyncRestart(): Unit = {
      cnt = 0
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xf8) == 0xd0, "expected restart marker")
      pos += 2
    }
  }

  private final class BitWriter {
    val out = new ArrayBuffer[Byte]()
    private var buf = 0
    private var cnt = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out += buf.toByte
          if (buf == 0xff) out += 0x00.toByte // byte stuffing
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    /** Pad with 1-bits to a byte boundary (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) writeBits((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  // ---- DCT -----------------------------------------------------------------

  /** In-place-free separable 8×8 forward DCT (levels already −128). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    // rows: tmp(y,u) = Σ_x f(y,x)·c(x)(u)·2  (the ·2 folds C into Cos)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Separable 8×8 inverse DCT (output still level-shifted by −128). */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * Cos(y)(vv); vv += 1 }
        out(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- encoder -------------------------------------------------------------

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one 8×8 block (levels −128, raster order): quantize, DC-diff +
    * AC run-length Huffman per T.81 F.1.4; returns the new DC predictor. */
  private def encodeBlock(w: BitWriter, block: Array[Double], qt: Array[Int],
      dcTab: Array[Int], acTab: Array[Int], pred: Int): Int = {
    val f = fdct(block)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      q(i) = math.round(f(Zigzag(i)) / qt(i)).toInt
      i += 1
    }
    def emit(tab: Array[Int], sym: Int): Unit = {
      val e = tab(sym)
      require(e >= 0, s"symbol $sym not in Huffman table")
      w.writeBits(e >>> 5, e & 31)
    }
    def emitValue(v: Int, s: Int): Unit =
      if (s > 0) w.writeBits(if (v >= 0) v else v + (1 << s) - 1, s)
    val diff = q(0) - pred
    val s0 = category(diff)
    emit(dcTab, s0)
    emitValue(diff, s0)
    var k = 1
    var run = 0
    while (k < 64) {
      if (q(k) == 0) run += 1
      else {
        while (run >= 16) { emit(acTab, 0xf0); run -= 16 } // ZRL
        val s = category(q(k))
        emit(acTab, (run << 4) | s)
        emitValue(q(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) emit(acTab, 0x00) // EOB
    q(0)
  }

  private def seg(out: ArrayBuffer[Byte], marker: Int, payload: Array[Byte]): Unit = {
    out += 0xff.toByte; out += marker.toByte
    val len = payload.length + 2
    out += ((len >> 8) & 0xff).toByte; out += (len & 0xff).toByte
    out ++= payload
  }

  /** Encode a grayscale image (row-major 0–255 values) as baseline JPEG.
    * `quant` is the luma table in zigzag order (all-1s = numerically
    * near-lossless; exactly lossless on per-block-constant images). */
  def encodeGray(pixels: Array[Int], width: Int, height: Int,
      quant: Array[Int] = Array.fill(64)(1)): Array[Byte] =
    encode(Array(pixels), width, height, Array(quant))

  /** Encode 3-plane YCbCr 4:4:4 (or 1-plane grayscale) baseline JPEG. */
  private def encode(planes: Array[Array[Int]], width: Int, height: Int,
      quants: Array[Array[Int]]): Array[Byte] = {
    val nComp = planes.length
    require(nComp == 1 || nComp == 3, "1 or 3 components")
    val out = new ArrayBuffer[Byte]()
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    // DQT (table 0 = luma; table 1 = chroma when present)
    val nQt = math.min(quants.length, 2)
    (0 until nQt).foreach { t =>
      seg(out, 0xdb, (Array(t) ++ quants(t).map(q => q & 0xff)).map(_.toByte))
    }
    // SOF0
    val sof = ArrayBuffer[Byte](8.toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte, nComp.toByte)
    (0 until nComp).foreach { c =>
      sof += (c + 1).toByte; sof += 0x11.toByte // 1×1 sampling (4:4:4)
      sof += (if (c == 0) 0 else 1).toByte
    }
    seg(out, 0xc0, sof.toArray)
    // DHT: DC/AC luma (+ chroma for color)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      val p = new ArrayBuffer[Byte]()
      p += ((cls << 4) | id).toByte
      (1 to 16).foreach(l => p += bits(l).toByte)
      p ++= vals
      seg(out, 0xc4, p.toArray)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    if (nComp == 3) { dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals) }
    // SOS
    val sos = ArrayBuffer[Byte](nComp.toByte)
    (0 until nComp).foreach { c =>
      sos += (c + 1).toByte
      sos += (if (c == 0) 0x00 else 0x11).toByte
    }
    sos += 0.toByte; sos += 63.toByte; sos += 0.toByte
    seg(out, 0xda, sos.toArray)
    // entropy-coded data: 4:4:4 interleaved MCU = one block per component
    val w = new BitWriter
    val dcT = Array(huffEncodeTable(DcLumaBits, DcLumaVals), huffEncodeTable(DcChromaBits, DcChromaVals))
    val acT = Array(huffEncodeTable(AcLumaBits, AcLumaVals), huffEncodeTable(AcChromaBits, AcChromaVals))
    val preds = new Array[Int](nComp)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val block = new Array[Double](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < nComp) {
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              // edge replication for partial blocks
              val sx = math.min(mx * 8 + xx, width - 1)
              val sy = math.min(my * 8 + yy, height - 1)
              block(yy * 8 + xx) = planes(c)(sy * width + sx) - 128.0
              xx += 1
            }
            yy += 1
          }
          val t = if (c == 0) 0 else 1
          preds(c) = encodeBlock(w, block, quants(math.min(t, quants.length - 1)),
            dcT(t), acT(t), preds(c))
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    w.flush()
    out ++= w.out
    out += 0xff.toByte; out += 0xd9.toByte // EOI
    out.toArray
  }

  /** Encode an RGB image (packed 0xRRGGBB ints, row-major) as baseline
    * 4:4:4 color JPEG via the JFIF YCbCr transform. */
  def encodeRgb(pixels: Array[Int], width: Int, height: Int,
      quantLuma: Array[Int] = Array.fill(64)(1),
      quantChroma: Array[Int] = Array.fill(64)(1)): Array[Byte] = {
    val n = width * height
    val yP = new Array[Int](n); val cbP = new Array[Int](n); val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = (pixels(i) >> 16) & 0xff
      val g = (pixels(i) >> 8) & 0xff
      val b = pixels(i) & 0xff
      yP(i) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
      cbP(i) = clamp8(math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128).toInt)
      crP(i) = clamp8(math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128).toInt)
      i += 1
    }
    encode(Array(yP, cbP, crP), width, height, Array(quantLuma, quantChroma))
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder -------------------------------------------------------------

  /** Decoded image: dimensions, component count, and row-major planes —
    * grayscale: one Y plane; color: R, G, B planes (0–255). */
  final case class Image(width: Int, height: Int, nComponents: Int,
      planes: Array[Array[Int]])

  private final case class Component(id: Int, h: Int, v: Int, qtId: Int)

  /** Decode a baseline JPEG stream. Loud errors on unsupported coding
    * modes; skips APPn/COM; handles restart intervals and 1–2 sampling
    * factors (nearest-neighbor upsampling, the JFIF-common choice). */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG stream (missing SOI)")
    val qts = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var pos = 2
    def u16(p: Int) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var image: Image = null
    while (image == null) {
      require(pos + 4 <= bytes.length, "truncated JPEG (no SOS/EOI)")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS — empty JPEG")
        case 0xc0 | 0xc1 => // baseline / extended sequential
          val len = u16(pos)
          require((bytes(pos + 2) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(pos + 3)
          width = u16(pos + 5)
          val n = bytes(pos + 7) & 0xff
          require(n == 1 || n == 3, s"unsupported component count $n")
          comps = Array.tabulate(n) { c =>
            val o = pos + 8 + 3 * c
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, (hv >> 4) & 15, hv & 15, bytes(o + 2) & 0xff)
          }
          comps.foreach { c =>
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"unsupported sampling ${c.h}x${c.v} (1-2 only)")
          }
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported — baseline only")
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(f"unsupported SOF marker 0xff$m%02x")
        case 0xc4 => // DHT — possibly several tables in one segment
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val cls = (bytes(p) >> 4) & 15
            val id = bytes(p) & 15
            val bits = new Array[Int](17)
            var total = 0
            (1 to 16).foreach { l => bits(l) = bytes(p + l) & 0xff; total += bits(l) }
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val d = new HuffDecoder(bits, vals)
            if (cls == 0) dcTabs(id) = d else acTabs(id) = d
            p += 17 + total
          }
          pos += len
        case 0xdb => // DQT — possibly several tables
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val prec = (bytes(p) >> 4) & 15
            val id = bytes(p) & 15
            require(prec == 0, "16-bit quantization tables not supported")
            qts(id) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
          pos += len
        case 0xdd => restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xda => // SOS — start of scan: decode entropy data
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(comps != null, "SOS before SOF")
          require(ns == comps.length, "partial-scan JPEG not supported (baseline interleaved only)")
          val scanTabs = Array.tabulate(ns) { i =>
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            require(comps(i).id == cid, "scan component order must match SOF")
            ((tt >> 4) & 15, tt & 15)
          }
          pos += len
          image = decodeScan(bytes, pos, comps, scanTabs, qts, dcTabs, acTabs,
            width, height, restartInterval)
        case _ => pos += u16(pos) // APPn, COM, anything else: skip by length
      }
    }
    image
  }

  private def decodeScan(bytes: Array[Byte], start: Int, comps: Array[Component],
      scanTabs: Array[(Int, Int)], qts: Array[Array[Int]],
      dcTabs: Array[HuffDecoder], acTabs: Array[HuffDecoder],
      width: Int, height: Int, restartInterval: Int): Image = {
    val n = comps.length
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane at its own resolution (MCU-padded)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(n)(c => new Array[Int](planeW(c) * planeH(c)))
    val in = new BitReader(bytes, start)
    val preds = new Array[Int](n)
    val coef = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.resyncRestart()
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < n) {
        val comp = comps(c)
        val qt = qts(comp.qtId)
        require(qt != null, s"missing quant table ${comp.qtId}")
        val dcT = dcTabs(scanTabs(c)._1)
        val acT = acTabs(scanTabs(c)._2)
        require(dcT != null && acT != null, "missing Huffman table")
        var bv = 0
        while (bv < comp.v) {
          var bh = 0
          while (bh < comp.h) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val s0 = dcT.decode(in)
            val diff = if (s0 == 0) 0 else extend(in.readBits(s0), s0)
            preds(c) += diff
            coef(0) = preds(c).toDouble * qt(0)
            // AC
            var k = 1
            var stop = false
            while (k < 64 && !stop) {
              val rs = acT.decode(in)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else stop = true // EOB
              } else {
                k += r
                require(k < 64, "AC run overflows block")
                coef(Zigzag(k)) = extend(in.readBits(s), s).toDouble * qt(k)
                k += 1
              }
            }
            val px = idct(coef)
            val baseX = (mx * comp.h + bh) * 8
            val baseY = (my * comp.v + bv) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((baseY + yy) * planeW(c) + baseX + xx) =
                  clamp8(math.round(px(yy * 8 + xx) + 128.0).toInt)
                xx += 1
              }
              yy += 1
            }
            bh += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop + upsample to full resolution (nearest neighbor)
    val full = Array.tabulate(n) { c =>
      val p = new Array[Int](width * height)
      val sx = comps(c).h
      val sy = comps(c).v
      var y = 0
      while (y < height) {
        val srcY = y * sy / vMax
        var x = 0
        while (x < width) {
          p(y * width + x) = planes(c)(srcY * planeW(c) + x * sx / hMax)
          x += 1
        }
        y += 1
      }
      p
    }
    if (n == 1) Image(width, height, 1, full)
    else {
      // JFIF YCbCr → RGB
      val r = new Array[Int](width * height)
      val g = new Array[Int](width * height)
      val b = new Array[Int](width * height)
      var i = 0
      while (i < width * height) {
        val yv = full(0)(i)
        val cb = full(1)(i) - 128
        val cr = full(2)(i) - 128
        r(i) = clamp8(math.round(yv + 1.402 * cr).toInt)
        g(i) = clamp8(math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt)
        b(i) = clamp8(math.round(yv + 1.772 * cb).toInt)
        i += 1
      }
      Image(width, height, 3, Array(r, g, b))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ---- feature extraction + fixture ---------------------------------------

  /** Decoded features in the [[MediaCodecs.BmpInfo]] shape (grayscale
    * reports the Y mean on all three channels). */
  def decodeFeatures(bytes: Array[Byte]): MediaCodecs.BmpInfo = {
    val img = decode(bytes)
    def mean(p: Array[Int]): Double = {
      var s = 0L; var i = 0
      while (i < p.length) { s += p(i); i += 1 }
      s.toDouble / p.length
    }
    if (img.nComponents == 1) {
      val m = mean(img.planes(0))
      MediaCodecs.BmpInfo(img.width, img.height, 8, m, m, m)
    } else MediaCodecs.BmpInfo(img.width, img.height, 24,
      mean(img.planes(0)), mean(img.planes(1)), mean(img.planes(2)))
  }

  /** Batched per-partition JPEG decode in the [[MediaCodecs.decodeImage]]
    * shape: `(id, payload)` → feature columns; blobs never shuffle. */
  def decodeImages(payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): org.apache.spark.sql.DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = decodeFeatures(bytes)
        (id, b.width, b.height, b.meanR, b.meanG, b.meanB)
      }
    }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Deterministic grayscale fixture: 8·(2+id%3) × 8·(1+id%2) image,
    * CONSTANT within each 8×8 block with value (bx·31 + by·17 + 5·id)%256
    * — DC-only coefficients and a flat quant table make the decode
    * bit-exact (scaladoc above), so the per-channel mean equals the block
    * grid's mean, which the DuckDB oracle recomputes in closed form. */
  def jpegFixture(id: Long): Array[Byte] = {
    val w = 8 * (2 + id % 3).toInt
    val h = 8 * (1 + id % 2).toInt
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8
      val by = (i / w) / 8
      ((bx * 31 + by * 17 + 5 * id) % 256).toInt
    }
    encodeGray(px, w, h)
  }
}
