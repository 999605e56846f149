package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** REAL media decode for container-friendly formats — the non-stub half of
  * the multimodal column story, with [[Jpeg]] covering baseline JPEG
  * ([[Multimodal]] keeps the declared stub only for codec-library formats
  * like MP3/H.264 that this build environment cannot decode).
  *
  * PCM WAV (RIFF) and uncompressed 24-bit BMP are complete, publicly
  * specified formats parseable in pure JVM code, so the decode here is the
  * genuine article: a chunk-walking RIFF parser (arbitrary chunk order,
  * unknown chunks skipped by their declared size) and a BITMAPINFOHEADER
  * parser (bottom-up and top-down rows, 4-byte row padding). Decoded
  * features (sample counts, RMS energy, zero-crossing counts, mean
  * channel intensities) feed the oracle-checked `p_wav_decode` /
  * `p_bmp_decode` queries.
  *
  * Scale shape: decode runs as a batched per-partition Dataset map
  * (decoder state constructed once per partition, the same amortization a
  * `mapInPandas` codec batch gets in PySpark); blobs never shuffle — the
  * features are extracted where the payload bytes already live, and only
  * the fixed-width feature struct flows on.
  *
  * Reference correspondence: the reference treats external binary columns
  * as opaque bytes too and defers decode to user code
  * (`/root/reference/src/data/adapter.h:216` adapters take already-decoded
  * numerics); this module is the "user code" a training-data pipeline
  * needs, made a first-class operator.
  */
object MediaCodecs {

  // ---- little-endian byte helpers -----------------------------------------

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---- WAV (RIFF / PCM) ----------------------------------------------------

  /** Decoded audio features. `durationMs` = samples-per-channel / rate. */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Long, durationMs: Double, rms: Double, zeroCrossings: Long)

  /** Serialize mono/stereo 16-bit PCM to a canonical RIFF/WAVE byte stream
    * (44-byte header + interleaved little-endian samples). */
  def writeWav(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1, "channels >= 1")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes.copyToArray(out, 0)
    putLe32(out, 4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    putLe32(out, 16, 16) // PCM fmt chunk size
    putLe16(out, 20, 1) // audio format 1 = PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * channels * 2) // byte rate
    putLe16(out, 32, channels * 2) // block align
    putLe16(out, 34, 16) // bits per sample
    "data".getBytes.copyToArray(out, 36)
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Parse a RIFF/WAVE stream and extract per-channel-merged features.
    * Walks the chunk list (chunks may appear in any order, with unknown
    * chunks — LIST, cue, bext… — skipped via their declared+padded size);
    * requires PCM (format 1), 16-bit. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0
    var off = 12
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length, s"chunk '$id' overruns stream")
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(fmtOff >= 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val audioFormat = le16(bytes, fmtOff)
    val channels = le16(bytes, fmtOff + 2)
    val sampleRate = le32(bytes, fmtOff + 4)
    val bits = le16(bytes, fmtOff + 14)
    require(audioFormat == 1, s"unsupported WAV format $audioFormat (PCM only)")
    require(bits == 16, s"unsupported bit depth $bits (16-bit PCM only)")
    require(channels >= 1 && sampleRate > 0, "corrupt fmt chunk")
    val frames = dataLen / (2 * channels)
    var sumSq = 0.0
    var zc = 0L
    var prev = 0.0
    var first = true
    var f = 0
    while (f < frames) {
      // channel-mean frame value (mono passthrough; stereo averages L/R)
      var acc = 0.0
      var c = 0
      while (c < channels) {
        acc += le16(bytes, dataOff + 2 * (f * channels + c)).toShort.toDouble
        c += 1
      }
      val v = acc / channels
      sumSq += v * v
      if (!first && prev * v < 0) zc += 1
      prev = v
      first = false
      f += 1
    }
    val rms = if (frames > 0) math.sqrt(sumSq / frames) else 0.0
    WavInfo(sampleRate, channels, bits, frames,
      if (sampleRate > 0) frames * 1000.0 / sampleRate else 0.0, rms, zc)
  }

  /** Decode the raw sample stream (channel-mean per frame) for DSP
    * consumers ([[AudioDsp]]); same chunk walk and PCM constraints as
    * [[decodeWav]]. */
  def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Double]) = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    var fmtOff = -1; var dataOff = -1; var dataLen = 0
    var off = 12
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length, s"chunk '$id' overruns stream")
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0, "missing fmt/data chunk")
    require(le16(bytes, fmtOff) == 1 && le16(bytes, fmtOff + 14) == 16,
      "16-bit PCM only")
    val channels = le16(bytes, fmtOff + 2)
    val sampleRate = le32(bytes, fmtOff + 4)
    val frames = dataLen / (2 * channels)
    val out = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0; var c = 0
      while (c < channels) {
        acc += le16(bytes, dataOff + 2 * (f * channels + c)).toShort.toDouble
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    (sampleRate, out)
  }

  // ---- BMP (uncompressed 24-bit) ------------------------------------------

  /** Decoded image features: dimensions plus mean channel intensity. */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Serialize a pixel function to a BI_RGB 24-bit BMP (bottom-up rows,
    * BGR byte order, rows padded to 4-byte boundaries — the standard
    * layout). */
  def writeBmp(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, "positive dimensions")
    val stride = (width * 3 + 3) & ~3
    val dataLen = stride * height
    val out = new Array[Byte](54 + dataLen)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, 54 + dataLen) // file size
    putLe32(out, 10, 54) // pixel data offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive = bottom-up
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bpp
    putLe32(out, 30, 0) // BI_RGB (uncompressed)
    putLe32(out, 34, dataLen)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(rowOff + 3 * x) = b.toByte
        out(rowOff + 3 * x + 1) = g.toByte
        out(rowOff + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a BI_RGB 24-bit BMP and compute mean channel intensities.
    * Handles bottom-up (positive height) and top-down (negative height)
    * row order and the 4-byte row padding; means are row-order-invariant
    * but the parser still honors the layout so pixel-accurate decoders can
    * extend it. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP stream")
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    require(width > 0 && height > 0, "corrupt dimensions")
    val stride = (width * 3 + 3) & ~3
    require(dataOff + stride.toLong * height <= bytes.length, "pixel array overruns stream")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < height) {
      val srcRow = if (rawHeight > 0) height - 1 - y else y
      val rowOff = dataOff + srcRow * stride
      var x = 0
      while (x < width) {
        sb += bytes(rowOff + 3 * x) & 0xff
        sg += bytes(rowOff + 3 * x + 1) & 0xff
        sr += bytes(rowOff + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    BmpInfo(width, height, bpp, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ---- deterministic fixtures (oracle-reproducible parameterization) ------

  /** Square-wave PCM WAV whose decoded features have closed forms the
    * DuckDB oracle recomputes: rate 8000+(id%3)·4000, half-period
    * 2+(id%5), amplitude 1000+(id%7)·500, 64+(id%32) samples ⇒
    * rms = amplitude exactly, zero_crossings = ⌊(n−1)/halfPeriod⌋. */
  def wavFixture(id: Long): Array[Byte] = {
    val sr = (8000 + (id % 3) * 4000).toInt
    val halfPeriod = (2 + id % 5).toInt
    val amp = (1000 + (id % 7) * 500).toInt
    val n = (64 + id % 32).toInt
    writeWav(Array.tabulate(n) { i =>
      (if ((i / halfPeriod) % 2 == 0) amp else -amp).toShort
    }, sr)
  }

  /** Linear-congruential gradient BMP, 4+(id%5) × 3+(id%4), channel values
    * (x·7+y·13+3·id)%256 / (x·3+y·5+5·id)%256 / (x·11+y·2+7·id)%256 — the
    * oracle recomputes the means over the same grid. */
  def bmpFixture(id: Long): Array[Byte] =
    writeBmp((4 + id % 5).toInt, (3 + id % 4).toInt, (x, y) =>
      (((x * 7 + y * 13 + 3 * id) % 256).toInt,
        ((x * 3 + y * 5 + 5 * id) % 256).toInt,
        ((x * 11 + y * 2 + 7 * id) % 256).toInt))

  // ---- batched Dataset decode operators ------------------------------------

  /** Batched per-partition WAV decode: `(id, payload)` → feature columns.
    * The decode closure is constructed once per partition (codec-init
    * amortization), and only the fixed-width features leave the partition. */
  def decodeAudio(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition decoder scope: real codecs hold native state here
      it.map { case (id, bytes) =>
        val w = decodeWav(bytes)
        (id, w.sampleRate, w.channels, w.nSamples, w.durationMs, w.rms, w.zeroCrossings)
      }
    }.toDF("media_id", "sample_rate", "channels", "n_samples",
      "duration_ms", "rms", "zero_crossings")
  }

  /** Batched per-partition BMP decode: `(id, payload)` → feature columns. */
  def decodeImage(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = decodeBmp(bytes)
        (id, b.width, b.height, b.meanR, b.meanG, b.meanB)
      }
    }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }
}
