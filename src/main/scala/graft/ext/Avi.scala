package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM AVI/MJPEG container codec: RIFF chunk walk → per-frame JPEG
  * payloads → [[Jpeg]] decode. Together with the baseline-JPEG codec this
  * makes the VIDEO modality real end-to-end — frame-sample an MJPEG AVI
  * and extract per-frame features with no codec library — replacing the
  * byte-stride stand-in in [[Multimodal.sampleFrames]] for the one video
  * wire format a JVM can honestly decode (H.264 entropy+transform stacks
  * remain the declared stub).
  *
  * Layout handled: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  * LIST('movi' 00dc…) [idx1])` — the standard MJPEG shape. The parser
  * walks chunks (even-byte aligned per RIFF), takes fps from `avih`'s
  * microseconds-per-frame, and treats each `00dc`/`00db` chunk as one
  * JPEG frame.
  *
  * Scale notes: frame extraction is map-only — the blob enters a
  * partition, only sampled-frame features leave. Sampling BEFORE decode
  * (stride over the chunk index) means unsampled frames are never
  * Huffman-decoded, which is the point of I-frame-style sampling at
  * 100 TB.
  *
  * The reference engine has no media decode (SURVEY §2 multimodal
  * extension rows); this is north-star pipeline surface, not parity.
  */
object Avi {

  /** Parsed container: frame payloads are still-encoded JPEG bytes. */
  final case class Video(width: Int, height: Int, fps: Double, frames: Vector[Array[Byte]])

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  private def tag(b: Array[Byte], off: Int): String = new String(b, off, 4, "US-ASCII")

  // ---- write ---------------------------------------------------------------

  /** Serialize JPEG frames as an MJPEG AVI at the given fps. */
  def writeAvi(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need frames and a positive fps")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { val b = new Array[Byte](4); putLe32(b, 0, v); out.write(b) }
    def wTag(t: String): Unit = out.write(t.getBytes("US-ASCII"))

    // strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = new Array[Byte](40)
    putLe32(strf, 0, 40); putLe32(strf, 4, width); putLe32(strf, 8, height)
    strf(12) = 1 // planes
    strf(14) = 24 // bit count
    "MJPG".getBytes("US-ASCII").copyToArray(strf, 16)

    // strh: 'vids'/'MJPG', scale=1, rate=fps, length=nFrames
    val strh = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strh, 0)
    "MJPG".getBytes("US-ASCII").copyToArray(strh, 4)
    putLe32(strh, 20, 1) // dwScale
    putLe32(strh, 24, fps) // dwRate
    putLe32(strh, 32, frames.length) // dwLength

    // avih: usPerFrame, totalFrames, 1 stream, dimensions
    val avih = new Array[Byte](56)
    putLe32(avih, 0, 1000000 / fps)
    putLe32(avih, 16, frames.length)
    putLe32(avih, 24, 1)
    putLe32(avih, 32, width); putLe32(avih, 36, height)

    val strl = 4 + (8 + strh.length) + (8 + strf.length) // 'strl' + strh + strf
    val hdrl = 4 + (8 + avih.length) + (8 + strl) // 'hdrl' + avih + LIST strl
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val movi = 4 + moviBody
    val riffBody = 4 + (8 + hdrl) + (8 + movi) // 'AVI ' + LIST hdrl + LIST movi

    wTag("RIFF"); w32(riffBody); wTag("AVI ")
    wTag("LIST"); w32(hdrl); wTag("hdrl")
    wTag("avih"); w32(avih.length); out.write(avih)
    wTag("LIST"); w32(strl); wTag("strl")
    wTag("strh"); w32(strh.length); out.write(strh)
    wTag("strf"); w32(strf.length); out.write(strf)
    wTag("LIST"); w32(movi); wTag("movi")
    frames.foreach { f =>
      wTag("00dc"); w32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // RIFF even-byte padding
    }
    out.toByteArray
  }

  // ---- parse ---------------------------------------------------------------

  /** Walk the RIFF tree; collect `00dc`/`00db` frame chunks + header info. */
  def parseAvi(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "not an AVI stream")
    var width = 0; var height = 0; var usPerFrame = 0
    val frames = Vector.newBuilder[Array[Byte]]

    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val ck = tag(bytes, off)
        val len = le32(bytes, off + 4)
        require(len >= 0 && off + 8 + len <= bytes.length, s"chunk $ck overruns stream")
        ck match {
          case "LIST" => walk(off + 12, off + 8 + len) // skip the list type tag
          case "avih" =>
            usPerFrame = le32(bytes, off + 8)
            width = le32(bytes, off + 8 + 32); height = le32(bytes, off + 8 + 36)
          case "00dc" | "00db" =>
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
          case _ => // strh/strf/idx1/JUNK — not needed for frame extraction
        }
        off += 8 + len + (len & 1) // RIFF chunks are even-aligned
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    require(fs.nonEmpty, "no video frames in stream")
    Video(width, height, if (usPerFrame > 0) 1e6 / usPerFrame else 0.0, fs)
  }

  /** Sample every `stride`-th frame (0, stride, 2·stride, …) and decode the
    * sampled JPEGs only — unsampled frames stay encoded. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, MediaCodecs.BmpInfo)] = {
    require(stride > 0, "positive stride")
    val v = parseAvi(bytes)
    (0 until v.frames.length by stride).map(i => (i, Jpeg.decodeFeatures(v.frames(i))))
  }

  // ---- fixture + batched operator ------------------------------------------

  /** Deterministic MJPEG fixture: 4+(id%4) frames of the per-block-constant
    * grayscale pattern (bx·31 + by·17 + 5·id + 11·f)%256 at
    * 8·(2+id%3) × 8 px, fps 10+(id%5). DC-only + flat quant ⇒ bit-exact
    * frame decode ⇒ closed-form per-frame means for the oracle. */
  def aviFixture(id: Long): Array[Byte] = {
    val bw = (2 + id % 3).toInt
    val w = 8 * bw; val h = 8
    val n = (4 + id % 4).toInt
    val frames = (0 until n).map { f =>
      Jpeg.encodeGray(Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8
        ((bx * 31 + 5 * id + 11 * f) % 256).toInt
      }, w, h)
    }
    writeAvi(frames, w, h, (10 + id % 5).toInt)
  }

  /** Batched per-partition video frame-sample: `(id, payload)` → one row
    * per SAMPLED frame with per-frame features. Blobs never shuffle; the
    * flatMap emits only fixed-width rows. */
  def sampleVideos(payloads: Dataset[(Long, Array[Byte])], stride: Int): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val v = parseAvi(bytes)
        (0 until v.frames.length by stride).iterator.map { i =>
          val f = Jpeg.decodeFeatures(v.frames(i))
          (id, i, v.frames.length, v.fps, f.width, f.height, f.meanR)
        }
      }
    }.toDF("media_id", "frame_idx", "n_frames", "fps", "width", "height", "mean_y")
  }
}
