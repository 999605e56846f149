package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** MPEG-audio (MP3) frame-header walker: REAL container/frame-level
  * metadata decode — sync-word scan, header field extraction (version,
  * layer, bitrate, sample rate, padding), frame-length stepping, ID3v2
  * skip — yielding the stats an audio-dataset pipeline actually needs
  * (duration, CBR/VBR, bitrate, sample rate) without decoding PCM.
  *
  * The PCM synthesis stack (Huffman + IMDCT + polyphase filterbank)
  * remains the DECLARED STUB in [[Multimodal.decodeStub]] — this module
  * upgrades MP3 from fully-stubbed to header-real, the same honest
  * boundary the JPEG codec drew for progressive/arithmetic modes.
  */
object Mp3 {

  /** Frame-level stream metadata. */
  final case class Mp3Info(version: Int, layer: Int, sampleRate: Int,
      nFrames: Int, isCbr: Boolean, avgBitrateKbps: Double, durationMs: Double)

  // MPEG1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 = bad)
  private val BitrateL3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, -1)
  private val SampleRates = Array(44100, 48000, 32000, -1)

  /** Samples per frame: MPEG1 Layer III = 1152. */
  val SamplesPerFrame = 1152

  /** Layer III MPEG1 frame length in bytes. */
  def frameLength(bitrateKbps: Int, sampleRate: Int, padding: Int): Int =
    144000 * bitrateKbps / sampleRate + padding

  /** Walk the stream: skip an ID3v2 tag if present, then step frame to
    * frame via the header length formula. MPEG1 Layer III only (the
    * overwhelming wire format); anything else rejects loudly. */
  def parse(bytes: Array[Byte]): Mp3Info = {
    var pos = 0
    // ID3v2: "ID3" + ver(2) + flags + 4-byte syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + size
    }
    var nFrames = 0
    var sampleRate = -1
    var brMin = Int.MaxValue; var brMax = 0; var brSum = 0L
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0,
        f"lost frame sync at byte $pos (0x${bytes(pos) & 0xff}%02x)")
      val b1 = bytes(pos + 1) & 0xff
      val b2 = bytes(pos + 2) & 0xff
      val version = (b1 >> 3) & 3 // 3 = MPEG1
      val layer = (b1 >> 1) & 3 // 1 = Layer III
      require(version == 3, s"unsupported MPEG version bits $version (MPEG1 only)")
      require(layer == 1, s"unsupported layer bits $layer (Layer III only)")
      val brIdx = (b2 >> 4) & 0xf
      val srIdx = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      val br = BitrateL3(brIdx)
      val sr = SampleRates(srIdx)
      require(br > 0 && sr > 0, s"bad bitrate/samplerate index ($brIdx/$srIdx)")
      require(sampleRate < 0 || sampleRate == sr, "sample-rate change mid-stream")
      sampleRate = sr
      brMin = math.min(brMin, br); brMax = math.max(brMax, br); brSum += br
      nFrames += 1
      pos += frameLength(br, sr, padding)
    }
    require(nFrames > 0, "no MPEG audio frames in stream")
    Mp3Info(1, 3, sampleRate, nFrames, brMin == brMax,
      brSum.toDouble / nFrames,
      nFrames.toDouble * SamplesPerFrame * 1000.0 / sampleRate)
  }

  /** Structurally-valid fixture: 5+(id%6) MPEG1 Layer III frames at
    * bitrate {128,160,192,224,256}[id%5] kbps, sample rate
    * {44100,48000,32000}[id%3], zero payloads, preceded by a 30-byte
    * ID3v2 tag — header math is what the parser reads, so the payload
    * content is irrelevant. */
  def mp3Fixture(id: Long): Array[Byte] = {
    val br = Array(128, 160, 192, 224, 256)((id % 5).toInt)
    val sr = Array(44100, 48000, 32000)((id % 3).toInt)
    val n = (5 + id % 6).toInt
    val out = new java.io.ByteArrayOutputStream()
    // ID3v2 header + 20-byte tag body (syncsafe size)
    out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
    out.write(Array[Byte](0, 0, 0, 20))
    out.write(new Array[Byte](20))
    val brIdx = BitrateL3.indexOf(br)
    val srIdx = SampleRates.indexOf(sr)
    (0 until n).foreach { _ =>
      val len = frameLength(br, sr, 0)
      val frame = new Array[Byte](len)
      frame(0) = 0xff.toByte
      frame(1) = 0xfa.toByte // 111 11 01 0: MPEG1, Layer III, no CRC
      frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      frame(3) = 0
      out.write(frame)
    }
    out.toByteArray
  }

  /** Batched per-partition metadata decode (header walk only — blobs
    * never shuffle, PCM never synthesized). */
  def parseStreams(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val m = parse(bytes)
        (id, m.sampleRate, m.nFrames, if (m.isCbr) 1 else 0, m.avgBitrateKbps, m.durationMs)
      }
    }.toDF("media_id", "sample_rate", "n_frames", "is_cbr", "avg_bitrate_kbps", "duration_ms")
  }
}
