package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MediaCodecs
import graft.ext.MediaCodecs.{BmpInfo, WavInfo}

/** Real-codec unit coverage: byte-level golden checks for the RIFF/WAV and
  * BMP parsers, closed-form agreement for the oracle fixtures, and
  * malformed-stream rejection. */
class MediaCodecsSpec extends AnyFunSuite {

  test("wav roundtrip recovers header fields and sample statistics") {
    val samples = Array[Short](100, -100, 200, -200, 0, 300)
    val bytes = MediaCodecs.writeWav(samples, sampleRate = 16000)
    val info = MediaCodecs.decodeWav(bytes)
    assert(info.sampleRate == 16000)
    assert(info.channels == 1)
    assert(info.bitsPerSample == 16)
    assert(info.nSamples == 6)
    val expRms = math.sqrt(samples.map(s => s.toDouble * s).sum / 6)
    assert(math.abs(info.rms - expRms) < 1e-12)
    // sign products: (100,-100)<0, (-100,200)<0, (200,-200)<0, (-200,0)=0, (0,300)=0
    assert(info.zeroCrossings == 3)
    assert(math.abs(info.durationMs - 6 * 1000.0 / 16000) < 1e-12)
  }

  test("wav parser walks unknown chunks before fmt/data") {
    val base = MediaCodecs.writeWav(Array[Short](1000, -1000), 8000)
    // splice a LIST chunk (odd size → word-aligned pad) between WAVE and fmt
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // RIFF size field is now stale; the parser must rely on chunk walking
    val info = MediaCodecs.decodeWav(spliced)
    assert(info.sampleRate == 8000 && info.nSamples == 2 && info.zeroCrossings == 1)
  }

  test("wav parser averages stereo frames") {
    // L/R pairs: frames (+100,+300)→200, (−100,−300)→−200
    val bytes = MediaCodecs.writeWav(Array[Short](100, 300, -100, -300), 8000, channels = 2)
    val info = MediaCodecs.decodeWav(bytes)
    assert(info.channels == 2 && info.nSamples == 2)
    assert(math.abs(info.rms - 200.0) < 1e-12)
    assert(info.zeroCrossings == 1)
  }

  test("wav parser rejects malformed streams") {
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(Array[Byte](1, 2, 3)))
    val good = MediaCodecs.writeWav(Array[Short](1, 2), 8000)
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(good.take(30))) // truncated data
    val notWave = good.clone(); notWave(8) = 'X'
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(notWave))
  }

  test("wav fixture matches the oracle closed forms for 200 ids") {
    (0L until 200L).foreach { id =>
      val info = MediaCodecs.decodeWav(MediaCodecs.wavFixture(id))
      val n = 64 + id % 32
      val halfPeriod = 2 + id % 5
      assert(info.sampleRate == 8000 + (id % 3) * 4000, s"id=$id")
      assert(info.nSamples == n, s"id=$id")
      assert(info.rms == (1000 + (id % 7) * 500).toDouble, s"id=$id") // exact: all samples ±A
      assert(info.zeroCrossings == (n - 1) / halfPeriod, s"id=$id")
    }
  }

  test("bmp roundtrip recovers dimensions and channel means with row padding") {
    // width 3 → stride 12 (3 pad bytes/row): padding must not leak into means
    val bytes = MediaCodecs.writeBmp(3, 2, (x, y) => (x * 10, y * 20, 5))
    val info = MediaCodecs.decodeBmp(bytes)
    assert(info.width == 3 && info.height == 2 && info.bitsPerPixel == 24)
    assert(math.abs(info.meanR - 10.0) < 1e-12) // mean of {0,10,20}×2 rows
    assert(math.abs(info.meanG - 10.0) < 1e-12) // mean of {0,20}×3 cols
    assert(math.abs(info.meanB - 5.0) < 1e-12)
  }

  test("bmp parser handles top-down row order (negative height)") {
    val bytes = MediaCodecs.writeBmp(2, 2, (x, y) => (x + y * 2, 0, 0))
    // flip to top-down: negate height and reverse the stored rows
    val stride = 8
    val flipped = bytes.clone()
    val negH = -2
    flipped(22) = (negH & 0xff).toByte; flipped(23) = ((negH >> 8) & 0xff).toByte
    flipped(24) = ((negH >> 16) & 0xff).toByte; flipped(25) = ((negH >> 24) & 0xff).toByte
    Array.copy(bytes, 54 + stride, flipped, 54, stride)
    Array.copy(bytes, 54, flipped, 54 + stride, stride)
    val a = MediaCodecs.decodeBmp(bytes)
    val b = MediaCodecs.decodeBmp(flipped)
    assert(a.meanR == b.meanR && a.width == b.width && a.height == b.height)
  }

  test("bmp parser rejects malformed streams") {
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(Array[Byte](1, 2)))
    val good = MediaCodecs.writeBmp(2, 2, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(good.take(60))) // truncated pixels
    val notBmp = good.clone(); notBmp(0) = 'X'
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(notBmp))
  }

  test("bmp fixture matches the oracle closed forms for 200 ids") {
    (0L until 200L).foreach { id =>
      val info = MediaCodecs.decodeBmp(MediaCodecs.bmpFixture(id))
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      assert(info.width == w && info.height == h, s"id=$id")
      val grid = for { x <- 0 until w; y <- 0 until h } yield (x, y)
      def mean(f: (Int, Int) => Long): Double = grid.map { case (x, y) => f(x, y) }.sum.toDouble / (w * h)
      assert(info.meanR == mean((x, y) => (x * 7 + y * 13 + 3 * id) % 256), s"id=$id")
      assert(info.meanG == mean((x, y) => (x * 3 + y * 5 + 5 * id) % 256), s"id=$id")
      assert(info.meanB == mean((x, y) => (x * 11 + y * 2 + 7 * id) % 256), s"id=$id")
    }
  }
}
