package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AudioDsp, MediaCodecs}

class AudioDspSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      re(k) += x(t) * math.cos(-2.0 * math.Pi * k * t / n)
      im(k) += x(t) * math.sin(-2.0 * math.Pi * k * t / n)
    }
    (re, im)
  }

  test("FFT agrees with the naive DFT") {
    val rng = new scala.util.Random(5)
    val x = Array.fill(64)(rng.nextDouble() * 2 - 1)
    val re = x.clone(); val im = new Array[Double](64)
    AudioDsp.fft(re, im)
    val (nr, ni) = naiveDft(x)
    (0 until 64).foreach { k =>
      assert(math.abs(re(k) - nr(k)) < 1e-9, s"re[$k]")
      assert(math.abs(im(k) - ni(k)) < 1e-9, s"im[$k]")
    }
  }

  test("Parseval: time energy equals 1/N of spectral energy") {
    val rng = new scala.util.Random(9)
    val x = Array.fill(128)(rng.nextGaussian())
    val re = x.clone(); val im = new Array[Double](128)
    AudioDsp.fft(re, im)
    val tEnergy = x.map(v => v * v).sum
    val fEnergy = (0 until 128).map(k => re(k) * re(k) + im(k) * im(k)).sum / 128
    assert(math.abs(tEnergy - fEnergy) < 1e-9 * math.max(1.0, tEnergy))
  }

  test("pure tone peaks at its own bin") {
    val k0 = 5
    val x = Array.tabulate(64)(t => math.cos(2.0 * math.Pi * k0 * t / 64))
    val p = AudioDsp.powerSpectrum(x, 64)
    assert(p.indices.maxBy(p) == k0)
    // a real cosine of unit amplitude: |X_k0|² = (N/2)² = 1024
    assert(math.abs(p(k0) - 1024.0) < 1e-6)
  }

  test("spectrogram frame count and Hann leakage containment") {
    val x = Array.tabulate(256)(t => math.sin(2.0 * math.Pi * 8 * t / 64))
    val spec = AudioDsp.spectrogram(x, frameSize = 64, hop = 32)
    assert(spec.length == (256 - 64) / 32 + 1)
    spec.foreach { fr =>
      // windowed tone: dominant bin still 8, sidelobes well below peak
      assert(fr.indices.maxBy(fr) == 8)
      assert(fr(20) < fr(8) * 1e-3)
    }
  }

  test("mel filterbank triangles are bounded, nonneg, and cover the band") {
    val fb = AudioDsp.melFilterbank(numMel = 10, fftSize = 64, sampleRate = 8000)
    assert(fb.length == 10 && fb.forall(_.length == 33))
    assert(fb.flatten.forall(v => v >= 0.0 && v <= 1.0))
    // every filter has some mass; combined support reaches the top bins
    fb.foreach(f => assert(f.sum > 0.0))
    assert(fb.last.lastIndexWhere(_ > 0) >= 30)
  }

  test("MFCC of the WAV fixture is finite, deterministic, and tone-sensitive") {
    val a = AudioDsp.mfccRowsLocal(3L)
    val b = AudioDsp.mfccRowsLocal(3L)
    assert(a.sameElements(b))
    assert(a.forall(v => !v.isNaN && !v.isInfinite))
    // different fixture tones (different half-periods) → different MFCCs
    val c = AudioDsp.mfccRowsLocal(4L)
    assert(!a.sameElements(c))
  }
}
