package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Pure-JVM audio DSP for the multimodal pipeline: radix-2 FFT, power
  * spectrum, Hann-windowed spectrogram, and MFCC (mel filterbank + log +
  * DCT-II) — the canonical audio feature-extraction ladder between raw
  * PCM decode ([[MediaCodecs]]) and model training.
  *
  * Scale design: all functions here are per-payload kernels invoked from
  * batched `mapPartitions` operators — blobs never shuffle, only
  * fixed-width features leave the partition (same shape as the image
  * decoders). Per-doc cost is O(frames · frameSize log frameSize).
  *
  * Correctness: `p_audio_spectrum` is a REAL recomputation oracle — the
  * DuckDB side evaluates the O(n²) naive DFT of the same fixture wave
  * and must agree with the FFT to 4 decimals after amplitude
  * normalization. MFCC (filterbank shapes are not reasonably
  * SQL-expressible) carries a golden digest plus spec invariants
  * (Parseval, DC energy, known-tone peak).
  */
object AudioDsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT; `re.length` must be a
    * power of two. Forward transform, no normalization. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    require(im.length == n, "re/im length mismatch")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-frame power spectrum of the first `size` samples (zero-padded if
    * shorter): bins 0..size/2, |X_k|². No window — matches the naive-DFT
    * oracle exactly. */
  def powerSpectrum(samples: Array[Double], size: Int): Array[Double] = {
    val re = new Array[Double](size)
    val im = new Array[Double](size)
    System.arraycopy(samples, 0, re, 0, math.min(samples.length, size))
    fft(re, im)
    Array.tabulate(size / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }

  /** Hann-windowed spectrogram: frames of `frameSize` samples every `hop`
    * samples (frames that would overrun are dropped), each a power
    * spectrum of the windowed frame. Returns frames × (frameSize/2+1). */
  def spectrogram(samples: Array[Double], frameSize: Int, hop: Int): Array[Array[Double]] = {
    require(hop > 0, "positive hop")
    val window = Array.tabulate(frameSize)(i =>
      0.5 - 0.5 * math.cos(2.0 * math.Pi * i / (frameSize - 1)))
    val nFrames = if (samples.length < frameSize) 0 else (samples.length - frameSize) / hop + 1
    Array.tabulate(nFrames) { f =>
      val re = Array.tabulate(frameSize)(i => samples(f * hop + i) * window(i))
      val im = new Array[Double](frameSize)
      fft(re, im)
      Array.tabulate(frameSize / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
    }
  }

  /** Triangular mel filterbank (numMel filters over bins 0..nBins-1 at the
    * given sample rate / FFT size), HTK mel scale 2595·log10(1+f/700). */
  def melFilterbank(numMel: Int, fftSize: Int, sampleRate: Int): Array[Array[Double]] = {
    def hz2mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def mel2hz(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val nBins = fftSize / 2 + 1
    val maxMel = hz2mel(sampleRate / 2.0)
    // numMel + 2 equally-spaced mel points → triangle edges
    val binOf = Array.tabulate(numMel + 2) { m =>
      val hz = mel2hz(maxMel * m / (numMel + 1))
      (hz * fftSize / sampleRate).toInt.min(nBins - 1)
    }
    Array.tabulate(numMel) { m =>
      val (lo, mid, hi) = (binOf(m), binOf(m + 1), binOf(m + 2))
      Array.tabulate(nBins) { k =>
        if (k < lo || k > hi) 0.0
        else if (k <= mid) { if (mid == lo) 1.0 else (k - lo).toDouble / (mid - lo) }
        else { if (hi == mid) 1.0 else (hi - k).toDouble / (hi - mid) }
      }
    }
  }

  /** DCT-II of a vector (unnormalized, the MFCC convention). */
  def dct2(x: Array[Double], numCoef: Int): Array[Double] =
    Array.tabulate(numCoef) { c =>
      var s = 0.0; var i = 0
      while (i < x.length) {
        s += x(i) * math.cos(math.Pi * c * (i + 0.5) / x.length); i += 1
      }
      s
    }

  /** MFCCs of the mean power spectrum over a Hann spectrogram: filterbank
    * energies → ln (floored at 1e-10) → DCT-II, first `numCoef`
    * coefficients. */
  def mfcc(samples: Array[Double], sampleRate: Int, frameSize: Int = 64,
      hop: Int = 32, numMel: Int = 10, numCoef: Int = 6): Array[Double] = {
    val spec = spectrogram(samples, frameSize, hop)
    val nBins = frameSize / 2 + 1
    val mean = new Array[Double](nBins)
    spec.foreach { fr => var k = 0; while (k < nBins) { mean(k) += fr(k); k += 1 } }
    if (spec.nonEmpty) { var k = 0; while (k < nBins) { mean(k) /= spec.length; k += 1 } }
    val fb = melFilterbank(numMel, frameSize, sampleRate)
    val logE = fb.map { filt =>
      var s = 0.0; var k = 0
      while (k < nBins) { s += filt(k) * mean(k); k += 1 }
      math.log(math.max(s, 1e-10))
    }
    dct2(logE, numCoef)
  }

  /** Test/dev helper: MFCCs of the [[MediaCodecs.wavFixture]] payload. */
  def mfccRowsLocal(id: Long): Array[Double] = {
    val (sr, samples) = MediaCodecs.decodeWavSamples(MediaCodecs.wavFixture(id))
    mfcc(samples, sr)
  }

  // ---- batched operators ---------------------------------------------------

  /** Per-payload 64-point power spectrum, one row per bin, normalized by
    * (n·amp)² so the values are scale-free (`amp` = max |sample|; silent
    * payloads emit zeros). Matches the DuckDB naive-DFT oracle. */
  def spectrumRows(payloads: Dataset[(Long, Array[Byte])], size: Int = 64): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val (_, samples) = MediaCodecs.decodeWavSamples(bytes)
        val amp = samples.foldLeft(0.0)((m, v) => math.max(m, math.abs(v)))
        val norm = if (amp > 0) (size * amp) * (size * amp) else 1.0
        val p = powerSpectrum(samples, size)
        p.iterator.zipWithIndex.map { case (pw, k) => (id, k, pw / norm) }
      }
    }.toDF("media_id", "bin", "npower")
  }

  /** Per-payload MFCC feature row (fixed-width: nFrames + coefficients). */
  def mfccRows(payloads: Dataset[(Long, Array[Byte])], numCoef: Int = 6): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (sr, samples) = MediaCodecs.decodeWavSamples(bytes)
        val nFrames = if (samples.length < 64) 0 else (samples.length - 64) / 32 + 1
        (id, sr, nFrames, mfcc(samples, sr, numCoef = numCoef).toVector)
      }
    }.toDF("media_id", "sample_rate", "n_frames", "mfcc")
  }
}
