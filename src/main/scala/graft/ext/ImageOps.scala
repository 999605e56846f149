package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Image feature-extraction kernels over DECODED pixels (any of the
  * [[MediaCodecs]]/[[Png]]/[[Jpeg]] decoders feeds these): bilinear
  * resize, grayscale, channel statistics — the standard preprocessing
  * between wire-format decode and model input (thumbnail, fixed-size
  * tensor, normalization).
  *
  * Determinism contract: the bilinear kernel is plain double arithmetic
  * on integer channel values with an EXPLICIT floor(v + 0.5) rounding (no
  * rint half-to-even ambiguity), so a SQL engine recomputing the same
  * formula lands on identical integers — `p_image_resize` exercises that
  * against DuckDB on the lossless PNG fixture.
  *
  * Scale: per-payload kernels behind batched `mapPartitions` — blobs stay
  * in the partition, fixed-width features leave.
  */
object ImageOps {

  /** Bilinear resize of row-major 0xRRGGBB pixels. Half-pixel centers
    * (the standard convention): source x = (tx + 0.5)·w/w2 − 0.5, clamped
    * to the image; corner weights from the fractional part; each channel
    * rounded floor(v + 0.5). */
  def resizeBilinear(pixels: Array[Int], w: Int, h: Int, w2: Int, h2: Int): Array[Int] = {
    require(w > 0 && h > 0 && w2 > 0 && h2 > 0 && pixels.length == w * h, "bad dimensions")
    val out = new Array[Int](w2 * h2)
    var ty = 0
    while (ty < h2) {
      val sy = math.max(0.0, math.min(h - 1.0, (ty + 0.5) * h / h2 - 0.5))
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, h - 1); val fy = sy - y0
      var tx = 0
      while (tx < w2) {
        val sx = math.max(0.0, math.min(w - 1.0, (tx + 0.5) * w / w2 - 0.5))
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, w - 1); val fx = sx - x0
        val p00 = pixels(y0 * w + x0); val p10 = pixels(y0 * w + x1)
        val p01 = pixels(y1 * w + x0); val p11 = pixels(y1 * w + x1)
        def ch(shift: Int): Int = {
          val v00 = (p00 >>> shift) & 0xff; val v10 = (p10 >>> shift) & 0xff
          val v01 = (p01 >>> shift) & 0xff; val v11 = (p11 >>> shift) & 0xff
          val v = (1 - fy) * ((1 - fx) * v00 + fx * v10) +
            fy * ((1 - fx) * v01 + fx * v11)
          math.floor(v + 0.5).toInt
        }
        out(ty * w2 + tx) = (ch(16) << 16) | (ch(8) << 8) | ch(0)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** ITU-R BT.601 integer luma: (299·R + 587·G + 114·B + 500) / 1000 —
    * all-integer, engine-portable. */
  def grayscale(pixels: Array[Int]): Array[Int] =
    pixels.map { p =>
      (299 * ((p >>> 16) & 0xff) + 587 * ((p >>> 8) & 0xff) + 114 * (p & 0xff) + 500) / 1000
    }

  /** Per-channel mean and population std-dev (normalization constants). */
  def channelStats(pixels: Array[Int]): (Array[Double], Array[Double]) = {
    val n = pixels.length.toDouble
    val sum = new Array[Double](3); val sumSq = new Array[Double](3)
    pixels.foreach { p =>
      var c = 0
      while (c < 3) {
        val v = ((p >>> (16 - 8 * c)) & 0xff).toDouble
        sum(c) += v; sumSq(c) += v * v
        c += 1
      }
    }
    val mean = sum.map(_ / n)
    val std = Array.tabulate(3)(c => math.sqrt(math.max(0.0, sumSq(c) / n - mean(c) * mean(c))))
    (mean, std)
  }

  /** Batched operator: decode PNG payloads, bilinear-resize to w2×h2, one
    * row per target pixel with integer channel values (thumbnail rows —
    * the fixed-size tensor a training pipeline feeds the model). */
  def resizedPngRows(payloads: Dataset[(Long, Array[Byte])], w2: Int, h2: Int): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val img = Png.decode(bytes)
        val rp = resizeBilinear(img.pixels, img.width, img.height, w2, h2)
        rp.iterator.zipWithIndex.map { case (p, i) =>
          (id, i, (p >>> 16) & 0xff, (p >>> 8) & 0xff, p & 0xff)
        }
      }
    }.toDF("media_id", "px", "r", "g", "b")
  }
}
