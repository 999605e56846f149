package graft.data

import scala.collection.mutable.ArrayBuffer

/** Mergeable weighted quantile summary — the GK-style summary of the
  * reference's `WQSummary` (`src/common/quantile.h:35-530`) and of the
  * weighted-quantile-sketch appendix of Chen & Guestrin, KDD'16.
  *
  * Each entry is `(value, rmin, rmax, wmin)`:
  *   rmin = sum of weights of elements strictly below `value` (lower bound),
  *   rmax = sum of weights of elements at or below `value` (upper bound),
  *   wmin = total weight of elements exactly equal to `value`.
  * Invariants: rmin non-decreasing, rmax non-decreasing, rmin+wmin <= rmax.
  *
  * `merge` is the reference's `SetCombine`; `prune` is `SetPrune`
  * (`quantile.h:225`): both preserve the eps rank-error bound, so the
  * summary is a proper commutative-monoid aggregation buffer — safe under
  * Spark's arbitrary partial-agg merge order (SURVEY §7.4 risk 1).
  */
final class WQSummary(
    val values: Array[Double],
    val rmins: Array[Double],
    val rmaxs: Array[Double],
    val wmins: Array[Double]
) extends Serializable {

  def size: Int = values.length
  def totalWeight: Double = if (size == 0) 0.0 else rmaxs(size - 1)

  /** SetCombine (quantile.h `SetCombine`): merge two summaries. */
  def merge(other: WQSummary): WQSummary = {
    if (other.size == 0) return this
    if (size == 0) return other
    val n = size + other.size
    val v = new ArrayBuffer[Double](n)
    val rmin = new ArrayBuffer[Double](n)
    val rmax = new ArrayBuffer[Double](n)
    val wmin = new ArrayBuffer[Double](n)
    var i = 0; var j = 0
    // helpers: rank bounds contributed by the OTHER summary at a foreign value
    def addEntry(value: Double, rmi: Double, rma: Double, wmi: Double): Unit = {
      if (v.nonEmpty && v.last == value) {
        // identical values merged: ranks add
        val k = v.length - 1
        rmin(k) += rmi; rmax(k) += rma; wmin(k) += wmi
      } else { v += value; rmin += rmi; rmax += rma; wmin += wmi }
    }
    while (i < size || j < other.size) {
      if (j >= other.size || (i < size && values(i) < other.values(j))) {
        // entry from this; other's contribution at values(i)
        val x = values(i)
        val (orm, orx) = other.rankBoundsAt(x, j)
        addEntry(x, rmins(i) + orm, rmaxs(i) + orx, wmins(i))
        i += 1
      } else if (i >= size || other.values(j) < values(i)) {
        val x = other.values(j)
        val (trm, trx) = rankBoundsAt(x, i)
        addEntry(x, other.rmins(j) + trm, other.rmaxs(j) + trx, other.wmins(j))
        j += 1
      } else { // equal values: exact sum
        addEntry(values(i), rmins(i) + other.rmins(j), rmaxs(i) + other.rmaxs(j),
          wmins(i) + other.wmins(j))
        i += 1; j += 1
      }
    }
    new WQSummary(v.toArray, rmin.toArray, rmax.toArray, wmin.toArray)
  }

  /** (rmin, rmax) contribution of THIS summary at foreign value x, where
    * `hint` is a lower bound on the insertion position (scan cursor). */
  private def rankBoundsAt(x: Double, hint: Int): (Double, Double) = {
    // predecessor: last entry with value < x; successor: first with value > x
    var p = hint - 1
    while (p + 1 < size && values(p + 1) < x) p += 1
    val lo = if (p >= 0) rmins(p) + wmins(p) else 0.0 // RMinNext of predecessor
    val s = p + 1
    val hi =
      if (s < size) rmaxs(s) - wmins(s) // RMaxPrev of successor
      else totalWeight
    (lo, hi)
  }

  /** SetPrune (quantile.h:225): shrink to at most `maxSize` entries keeping
    * endpoints; selects entries nearest evenly spaced ranks. */
  def prune(maxSize: Int): WQSummary = {
    if (size <= maxSize || size <= 2) return this
    val keep = new java.util.TreeSet[Integer]()
    keep.add(0); keep.add(size - 1)
    val tw = totalWeight
    val n = maxSize - 2
    var k = 1
    var cursor = 0
    while (k <= n) {
      val d = tw * k / (n + 1)
      // first entry whose mid-rank >= d, starting from cursor (ranks sorted)
      while (cursor < size - 1 && (rmins(cursor) + rmaxs(cursor)) * 0.5 < d) cursor += 1
      keep.add(cursor)
      k += 1
    }
    val idx = keep.toArray(new Array[Integer](0)).map(_.intValue()).sorted
    new WQSummary(idx.map(values), idx.map(rmins), idx.map(rmaxs), idx.map(wmins))
  }

  /** Value whose rank range covers `d` (query function of the paper):
    * first entry with rmax >= d, so a value whose [rmin, rmax] interval
    * contains the requested rank is returned. */
  def query(d: Double): Double = {
    if (size == 0) return Double.NaN
    if (d >= totalWeight) return values(size - 1)
    var lo = 0; var hi = size - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rmaxs(mid) < d) lo = mid + 1 else hi = mid
    }
    values(lo)
  }
}

object WQSummary {
  val empty = new WQSummary(Array.empty, Array.empty, Array.empty, Array.empty)

  /** Exact summary from raw (value, weight) pairs. */
  def fromSorted(pairs: Array[(Double, Double)]): WQSummary = {
    if (pairs.isEmpty) return empty
    val v = new ArrayBuffer[Double](pairs.length)
    val wmin = new ArrayBuffer[Double](pairs.length)
    var i = 0
    while (i < pairs.length) {
      val (x, w) = pairs(i)
      if (v.nonEmpty && v.last == x) wmin(wmin.length - 1) += w
      else { v += x; wmin += w }
      i += 1
    }
    val n = v.length
    val rmin = new Array[Double](n)
    val rmax = new Array[Double](n)
    var acc = 0.0
    i = 0
    while (i < n) { rmin(i) = acc; acc += wmin(i); rmax(i) = acc; i += 1 }
    new WQSummary(v.toArray, rmin, rmax, wmin.toArray)
  }
}

/** Streaming sketch over one feature: buffers raw pairs, folds them into a
  * pruned summary when full (the background-queue design of
  * `quantile.h:488` `WQuantileSketch`). `maxSize` follows the reference's
  * budget `2/eps * kFactor` with kFactor=2 (`quantile.h:568-590`). */
final class QuantileSketch(val maxSize: Int, bufferCap: Int = 4096) extends Serializable {
  private var summary: WQSummary = WQSummary.empty
  private val buf = new ArrayBuffer[(Double, Double)](math.min(bufferCap, 1024))

  def push(value: Double, weight: Double): Unit = {
    if (!java.lang.Double.isNaN(value) && weight > 0) {
      buf += ((value, weight))
      if (buf.length >= bufferCap) flush()
    }
  }

  private def flush(): Unit = {
    if (buf.nonEmpty) {
      val sorted = buf.toArray.sortBy(_._1)
      summary = summary.merge(WQSummary.fromSorted(sorted)).prune(maxSize)
      buf.clear()
    }
  }

  def result: WQSummary = { flush(); summary }

  def merge(other: QuantileSketch): QuantileSketch = {
    flush()
    summary = summary.merge(other.result).prune(maxSize)
    this
  }
}

object QuantileSketch {
  /** Sketch budget for a target bin count (ref `quantile.h:568`: eps =
    * 1/max_bin, internal resolution eps/kFactor, kFactor=2). */
  def sizeFor(maxBin: Int): Int = math.max(8 * maxBin, 64)
}
