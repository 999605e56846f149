package graft.predict

import org.apache.spark.sql.catalyst.util.ArrayData

/** Exact TreeSHAP (Lundberg & Lee's polynomial-time algorithm) and SHAP
  * interaction values over a [[FlatModel]] — the reference's
  * `src/predictor/interpretability/shap.cc:101-340` (`ExtendPath` /
  * `UnwindPath` / `TreeShap` / interaction loop), re-derived from the
  * published algorithm on our structure-of-arrays layout.
  *
  * The "path" is the set of unique features on the root→node path, each
  * carrying: the fraction of cover-weighted paths that flow through when
  * the feature is UNKNOWN (`zero`), whether the row's value follows this
  * branch (`one` ∈ {0,1}), and a permutation weight (`w`). A leaf's
  * contribution to φ_d is the unwound permutation-weight sum times
  * `(one−zero)·leafValue`. Conditioning (±1 on one feature) yields the
  * on/off contributions whose half-difference is the interaction value.
  *
  * Each recursion level owns a slice of one preallocated buffer (size
  * `(maxDepth+1)(maxDepth+2)/2` — same trick as the reference), so a row's
  * SHAP costs zero allocations beyond that buffer. */
object TreeShap {

  /** φ (length numFeatures+1, last = bias) for the whole ensemble. */
  def shap(m: FlatModel, a: ArrayData): Array[Double] = {
    val phi = new Array[Double](m.numFeatures + 1)
    phi(m.numFeatures) = m.baseScore(0)
    var t = 0
    while (t < m.treeRoot.length) {
      accumulate(m, a, t, phi, 0, -1, m.treeWeight(t))
      t += 1
    }
    phi
  }

  /** (M+1)×(M+1) interaction matrix, flattened row-major. Row i sums to
    * φ_i; the grand total is the margin (the invariants the reference's
    * `tests/python/test_shap.py` asserts). Off-diagonals are
    * `(φ_j|i present − φ_j|i absent)/2`; the bias row/col absorbs each
    * row's remainder so row sums hold exactly. */
  def interactions(m: FlatModel, a: ArrayData): Array[Double] = {
    val nf = m.numFeatures
    val dim = nf + 1
    val out = new Array[Double](dim * dim)
    val contrib = shap(m, a)
    val on = new Array[Double](dim)
    val off = new Array[Double](dim)
    var i = 0
    while (i <= nf) {
      java.util.Arrays.fill(on, 0.0)
      java.util.Arrays.fill(off, 0.0)
      if (i < nf) { // conditioning on the bias pseudo-feature is a no-op
        var t = 0
        while (t < m.treeRoot.length) {
          accumulate(m, a, t, on, 1, i, m.treeWeight(t))
          accumulate(m, a, t, off, -1, i, m.treeWeight(t))
          t += 1
        }
      }
      var j = 0
      var rowSum = 0.0
      while (j < dim) {
        if (j != i) {
          val v = (on(j) - off(j)) / 2.0
          out(i * dim + j) = v
          rowSum += v
        }
        j += 1
      }
      out(i * dim + i) = contrib(i) - rowSum // row sums to φ_i by construction
      i += 1
    }
    out
  }

  /** One tree's conditioned φ accumulation (ref `TreeShap` recursion,
    * `shap.cc:193-280`). condition: 0 plain, +1 feature fixed present,
    * −1 fixed absent. */
  private def accumulate(m: FlatModel, a: ArrayData, t: Int, phi: Array[Double],
      condition: Int, conditionFeature: Int, scale: Double): Unit = {
    val root = m.treeRoot(t)
    if (condition == 0) phi(m.numFeatures) += scale * m.nodeValue(root)
    val maxd = treeDepth(m, root) + 3
    val n = maxd * (maxd + 1) / 2 + maxd
    val pd = new Array[Int](n)
    val pz = new Array[Double](n)
    val po = new Array[Double](n)
    val pw = new Array[Double](n)
    recurse(m, a, root, pd, pz, po, pw, 0, 0, 1.0, 1.0, -1,
      condition, conditionFeature, 1.0, phi, scale)
  }

  private def treeDepth(m: FlatModel, i: Int): Int =
    if (m.feature(i) < 0) 0
    else 1 + math.max(treeDepth(m, m.left(i)), treeDepth(m, m.right(i)))

  // ---- path ops on the shared buffer; `off` = this level's slice start ----

  private def extend(pd: Array[Int], pz: Array[Double], po: Array[Double],
      pw: Array[Double], off: Int, depth: Int,
      zeroFraction: Double, oneFraction: Double, featureIndex: Int): Unit = {
    pd(off + depth) = featureIndex
    pz(off + depth) = zeroFraction
    po(off + depth) = oneFraction
    pw(off + depth) = if (depth == 0) 1.0 else 0.0
    var i = depth - 1
    while (i >= 0) {
      pw(off + i + 1) += oneFraction * pw(off + i) * (i + 1).toDouble / (depth + 1)
      pw(off + i) = zeroFraction * pw(off + i) * (depth - i).toDouble / (depth + 1)
      i -= 1
    }
  }

  private def unwind(pd: Array[Int], pz: Array[Double], po: Array[Double],
      pw: Array[Double], off: Int, depth: Int, pathIndex: Int): Unit = {
    val one = po(off + pathIndex)
    val zero = pz(off + pathIndex)
    var next = pw(off + depth)
    var i = depth - 1
    while (i >= 0) {
      if (one != 0) {
        val tmp = pw(off + i)
        pw(off + i) = next * (depth + 1) / ((i + 1) * one)
        next = tmp - pw(off + i) * zero * (depth - i).toDouble / (depth + 1)
      } else {
        pw(off + i) = pw(off + i) * (depth + 1) / (zero * (depth - i))
      }
      i -= 1
    }
    i = pathIndex
    while (i < depth) {
      pd(off + i) = pd(off + i + 1)
      pz(off + i) = pz(off + i + 1)
      po(off + i) = po(off + i + 1)
      i += 1
    }
  }

  private def unwoundSum(pz: Array[Double], po: Array[Double], pw: Array[Double],
      off: Int, depth: Int, pathIndex: Int): Double = {
    val one = po(off + pathIndex)
    val zero = pz(off + pathIndex)
    var next = pw(off + depth)
    var total = 0.0
    var i = depth - 1
    while (i >= 0) {
      if (one != 0) {
        val tmp = next * (depth + 1) / ((i + 1) * one)
        total += tmp
        next = pw(off + i) - tmp * zero * (depth - i).toDouble / (depth + 1)
      } else {
        total += pw(off + i) / (zero * (depth - i))
      }
      i -= 1
    }
    if (one != 0) total else total * (depth + 1)
  }

  private def recurse(m: FlatModel, a: ArrayData, node: Int,
      pd: Array[Int], pz: Array[Double], po: Array[Double], pw: Array[Double],
      parentOff: Int, depthIn: Int,
      parentZeroFraction: Double, parentOneFraction: Double, parentFeature: Int,
      condition: Int, conditionFeature: Int, conditionFraction: Double,
      phi: Array[Double], scale: Double): Unit = {
    if (conditionFraction == 0.0) return
    var depth = depthIn
    // child slice starts ONE PAST parentOff+depth (ref `parent_unique_path
    // + unique_depth + 1`): after a condition decrement the parent's
    // physical entries run to parentOff+depth+... — the +1 keeps sibling
    // copies from overlapping them
    val off = parentOff + depth + 1
    // copy depth+1 entries (ref copies unique_depth+1): when extend is
    // skipped below (conditioned feature), the last copied slot IS a valid
    // path entry; when extend runs it just overwrites that slot
    var i = depth
    while (i >= 0) {
      pd(off + i) = pd(parentOff + i)
      pz(off + i) = pz(parentOff + i)
      po(off + i) = po(parentOff + i)
      pw(off + i) = pw(parentOff + i)
      i -= 1
    }
    i = 0
    if (condition == 0 || conditionFeature != parentFeature)
      extend(pd, pz, po, pw, off, depth, parentZeroFraction, parentOneFraction, parentFeature)

    val f = m.feature(node)
    if (f < 0) { // leaf
      val leaf = m.leafVal(m.leafOff(node))
      i = 1
      while (i <= depth) {
        val w = unwoundSum(pz, po, pw, off, depth, i)
        phi(pd(off + i)) += w * (po(off + i) - pz(off + i)) * leaf * scale * conditionFraction
        i += 1
      }
      return
    }

    // hot child = the one the row's value actually follows
    val v = if (f >= a.numElements() || a.isNullAt(f)) Double.NaN else a.getDouble(f)
    val hot =
      if (v != v) { if (m.defaultLeft(node)) m.left(node) else m.right(node) }
      else if (m.catLen(node) > 0) {
        val o = m.catOff(node)
        if (java.util.Arrays.binarySearch(m.catVal, o, o + m.catLen(node), v.toInt) >= 0)
          m.right(node)
        else m.left(node)
      } else if (v <= m.threshold(node)) m.left(node)
      else m.right(node)
    val cold = if (hot == m.left(node)) m.right(node) else m.left(node)
    val w = m.cover(node)
    val hotZero = m.cover(hot) / w
    val coldZero = m.cover(cold) / w
    var incomingZero = 1.0
    var incomingOne = 1.0
    // same feature already on the path: undo it first
    var pathIndex = 0
    while (pathIndex <= depth && pd(off + pathIndex) != f) pathIndex += 1
    if (pathIndex != depth + 1) {
      incomingZero = pz(off + pathIndex)
      incomingOne = po(off + pathIndex)
      unwind(pd, pz, po, pw, off, depth, pathIndex)
      depth -= 1
    }
    var hotCond = conditionFraction
    var coldCond = conditionFraction
    if (condition > 0 && f == conditionFeature) {
      coldCond = 0.0
      depth -= 1
    } else if (condition < 0 && f == conditionFeature) {
      hotCond *= hotZero
      coldCond *= coldZero
      depth -= 1
    }
    recurse(m, a, hot, pd, pz, po, pw, off, depth + 1,
      hotZero * incomingZero, incomingOne, f,
      condition, conditionFeature, hotCond, phi, scale)
    recurse(m, a, cold, pd, pz, po, pw, off, depth + 1,
      coldZero * incomingZero, 0.0, f,
      condition, conditionFeature, coldCond, phi, scale)
  }
}
