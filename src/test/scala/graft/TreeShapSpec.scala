package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BoosterModel, Node, Tree}
import graft.predict.{FlatModel, TreeShap}
import graft.tree.{GBTTrainer, TrainParams}

class TreeShapSpec extends AnyFunSuite {

  private def split(f: Int, thr: Double, l: Int, r: Int): Node =
    Node(f, thr, defaultLeft = true, l, r, Array.empty, 0.0, 0.0, Array.empty)
  private def leaf(v: Double, cover: Double): Node = Node.makeLeaf(Array(v), cover)

  private def model(trees: Tree*): BoosterModel =
    BoosterModel(trees.toArray, Array.fill(trees.size)(1.0),
      Array.fill(trees.size)(0), Array(0.0), "reg:squarederror", 1,
      numFeatures = 3)

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  /** EXPVALUE(x, S): conditional expectation of the tree with only the
    * features in S known — cover-weighted averaging on unknown splits
    * (the definition TreeSHAP computes in polynomial time). */
  private def expValue(t: Tree, x: Array[Double], s: Set[Int]): Double = {
    def cover(i: Int): Double = {
      val n = t.nodes(i)
      if (n.isLeaf) n.sumHess else cover(n.left) + cover(n.right)
    }
    def go(i: Int): Double = {
      val n = t.nodes(i)
      if (n.isLeaf) n.leaf(0)
      else if (s.contains(n.feature)) {
        if (x(n.feature) <= n.threshold) go(n.left) else go(n.right)
      } else {
        (cover(n.left) * go(n.left) + cover(n.right) * go(n.right)) / cover(i)
      }
    }
    go(0)
  }

  /** Brute-force Shapley values by subset enumeration. */
  private def bruteShap(trees: Seq[Tree], x: Array[Double], nf: Int): Array[Double] = {
    def fact(n: Int): Double = (1 to n).product.toDouble
    val phi = new Array[Double](nf)
    val all = (0 until nf).toSet
    for (i <- 0 until nf) {
      for (sBits <- 0 until (1 << nf) if ((sBits >> i) & 1) == 0) {
        val s = (0 until nf).filter(j => ((sBits >> j) & 1) == 1).toSet
        if (s.subsetOf(all - i)) {
          val wgt = fact(s.size) * fact(nf - s.size - 1) / fact(nf)
          val delta = trees.map(t => expValue(t, x, s + i) - expValue(t, x, s)).sum
          phi(i) += wgt * delta
        }
      }
    }
    phi
  }

  test("exact TreeSHAP matches brute-force Shapley enumeration") {
    // tree 1: splits f0 then f1/f2; asymmetric covers
    val t1 = Tree(Array(
      split(0, 0.0, 1, 2),
      split(1, 1.0, 3, 4),
      split(2, -1.0, 5, 6),
      leaf(1.0, 3.0), leaf(-2.0, 7.0), leaf(4.0, 2.0), leaf(0.5, 8.0)))
    // tree 2: splits f0 TWICE on one path (duplicate-feature unwind)
    val t2 = Tree(Array(
      split(0, 0.5, 1, 2),
      split(0, -0.5, 3, 4),
      leaf(2.0, 5.0), leaf(-1.0, 4.0), leaf(3.0, 6.0)))
    val m = model(t1, t2)
    val fm = FlatModel(m)
    for (x <- Seq(Array(-0.7, 0.3, 0.0), Array(0.2, 2.0, -3.0), Array(0.9, -1.0, 5.0))) {
      val got = TreeShap.shap(fm, arr(x: _*))
      val want = bruteShap(Seq(t1, t2), x, 3)
      for (f <- 0 until 3)
        assert(math.abs(got(f) - want(f)) < 1e-9, s"x=${x.toSeq} f$f: ${got(f)} vs ${want(f)}")
      // bias slot = Σ tree expectations (+ base 0)
      val bias = Seq(t1, t2).map(t => expValue(t, x, Set.empty)).sum
      assert(math.abs(got(3) - bias) < 1e-9, s"bias ${got(3)} vs $bias")
      // sum(φ) = margin
      assert(math.abs(got.sum - m.margin(x)(0)) < 1e-9)
    }
  }

  test("SHAP on a trained ensemble sums to the margin and beats zeros") {
    val spark = TestSpark.spark
    val rng = new scala.util.Random(23)
    val rows = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      (x, 2.0 * x(0) + x(1) * x(1), 1.0)
    }
    val bm = new GBTTrainer(TrainParams(numRounds = 5, maxDepth = 4, seed = 1))
      .fit(spark.sparkContext.parallelize(rows, 4))
    val fm = FlatModel(bm)
    rows.take(20).foreach { case (x, _, _) =>
      val phi = TreeShap.shap(fm, arr(x: _*))
      assert(math.abs(phi.sum - bm.margin(x)(0)) < 1e-9, "sum-to-margin")
    }
    // f2 is irrelevant: its mean |φ| should be far below f0's
    val mean = Array(0.0, 0.0, 0.0)
    rows.take(200).foreach { case (x, _, _) =>
      val phi = TreeShap.shap(fm, arr(x: _*))
      for (f <- 0 until 3) mean(f) += math.abs(phi(f)) / 200
    }
    assert(mean(0) > 5 * mean(2), s"importances: ${mean.toSeq}")
  }

  test("interaction values: rows sum to SHAP, total sums to margin") {
    val t1 = Tree(Array(
      split(0, 0.0, 1, 2),
      split(1, 0.0, 3, 4),
      split(1, 0.0, 5, 6),
      leaf(1.0, 2.0), leaf(-1.0, 3.0), leaf(-2.0, 4.0), leaf(2.0, 1.0)))
    val m = model(t1)
    val fm = FlatModel(m)
    val x = Array(0.5, -0.5, 1.0)
    val dim = 4
    val inter = TreeShap.interactions(fm, arr(x: _*))
    val phi = TreeShap.shap(fm, arr(x: _*))
    for (i <- 0 until dim) {
      val rowSum = (0 until dim).map(j => inter(i * dim + j)).sum
      assert(math.abs(rowSum - phi(i)) < 1e-9, s"row $i: $rowSum vs ${phi(i)}")
    }
    assert(math.abs(inter.sum - m.margin(x)(0)) < 1e-9)
    // f0×f1 interaction is real in this XOR-ish tree; f2 has none
    assert(math.abs(inter(0 * dim + 1)) > 1e-6, "expected f0-f1 interaction")
    assert(math.abs(inter(0 * dim + 2)) < 1e-9 && math.abs(inter(1 * dim + 2)) < 1e-9)
    // symmetry of the off-diagonal
    assert(math.abs(inter(0 * dim + 1) - inter(1 * dim + 0)) < 1e-9)
  }
}
