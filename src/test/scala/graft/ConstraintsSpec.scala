package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BoosterModel, Tree}
import graft.tree.{GBTTrainer, TrainParams}

/** Behavioral evidence for monotone constraints, interaction constraints
  * and DART — the reference verifies the same invariants in
  * `tests/python/test_monotone_constraints.py` (prediction monotonicity on
  * a grid), `tests/python/test_interaction_constraints.py` (per-path
  * feature sets) and `tests/python/test_boost_from_prediction.py`-style
  * dart equivalences. */
class ConstraintsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  /** y rises with x0 but with adversarial noise; x1 independent signal. */
  private def data(n: Int = 4000) = {
    val rng = new scala.util.Random(11)
    spark.sparkContext.parallelize(
      (0 until n).map { _ =>
        val x0 = rng.nextDouble() * 10
        val x1 = rng.nextDouble() * 10
        val y = 0.8 * x0 + math.sin(x0 * 3) * 2 + 0.5 * x1 + rng.nextGaussian() * 0.3
        (Array(x0, x1), y, 1.0)
      }, 4)
  }

  test("monotone_constraints: +1 on x0 makes predictions non-decreasing in x0") {
    val d = data().cache()
    val unconstrained = new GBTTrainer(TrainParams(numRounds = 20, maxDepth = 4,
      eta = 0.3, maxBin = 64, seed = 5)).fit(d)
    val constrained = new GBTTrainer(TrainParams(numRounds = 20, maxDepth = 4,
      eta = 0.3, maxBin = 64, seed = 5,
      monotoneConstraints = Array(1, 0))).fit(d)
    d.unpersist(blocking = false)

    def sweep(m: BoosterModel, x1: Double): Seq[Double] =
      (0 to 100).map(i => m.margin(Array(i / 10.0, x1))(0))

    // sin noise makes the UNCONSTRAINED model non-monotone somewhere
    val uncViolates = Seq(1.0, 5.0, 9.0).exists { x1 =>
      sweep(unconstrained, x1).sliding(2).exists(p => p(1) < p(0) - 1e-9)
    }
    assert(uncViolates, "fixture too easy: unconstrained model is already monotone")
    // the CONSTRAINED model must be monotone for every slice of x1
    for (x1 <- Seq(1.0, 5.0, 9.0)) {
      val preds = sweep(constrained, x1)
      preds.sliding(2).foreach(p =>
        assert(p(1) >= p(0) - 1e-9, s"monotonicity violated at x1=$x1: ${p(0)} -> ${p(1)}"))
    }
  }

  test("interaction_constraints: every root-to-leaf path stays inside one feature set") {
    val d = data().cache()
    val m = new GBTTrainer(TrainParams(numRounds = 10, maxDepth = 4, maxBin = 64,
      seed = 5, interactionConstraints = Seq(Set(0), Set(1)))).fit(d)
    d.unpersist(blocking = false)

    def pathsOk(t: Tree): Unit = {
      def walk(i: Int, used: Set[Int]): Unit = {
        val n = t.nodes(i)
        if (!n.isLeaf) {
          val u = used + n.feature
          assert(u.size <= 1,
            s"path mixes features $u despite interaction sets {0},{1}")
          walk(n.left, u); walk(n.right, u)
        }
      }
      walk(0, Set.empty)
    }
    m.trees.foreach(pathsOk)
  }

  test("dart with rate_drop=0 boosts like gbtree (weights = eta, equivalent fit)") {
    // bit-exact equality is not testable: treeAggregate's combine order is
    // not fixed, so double-sum/sketch-merge order varies run-to-run and can
    // flip near-tie splits (the reference has the same property across
    // allreduce topologies). The dart-specific invariants are: no-drop
    // rounds commit at weight eta (NormalizeTrees effective scale,
    // gbtree.cc:542-545) and the fit quality matches gbtree.
    val d = data(1000).cache()
    val p = TrainParams(numRounds = 5, maxDepth = 3, maxBin = 32, seed = 5)
    val gbtree = new GBTTrainer(p).fit(d)
    val dart0 = new GBTTrainer(p.copy(booster = "dart", rateDrop = 0.0)).fit(d)
    assert(dart0.treeWeights.forall(w => math.abs(w - p.eta) < 1e-12),
      s"rate_drop=0 dart weights must all be eta: ${dart0.treeWeights.mkString(",")}")
    val local = d.collect()
    d.unpersist(blocking = false)
    def rmse(m: BoosterModel): Double = math.sqrt(local.map { case (f, y, _) =>
      val pr = m.margin(f)(0); (pr - y) * (pr - y)
    }.sum / local.length)
    val (rg, rd) = (rmse(gbtree), rmse(dart0))
    assert(math.abs(rg - rd) < 0.1 * rg, s"dart0 rmse $rd vs gbtree rmse $rg")
  }

  test("dart sample_type=weighted and normalize_type=forest train and stay weight-sane") {
    val d = data(1000).cache()
    val m = new GBTTrainer(TrainParams(numRounds = 8, maxDepth = 3, maxBin = 32,
      seed = 5, eta = 0.5, booster = "dart", rateDrop = 0.4,
      sampleType = "weighted", normalizeType = "forest")).fit(d)
    val local = d.collect()
    d.unpersist(blocking = false)
    val mean = local.map(_._2).sum / local.length
    val rmse0 = math.sqrt(local.map { case (_, y, _) => (y - mean) * (y - mean) }.sum / local.length)
    val rmse = math.sqrt(local.map { case (f, y, _) =>
      val p = m.margin(f)(0); (p - y) * (p - y)
    }.sum / local.length)
    assert(rmse < rmse0, s"weighted/forest dart failed to learn: $rmse vs $rmse0")
    assert(m.treeWeights.forall(w => w > 0 && w <= 0.5 + 1e-12),
      s"tree weights out of range: ${m.treeWeights.mkString(",")}")
  }

  test("dart with dropout still learns and rescales tree weights below eta") {
    val d = data(1000).cache()
    val m = new GBTTrainer(TrainParams(numRounds = 8, maxDepth = 3, maxBin = 32,
      seed = 5, eta = 0.5, booster = "dart", rateDrop = 0.5)).fit(d)
    val local = d.collect()
    d.unpersist(blocking = false)
    val mean = local.map(_._2).sum / local.length
    val rmse0 = math.sqrt(local.map { case (_, y, _) => (y - mean) * (y - mean) }.sum / local.length)
    val rmse = math.sqrt(local.map { case (f, y, _) =>
      val p = m.margin(f)(0); (p - y) * (p - y)
    }.sum / local.length)
    assert(rmse < rmse0, s"dart failed to learn: $rmse vs base $rmse0")
    // NormalizeTrees: dropped-round trees carry weight k/(k+eta)·eta or
    // eta/(k+eta) — all weights must stay in (0, eta]
    assert(m.treeWeights.forall(w => w > 0 && w <= 0.5 + 1e-12),
      s"tree weights out of range: ${m.treeWeights.mkString(",")}")
    d.unpersist(blocking = false)
  }
}
