package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{ColumnSampler, GBTTrainer, TrainParams}

/** scale_pos_weight (`src/objective/regression_param.h:15`) and
  * feature_weights (`src/common/random.h:40-68`) behavior. */
class SamplingParamsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("scale_pos_weight shifts imbalanced logistic predictions toward the positive class") {
    val rng = new scala.util.Random(13)
    // 10% positives, weakly separable
    val rows = (0 until 3000).map { _ =>
      val pos = rng.nextDouble() < 0.1
      val x = (if (pos) 0.6 else 0.4) + rng.nextGaussian() * 0.3
      (Array(x, rng.nextDouble()), if (pos) 1.0 else 0.0, 1.0)
    }
    val d = spark.sparkContext.parallelize(rows, 4).cache()
    val p = TrainParams(objective = "binary:logistic", numRounds = 10,
      maxDepth = 3, maxBin = 32, seed = 3)
    val plain = new GBTTrainer(p).fit(d)
    val rebal = new GBTTrainer(p.copy(scalePosWeight = 9.0)).fit(d)
    val local = rows.map(_._1)
    d.unpersist(blocking = false)
    def meanP(m: graft.model.BoosterModel): Double =
      local.map(f => 1.0 / (1.0 + math.exp(-m.margin(f)(0)))).sum / local.length
    val (mp, mr) = (meanP(plain), meanP(rebal))
    // 9× positive gradients must pull the mean predicted probability up
    // toward the reweighted prevalence (0.1 → ~0.5)
    assert(mr > mp + 0.15, s"scale_pos_weight had no effect: $mp -> $mr")
    assert(mp < 0.2, s"unweighted model should sit near prevalence, got $mp")
  }

  test("feature_weights: zero-weight features are never sampled, heavy ones always") {
    val weights = Array(1.0, 0.0, 5.0, 1e-9)
    val cs = new ColumnSampler(4, seed = 42L, featureWeights = weights)
    for (iter <- 0 until 50) {
      val cols = cs.sampleTree(iter, 0.5) // 2 of 4
      assert(!cols.contains(1), s"zero-weight feature sampled at iter $iter")
      assert(cols.contains(2), s"dominant-weight feature missed at iter $iter")
    }
  }

  test("num_parallel_tree grows a bagged layer per round at weight eta/K") {
    val rng = new scala.util.Random(17)
    val rows = (0 until 2000).map { _ =>
      val x = rng.nextDouble() * 10
      (Array(x, rng.nextDouble()), 2.0 * x + rng.nextGaussian(), 1.0)
    }
    val d = spark.sparkContext.parallelize(rows, 4).cache()
    val m = new GBTTrainer(TrainParams(numRounds = 3, maxDepth = 3, maxBin = 32,
      eta = 0.3, seed = 9, subsample = 0.6, numParallelTree = 4)).fit(d)
    d.unpersist(blocking = false)
    assert(m.trees.length == 12, s"3 rounds x 4 parallel = 12 trees, got ${m.trees.length}")
    assert(m.treeWeights.forall(w => math.abs(w - 0.3 / 4) < 1e-12),
      s"layer trees must carry eta/K: ${m.treeWeights.mkString(",")}")
    // different bags ⇒ the 4 trees of round 0 are not all identical
    val r0 = m.trees.take(4).map(t => t.nodes.map(n =>
      (n.feature, n.threshold, n.leaf.toSeq)).toSeq)
    assert(r0.distinct.length > 1, "parallel trees are identical despite subsample")
    // and the ensemble learns
    val local = rows
    val mean = local.map(_._2).sum / local.length
    val rmse0 = math.sqrt(local.map { case (_, y, _) => (y - mean) * (y - mean) }.sum / local.length)
    val rmse = math.sqrt(local.map { case (f, y, _) =>
      val p = m.margin(f)(0); (p - y) * (p - y)
    }.sum / local.length)
    assert(rmse < rmse0, s"parallel-tree model failed to learn: $rmse vs $rmse0")
  }

  test("feature_weights validation rejects wrong arity and negatives") {
    intercept[IllegalArgumentException](new ColumnSampler(3, 1L, Array(1.0)))
    intercept[IllegalArgumentException](new ColumnSampler(2, 1L, Array(1.0, -1.0)))
  }
}
