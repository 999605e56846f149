package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

/** Training continuation (xgb_model) and per-row base margins. */
class ContinuationSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def mkData(n: Int = 2000) = {
    val rng = new scala.util.Random(23)
    (0 until n).map { _ =>
      val x0 = rng.nextDouble() * 10; val x1 = rng.nextDouble() * 10
      (Array(x0, x1), 1.5 * x0 - 0.7 * x1 + rng.nextGaussian() * 0.5, 1.0)
    }
  }

  test("fitContinue appends rounds and keeps improving the previous model") {
    val rows = mkData()
    val d = spark.sparkContext.parallelize(rows, 4).cache()
    val p = TrainParams(numRounds = 4, maxDepth = 3, maxBin = 32, seed = 3)
    val first = new GBTTrainer(p).fit(d)
    val continued = new GBTTrainer(p).fitContinue(d, first)
    d.unpersist(blocking = false)
    assert(continued.trees.length == 8, s"4+4 trees, got ${continued.trees.length}")
    def rmse(m: graft.model.BoosterModel): Double = math.sqrt(rows.map { case (f, y, _) =>
      val pr = m.margin(f)(0); (pr - y) * (pr - y)
    }.sum / rows.length)
    val (r1, r2) = (rmse(first), rmse(continued))
    assert(r2 < r1, s"continuation did not improve: $r1 -> $r2")
    // the first 4 trees are the previous model's, untouched
    assert(continued.trees.take(4).zip(first.trees).forall { case (a, b) => a == b })
    assert(continued.baseScore.sameElements(first.baseScore))
  }

  test("XGBoostRegressor baseMarginCol trains on residuals and adds margins back in transform") {
    val s = spark
    import s.implicits._
    val rows = mkData(1500)
    val df = rows.map { case (f, y, _) => (f, y, 1.5 * f(0) - 0.7 * f(1)) }
      .toDF("features", "label", "bm")
    val model = new graft.api.XGBoostRegressor()
      .setNumRound(4).setMaxDepth(3).setMaxBin(32).setSeed(3L)
      .setBaseMarginCol("bm").fit(df)
    val out = model.transform(df).select("label", "prediction").collect()
    val rmse = math.sqrt(out.map { r =>
      val d = r.getDouble(1) - r.getDouble(0); d * d
    }.sum / out.length)
    assert(rmse < 0.7, s"margin-aware transform should track labels, rmse $rmse")
  }

  test("fitWithBaseMargin starts boosting from the supplied margins") {
    val rows = mkData()
    // base margin = the true signal → residuals are pure noise, so the
    // booster's own contribution stays tiny
    val withMargin = rows.map { case (f, y, w) => (f, y, w, 1.5 * f(0) - 0.7 * f(1)) }
    val d = spark.sparkContext.parallelize(withMargin, 4).cache()
    val p = TrainParams(numRounds = 4, maxDepth = 3, maxBin = 32, seed = 3)
    val m = new GBTTrainer(p).fitWithBaseMargin(d)
    d.unpersist(blocking = false)
    assert(m.baseScore(0) == 0.0, "base-margin model must carry baseScore 0")
    // average own-contribution is far below the label scale
    val meanAbs = rows.map { case (f, _, _) => math.abs(m.margin(f)(0)) }.sum / rows.length
    assert(meanAbs < 0.5, s"corrections should be noise-sized, got $meanAbs")
    // and adding margins back reproduces the labels well
    val rmse = math.sqrt(withMargin.map { case (f, y, _, bm) =>
      val pr = bm + m.margin(f)(0); (pr - y) * (pr - y)
    }.sum / rows.length)
    assert(rmse < 0.7, s"margin + correction should track labels, rmse $rmse")
  }
}
