package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

class EarlyStoppingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  test("training stops on a plateaued eval set and truncates to best iteration") {
    val rng = new scala.util.Random(61)
    val train = (0 until 2000).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, x(0) * 2.0 + 0.1 * rng.nextGaussian(), 1.0)
    }
    // eval labels are PURE NOISE: eval rmse plateaus immediately while
    // train keeps improving — the classic overfit-stop fixture
    val eval = (0 until 800).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, rng.nextGaussian(), 1.0)
    }
    val trainer = new GBTTrainer(TrainParams(numRounds = 40, maxDepth = 4,
      maxBin = 64, eta = 0.3, seed = 7, earlyStoppingRounds = 3))
    val model = trainer.fit(sc.parallelize(train, 4), sc.parallelize(eval, 4))
    assert(trainer.evalHistory.nonEmpty)
    assert(model.trees.length < 40, s"should stop early, got ${model.trees.length} trees")
    assert(model.trees.length == trainer.bestIteration + 1,
      s"model truncated to best iteration: ${model.trees.length} vs ${trainer.bestIteration + 1}")
  }

  test("watch history decreases on a learnable train set (no eval set)") {
    val rng = new scala.util.Random(67)
    val train = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, x(0) - x(1) + 0.05 * rng.nextGaussian(), 1.0)
    }
    val trainer = new GBTTrainer(TrainParams(numRounds = 8, maxDepth = 3,
      maxBin = 64, eta = 0.3, seed = 7, evalMetric = Some("rmse")))
    val model = trainer.fit(sc.parallelize(train, 4))
    val h = trainer.evalHistory.map(_._2)
    assert(h.size == 8)
    assert(h.last < h.head * 0.5, s"train rmse should fall: $h")
    assert(model.trees.length == 8, "no early stop without stopping rounds")
  }

  test("early stopping composes with binary objectives and maximize metrics") {
    val rng = new scala.util.Random(71)
    val train = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, if (x(0) + 0.5 * rng.nextGaussian() > 0) 1.0 else 0.0, 1.0)
    }
    val eval = (0 until 600).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, if (rng.nextBoolean()) 1.0 else 0.0, 1.0) // noise
    }
    val trainer = new GBTTrainer(TrainParams(objective = "binary:logistic",
      numRounds = 30, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 7,
      evalMetric = Some("logloss"), earlyStoppingRounds = 3))
    val model = trainer.fit(sc.parallelize(train, 4), sc.parallelize(eval, 4))
    assert(model.trees.length < 30, s"expected early stop, got ${model.trees.length}")
  }

  test("named watchlist: every set logged per round, LAST drives early stopping") {
    val rng = new scala.util.Random(17)
    val train = (0 until 2000).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, x(0) * 2.0 + 0.1 * rng.nextGaussian(), 1.0)
    }
    val noise = (0 until 800).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, rng.nextGaussian(), 1.0)
    }
    val trainer = new GBTTrainer(TrainParams(numRounds = 40, maxDepth = 4,
      maxBin = 64, eta = 0.3, seed = 7, earlyStoppingRounds = 3))
    // watches: learnable "train" first, pure-noise "val" LAST — stopping
    // must follow val (plateaus), not train (keeps improving)
    val model = trainer.fitWatches(sc.parallelize(train, 4),
      Seq("train" -> sc.parallelize(train, 4), "val" -> sc.parallelize(noise, 4)))
    assert(model.trees.length < 40, s"val watch should stop early, got ${model.trees.length}")
    val full = trainer.evalHistoryFull
    assert(full.nonEmpty)
    assert(full.head._2.keySet == Set("train-rmse", "val-rmse"), full.head._2.keySet.toString)
    // train-rmse improves across the run while val-rmse plateaued
    val trainSeries = full.map(_._2("train-rmse"))
    assert(trainSeries.last < trainSeries.head,
      s"train watch should improve: ${trainSeries.head} -> ${trainSeries.last}")
    // early stopping tracked the LAST watch: best iteration's val-rmse is
    // the series minimum
    val valSeries = full.map(_._2("val-rmse"))
    assert(valSeries(trainer.bestIteration) == valSeries.min)
  }

  test("watchlist order matters: learnable set last does NOT stop early") {
    val rng = new scala.util.Random(18)
    val train = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, x(0) * 2.0 + 0.1 * rng.nextGaussian(), 1.0)
    }
    val noise = (0 until 600).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, rng.nextGaussian(), 1.0)
    }
    val trainer = new GBTTrainer(TrainParams(numRounds = 12, maxDepth = 4,
      maxBin = 64, eta = 0.3, seed = 7, earlyStoppingRounds = 3))
    val model = trainer.fitWatches(sc.parallelize(train, 4),
      Seq("noise" -> sc.parallelize(noise, 4), "train" -> sc.parallelize(train, 4)))
    assert(model.trees.length == 12,
      s"learnable last watch should not trigger early stop, got ${model.trees.length}")
  }
}
