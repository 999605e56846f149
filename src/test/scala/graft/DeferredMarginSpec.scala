package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

/** The deferred prediction-cache path (marginFlushInterval > 1) keeps
  * freshly-grown trees as on-the-fly margin adjustments inside the gradient
  * passes instead of materializing a margin RDD every iteration. The
  * addition order of tree contributions is unchanged, so the trained model
  * must be BIT-identical to the flush-every-iteration path — these specs
  * assert exact (==) equality of the serialized models across flush
  * intervals, including one that never flushes within the run. */
class DeferredMarginSpec extends AnyFunSuite {
  import TestSpark._

  private def lineitemData() = {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    df.rdd.map { r =>
      val f = Array(
        r.getAs[Double]("l_quantity"),
        r.getAs[Double]("l_extendedprice"),
        r.getAs[Double]("l_discount"),
        r.getAs[Double]("l_tax"))
      (f, r.getAs[Double]("l_extendedprice") * (1 - r.getAs[Double]("l_discount")), 1.0)
    }
  }

  test("deferred cache is bit-identical across flush intervals (regression)") {
    val data = lineitemData().cache()
    val base = TrainParams(numRounds = 12, maxDepth = 4, eta = 0.3, maxBin = 32,
      minTrainPartitions = 0)
    val every = new GBTTrainer(base.copy(marginFlushInterval = 1)).fit(data).toJson
    val deferred = new GBTTrainer(base.copy(marginFlushInterval = 8)).fit(data).toJson
    val never = new GBTTrainer(base.copy(marginFlushInterval = 100)).fit(data).toJson
    assert(deferred == every)
    assert(never == every)
    data.unpersist()
  }

  test("deferred cache is bit-identical for multiclass softprob + subsample") {
    val data = lineitemData().map { case (f, _, w) =>
      (f, (f(0) % 3).floor.max(0.0), w) }.cache()
    val base = TrainParams(objective = "multi:softprob", numClass = 3,
      numRounds = 6, maxDepth = 3, eta = 0.4, maxBin = 32, subsample = 0.7,
      seed = 11, minTrainPartitions = 0)
    val every = new GBTTrainer(base.copy(marginFlushInterval = 1)).fit(data).toJson
    val deferred = new GBTTrainer(base.copy(marginFlushInterval = 4)).fit(data).toJson
    assert(deferred == every)
    data.unpersist()
  }

  test("deferred cache is bit-identical for rank:ndcg (pending-aware λ-gradients)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val data = df.rdd.map { r =>
      val f = Array(r.getAs[Double]("l_quantity"), r.getAs[Double]("l_extendedprice"),
        r.getAs[Double]("l_discount"), r.getAs[Double]("l_tax"))
      (f, (r.getAs[Int]("l_linenumber") % 4).toDouble, 1.0,
        r.getAs[Long]("l_orderkey") % 50)
    }.cache()
    val base = TrainParams(objective = "rank:ndcg", numRounds = 6, maxDepth = 3,
      eta = 0.3, maxBin = 32, seed = 3, minTrainPartitions = 0)
    val every = new GBTTrainer(base.copy(marginFlushInterval = 1)).fitRanking(data).toJson
    val deferred = new GBTTrainer(base.copy(marginFlushInterval = 4)).fitRanking(data).toJson
    assert(deferred == every)
    data.unpersist()
  }

  test("deferred cache is bit-identical for survival:cox (pending-aware risk sets)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val data = df.rdd.map { r =>
      val f = Array(r.getAs[Double]("l_quantity"), r.getAs[Double]("l_discount"),
        r.getAs[Double]("l_tax"))
      // |label| = survival time, sign = censoring
      val t = 1.0 + r.getAs[Double]("l_extendedprice") / 10000.0
      (f, if (r.getAs[Long]("l_orderkey") % 3 == 0) -t else t, 1.0)
    }.cache()
    val base = TrainParams(objective = "survival:cox", numRounds = 5, maxDepth = 3,
      eta = 0.2, maxBin = 32, seed = 5, minTrainPartitions = 0)
    val every = new GBTTrainer(base.copy(marginFlushInterval = 1)).fit(data).toJson
    val deferred = new GBTTrainer(base.copy(marginFlushInterval = 4)).fit(data).toJson
    assert(deferred == every)
    data.unpersist()
  }

  test("deferral schedules fewer Spark jobs than per-iteration flushing") {
    val data = lineitemData().cache()
    data.count()
    def jobsDuring(f: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { f; Thread.sleep(500) } // let the listener bus drain
      finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    val base = TrainParams(numRounds = 10, maxDepth = 3, eta = 0.3, maxBin = 32,
      minTrainPartitions = 0)
    val jEvery = jobsDuring {
      new GBTTrainer(base.copy(marginFlushInterval = 1)).fit(data)
    }
    val jDeferred = jobsDuring {
      new GBTTrainer(base.copy(marginFlushInterval = 100)).fit(data)
    }
    // 10 rounds: per-iteration flushing pays ~10 extra cache-advance jobs
    assert(jDeferred <= jEvery - 8,
      s"deferred fit should save ~1 job/iteration: $jDeferred vs $jEvery")
    data.unpersist()
  }

  test("watch list disables deferral without changing results") {
    val data = lineitemData().cache()
    // a watching fit takes the non-deferred branch regardless of the
    // interval — same model either way
    val p = TrainParams(numRounds = 5, maxDepth = 3, eta = 0.3, maxBin = 32,
      evalMetric = Some("rmse"), minTrainPartitions = 0)
    val a = new GBTTrainer(p.copy(marginFlushInterval = 1)).fit(data).toJson
    val b = new GBTTrainer(p.copy(marginFlushInterval = 8)).fit(data).toJson
    assert(a == b)
    data.unpersist()
  }
}
