package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

class ExactMethodSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  test("exact finds the true best split where a coarse hist misses it") {
    // signal lives in a narrow sliver: values 0..999, jump at 997.
    // maxBin=8 hist cannot place a cut at 997; exact must.
    val rng = new scala.util.Random(3)
    val rows = (0 until 4000).map { _ =>
      val v = rng.nextInt(1000).toDouble
      (Array(v), if (v > 997) 100.0 else 0.0, 1.0)
    }
    val data = sc.parallelize(rows, 4)
    val exact = new GBTTrainer(TrainParams(treeMethod = "exact", numRounds = 1,
      maxDepth = 1, eta = 1.0, seed = 1)).fit(data)
    val hist = new GBTTrainer(TrainParams(treeMethod = "hist", maxBin = 8,
      numRounds = 1, maxDepth = 1, eta = 1.0, seed = 1)).fit(data)
    val eRoot = exact.trees(0).nodes(0)
    assert(math.abs(eRoot.threshold - 997.0) < 1e-9,
      s"exact split at ${eRoot.threshold}, want 997")
    val hRoot = hist.trees(0).nodes(0)
    assert(math.abs(hRoot.threshold - 997.0) > 1.0,
      s"hist with 8 bins should NOT find 997 (got ${hRoot.threshold}) — fixture broken")
  }

  test("exact matches hist when hist bins cover every distinct value") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 3000).map { _ =>
      val x = Array(rng.nextInt(20).toDouble, rng.nextInt(20).toDouble)
      (x, x(0) * 2.0 - x(1) + 0.1 * rng.nextGaussian(), 1.0)
    }
    val data = sc.parallelize(rows, 4)
    val exact = new GBTTrainer(TrainParams(treeMethod = "exact", numRounds = 3,
      maxDepth = 3, eta = 0.5, seed = 2)).fit(data)
    val hist = new GBTTrainer(TrainParams(treeMethod = "hist", maxBin = 256,
      numRounds = 3, maxDepth = 3, eta = 0.5, seed = 2)).fit(data)
    // 20 distinct values << 256 bins: both enumerate every split point and
    // must produce the same trees (same features, same split regions)
    exact.trees.zip(hist.trees).foreach { case (a, b) =>
      assert(a.nodes.length == b.nodes.length)
      a.nodes.zip(b.nodes).filterNot(_._1.isLeaf).foreach { case (na, nb) =>
        assert(na.feature == nb.feature)
        assert(math.abs(na.threshold - nb.threshold) < 1.0,
          s"thresholds ${na.threshold} vs ${nb.threshold}")
      }
    }
    val rmseE = math.sqrt(rows.map { case (x, y, _) =>
      math.pow(exact.margin(x)(0) - y, 2) }.sum / rows.size)
    assert(rmseE < 4.0, s"exact rmse $rmseE (label std ~13)")
  }

  test("maxDistinct guard rejects high-cardinality exact fits") {
    val rows = (0 until 2000).map(i => (Array(i * 1.0001), i.toDouble, 1.0))
    val data = sc.parallelize(rows, 2)
    val e = intercept[Exception] {
      graft.data.Binning.findCutsExact(data.map(r => (r._1, r._3)), 1, maxDistinct = 100)
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }
}
