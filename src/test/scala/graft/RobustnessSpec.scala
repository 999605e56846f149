package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

/** Degenerate inputs a 100 TB pipeline will eventually feed the trainer:
  * constant features, all-missing features, tiny data, single class. */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  private val p = TrainParams(numRounds = 3, maxDepth = 3, maxBin = 16, seed = 1)

  test("constant and all-missing features are never split on") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      val x = rng.nextGaussian()
      // f0 informative, f1 constant, f2 all-missing
      (Array(x, 5.0, Double.NaN), 2.0 * x, 1.0)
    }
    val m = new GBTTrainer(p).fit(sc.parallelize(rows, 3))
    val usedFeatures = m.trees.flatMap(_.nodes.filter(!_.isLeaf).map(_.feature)).toSet
    assert(usedFeatures == Set(0), s"split features: $usedFeatures")
    assert(math.abs(m.margin(Array(1.0, 5.0, Double.NaN))(0) -
      m.margin(Array(1.0, 99.0, 42.0))(0)) < 1e-9,
      "constant/missing feature values must not affect prediction")
  }

  test("empty dataset fails fast with a clear message") {
    val e = intercept[IllegalArgumentException] {
      new GBTTrainer(p).fit(sc.emptyRDD[(Array[Double], Double, Double)])
    }
    assert(e.getMessage.contains("empty dataset"))
  }

  test("tiny dataset trains without error and predicts the mean") {
    val rows = Seq((Array(1.0), 3.0, 1.0), (Array(2.0), 5.0, 1.0))
    val m = new GBTTrainer(p.copy(minChildWeight = 10.0)).fit(sc.parallelize(rows, 1))
    // minChildWeight blocks every split → stumps at the base score
    assert(m.trees.forall(_.nodes.forall(_.isLeaf)))
    assert(math.abs(m.margin(Array(9.0))(0) - 4.0) < 0.5)
  }

  test("single-class logistic training stays finite") {
    val rows = (0 until 300).map(i => (Array(i.toDouble % 7), 1.0, 1.0))
    val m = new GBTTrainer(p.copy(objective = "binary:logistic"))
      .fit(sc.parallelize(rows, 2))
    val raw = m.margin(Array(3.0))(0)
    val pr = 1.0 / (1.0 + math.exp(-raw))
    assert(!pr.isNaN && pr > 0.5 && pr <= 1.0, s"prob $pr")
  }

  test("zero-weight rows are ignored by splits and leaf values") {
    val rng = new scala.util.Random(11)
    val good = (0 until 400).map { _ =>
      val x = rng.nextGaussian(); (Array(x), x, 1.0)
    }
    val poison = (0 until 400).map { _ =>
      val x = rng.nextGaussian(); (Array(x), 1000.0 * rng.nextGaussian(), 0.0)
    }
    val m = new GBTTrainer(p).fit(sc.parallelize(good ++ poison, 3))
    val pred = m.margin(Array(1.0))(0)
    assert(math.abs(pred - 1.0) < 0.6, s"zero-weight rows leaked into fit: $pred")
  }
}
