package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.predict.Predictor
import graft.tree.{GBTTrainer, TrainParams}

/** The sparse (indices, values) prediction expression must agree exactly
  * with the dense path — absent features take the tree's default (missing)
  * direction, same as a NaN in the dense encoding. */
class SparsePredictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fixture = {
    val rng = new scala.util.Random(42)
    val nf = 20
    val rows = (0 until 2000).map { _ =>
      val present = rng.shuffle((0 until nf).toList).take(6).sorted.toArray
      val values = present.map(f => rng.nextGaussian() + f * 0.05)
      val fmap = present.zip(values).toMap
      val y = fmap.getOrElse(4, 0.0) * 3.0 - fmap.getOrElse(11, 0.0) + 0.1 * rng.nextGaussian()
      (present, values, y)
    }
    val dense = rows.map { case (idx, vs, y) =>
      val f = Array.fill(nf)(Double.NaN)
      idx.zip(vs).foreach { case (i, v) => f(i) = v }
      (f, y, 1.0)
    }
    val model = new GBTTrainer(TrainParams(numRounds = 8, maxDepth = 4,
      maxBin = 32, eta = 0.3, seed = 7)).fit(spark.sparkContext.parallelize(dense, 4))
    (rows, dense, model)
  }

  test("sparse predict == dense predict (value, margin, leaf)") {
    val (rows, dense, model) = fixture
    val df = rows.zip(dense).map { case ((idx, vs, _), (f, _, _)) => (idx, vs, f) }
      .toDF("idx", "vals", "feat")
    val out = df.select(
      Predictor.predictCol(model)(col("feat")).as("dv"),
      Predictor.predictSparseCol(model)(col("idx"), col("vals")).as("sv"),
      Predictor.marginScalarCol(model)(col("feat")).as("dm"),
      Predictor.marginSparseCol(model)(col("idx"), col("vals")).as("sm"),
      Predictor.leafCol(model)(col("feat")).as("dl"),
      Predictor.leafSparseCol(model)(col("idx"), col("vals")).as("sl")
    ).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "value mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "margin mismatch")
      assert(r.getSeq[Int](4) == r.getSeq[Int](5), "leaf mismatch")
    }
  }

  test("empty sparse row routes every node through the default direction") {
    val (_, _, model) = fixture
    val df = Seq((Array.empty[Int], Array.empty[Double])).toDF("idx", "vals")
    val sparse = df.select(Predictor.marginSparseCol(model)(col("idx"), col("vals")))
      .head().getDouble(0)
    val allNaN = Array.fill(20)(Double.NaN)
    assert(sparse == model.margin(allNaN)(0))
  }

  test("sparse predict stays inside whole-stage codegen") {
    val (_, _, model) = fixture
    // spark.range (not a local Seq) so the plan isn't folded to LocalTableScan
    val df = spark.range(100).select(
      array(lit(4), lit(11)).as("idx"),
      array($"id".cast("double"), ($"id" * 2).cast("double")).as("vals"))
    val plan = df.select(Predictor.predictSparseCol(model)(col("idx"), col("vals")))
      .queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen marker in the compact plan string
    assert(plan.contains("*("), s"plan lacks codegen:\n$plan")
  }
}
