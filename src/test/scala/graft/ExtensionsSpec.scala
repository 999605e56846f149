package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.GraftExtensions

/** SQL-surface registration via SparkSessionExtensions: graft's codegen
  * kernels become plain SQL functions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot / graft_dot_skipnan callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_dot_skipnan(array(1.0D, cast('NaN' AS DOUBLE)), array(3.0D, 4.0D)) AS dn
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 3.0)
  }

  test("graft_nfc normalizes from plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_nfc('e\u0301') AS n").head()
    assert(r.getString(0) == "\u00e9")
  }

  test("the extensions hook injects the same function set") {
    // drive the SparkSessionExtensions path directly (a new session with
    // spark.sql.extensions would need its own SparkContext lifecycle)
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // registration through the hook must not throw and must cover every
    // function the programmatic path registers
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("graft_dot", "graft_dot_skipnan", "graft_nfc"))
  }

  test("a trained model scores from plain SQL via registerModel") {
    import graft.tree.{GBTTrainer, TrainParams}
    val rng = new scala.util.Random(77)
    val rows = (0 until 1000).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, 2.0 * x(0) - x(1), 1.0)
    }
    val model = new GBTTrainer(TrainParams(numRounds = 4, maxDepth = 3, seed = 2))
      .fit(spark.sparkContext.parallelize(rows, 2))
    GraftExtensions.registerModel(spark, "my_booster", model)
    import spark.implicits._
    val df = rows.take(50).map(r => r._1.toSeq).toDF("features")
    df.createOrReplaceTempView("ext_rows")
    val out = spark.sql(
      """SELECT my_booster(features) AS p, my_booster_margin(features) AS m,
        |  my_booster_leaf(features) AS l FROM ext_rows""".stripMargin).collect()
    out.zip(rows.take(50)).foreach { case (r, (x, _, _)) =>
      assert(r.getDouble(0) == model.margin(x)(0), "sql vs direct margin")
      assert(r.getDouble(1) == model.margin(x)(0))
      assert(r.getSeq[Int](2).length == model.trees.length)
    }
  }

  test("registered function participates in codegen over a distributed plan") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = spark.range(100).selectExpr(
      "array(cast(id AS DOUBLE), 2.0D) AS a", "array(3.0D, 4.0D) AS b")
    val out = df.selectExpr("graft_dot(a, b) AS d").as[Double].collect()
    assert(out(5) == 5 * 3.0 + 8.0)
    val plan = df.selectExpr("graft_dot(a, b)").queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"plan lacks codegen:\n$plan")
  }
}
