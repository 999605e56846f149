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

  test("the extensions hook injects the same function set") {
    // drive the SparkSessionExtensions path directly (a new session with
    // spark.sql.extensions would need its own SparkContext lifecycle)
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // registration through the hook must not throw and must cover every
    // function the programmatic path registers
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("graft_dot", "graft_dot_skipnan"))
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
