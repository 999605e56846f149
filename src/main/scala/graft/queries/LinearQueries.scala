package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.linear.{GBLinearTrainer, LinearParams}

/** gblinear queries. One shotgun round from the label-mean base on
  * reg:squarederror is CLOSED FORM (ref `coordinate_common.h:45-63`):
  * the bias delta is 0 (base = weighted label mean ⇒ Σg = 0) and each
  * weight is `w_f = −Σ(g·x_f) / (Σx_f² + λ·ΣW)` — plain SQL aggregates,
  * so the distributed trainer gets a DuckDB hash-match on its actual
  * update math, not just a rows-only smoke. */
object LinearQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gblinear_step" -> ((s, dir) => {
      val data = TrainQueries.lineitemTrainingData(s, dir)
      val m = new GBLinearTrainer(LinearParams(numRounds = 1, eta = 1.0,
        lambda = 0.1, updater = "shotgun")).fit(data)
      import s.implicits._
      Seq((
        math.round(m.weights(0) * 1e5) / 1e5,
        math.round(m.weights(1) * 1e5) / 1e5,
        math.round(m.weights(2) * 1e5) / 1e5,
        math.round(m.weights(3) * 1e5) / 1e5
      )).toDF("w_quantity", "w_extendedprice", "w_discount", "w_tax")
    }),

    // MULTICLASS one-step closed form: from zero margins the softmax is
    // uniform (p = 1/K), so h = 2·(1/K)(1−1/K) is a constant and
    // g_k = 1/K − 1{y=k}; the shotgun bias step is
    // db_k = −Σg_k/Σh_k, and each weight is
    // w_kf = −(Σg_k·x + db_k·h·Σx) / (h·Σx² + λ·ΣW) — all plain SQL
    // aggregates, hash-matching the distributed per-(feature, class)
    // lanes of fitMulti.
    "q_gblinear_multi_step" -> ((s, dir) => {
      val data = TrainQueries.lineitemTrainingData3Class(s, dir)
      val m = new GBLinearTrainer(LinearParams(objective = "multi:softprob",
        numRounds = 1, eta = 1.0, lambda = 0.1, updater = "shotgun"))
        .fitMulti(data, numClass = 3)
      import s.implicits._
      val vals = for (k <- 0 until 3; f <- 0 until 4)
        yield math.round(m.weights(k)(f) * 1e5) / 1e5
      Seq(Tuple1(0)).toDF("_drop").select(
        (for (k <- 0 until 3; f <- 0 until 4) yield
          org.apache.spark.sql.functions.lit(vals(k * 4 + f)).as(s"w${k}_x${f + 1}")): _*)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_gblinear_step" ->
      """WITH t AS (
        |  SELECT l_quantity AS x1, l_extendedprice AS x2, l_discount AS x3, l_tax AS x4,
        |         l_extendedprice * (1 - l_discount) / 100000.0 AS y
        |  FROM lineitem
        |), g AS (
        |  SELECT x1, x2, x3, x4, (SELECT avg(y) FROM t) - y AS gg FROM t
        |)
        |SELECT
        |  round(-sum(gg * x1) / (sum(x1 * x1) + 0.1 * count(*)), 5) + 0.0 AS w_quantity,
        |  round(-sum(gg * x2) / (sum(x2 * x2) + 0.1 * count(*)), 5) + 0.0 AS w_extendedprice,
        |  round(-sum(gg * x3) / (sum(x3 * x3) + 0.1 * count(*)), 5) + 0.0 AS w_discount,
        |  round(-sum(gg * x4) / (sum(x4 * x4) + 0.1 * count(*)), 5) + 0.0 AS w_tax
        |FROM g""".stripMargin,

    // K = 3, h constant = 2·(1/3)(1−1/3); g_k = 1/3 − 1{y=k}; eta 1, λ 0.1
    "q_gblinear_multi_step" -> {
      val h = "(2.0 * (1.0/3.0) * (1.0 - 1.0/3.0))"
      def g(k: Int) = s"(CASE WHEN y = $k THEN 1.0/3.0 - 1.0 ELSE 1.0/3.0 END)"
      def db(k: Int) = s"(-(sum(${g(k)})) / ($h * count(*)))"
      val cols = (for (k <- 0 until 3; f <- 1 to 4) yield
        // `+ 0.0` collapses IEEE -0.0 (DuckDB round() of a tiny negative)
        // to +0.0 so the driver's stringifying hash agrees with Spark.
        s"round(-(sum(${g(k)} * x$f) + ${db(k)} * $h * sum(x$f)) / " +
          s"($h * sum(x$f * x$f) + 0.1 * count(*)), 5) + 0.0 AS w${k}_x${f}"
      ).mkString(",\n        |  ")
      s"""WITH t AS (
        |  SELECT l_quantity AS x1, l_extendedprice AS x2, l_discount AS x3, l_tax AS x4,
        |         CAST(l_linenumber % 3 AS INT) AS y
        |  FROM lineitem
        |)
        |SELECT
        |  $cols
        |FROM t""".stripMargin
    }
  )
}
