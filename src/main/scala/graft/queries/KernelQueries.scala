package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.HistogramCuts
import graft.model.{BoosterModel, Node, Tree}
import graft.objective.Objective
import graft.predict.Predictor
import graft.tree.{GBTTrainer, TrainParams}

/** Oracle-verified TRAINING-KERNEL queries — each converts a trainer
  * internal from "test-only" evidence to a DuckDB hash-match row by picking
  * fixtures where the kernel's float arithmetic is bit-exact on both sides:
  *
  *  - `q_predict_walk`: the codegen tree-walk prediction expression
  *    ([[graft.predict.TreePredict]]) vs a static nested-CASE oracle. Leaf
  *    accumulation order (base, then tree 0, then tree 1, unit weights) is
  *    mirrored left-to-right in the SQL, so the margin is the identical
  *    double on both sides (ref walk: `src/predictor/cpu_predictor.cc:175`).
  *  - `q_stump_exact`: the exact-method greedy split search
  *    ([[graft.tree.SplitEnumerator]] over distinct-value cuts,
  *    ref `src/tree/updater_colmaker.cc` enumeration + `param.h:252-292`
  *    weight/gain) vs a window-cumsum argmax. base_score=0 makes every
  *    gradient the negated integer-valued label, so GL/HL prefix sums are
  *    exact integers and the leaf weights −G/(H+λ) are single IEEE
  *    divisions — bit-identical in DuckDB.
  *  - `q_grad_hist`: the gradient-histogram kernel (searchBin → (Σg, Σh, n)
  *    per bin, ref `src/tree/hist/histogram.h` build + allreduce) at margin
  *    0 for binary:logistic, where g ∈ {±0.5} and h = 0.25 exactly — sums
  *    are order-independent, so the treeAggregate result hash-matches a
  *    plain GROUP BY.
  */
object KernelQueries {

  /** Fixed 2-tree depth-2 ensemble over (l_quantity, l_extendedprice,
    * l_discount, l_tax); thresholds sit on the columns' natural values so
    * every branch gets traffic at sf0.01. */
  private def walkModel: BoosterModel = {
    def leaf(v: Double) = Node(feature = -1, threshold = 0.0, defaultLeft = true,
      left = -1, right = -1, leaf = Array(v), gain = 0.0, sumHess = 1.0,
      categoriesRight = Array.empty)
    def split(f: Int, thr: Double, l: Int, r: Int) = Node(feature = f,
      threshold = thr, defaultLeft = true, left = l, right = r,
      leaf = Array.empty, gain = 0.0, sumHess = 1.0, categoriesRight = Array.empty)
    val t0 = Tree(Array(
      split(0, 25.0, 1, 2),
      split(2, 0.05, 3, 4), split(1, 30000.0, 5, 6),
      leaf(0.11), leaf(0.27), leaf(0.42), leaf(-0.13)))
    val t1 = Tree(Array(
      split(3, 0.04, 1, 2),
      leaf(-0.05), split(0, 10.0, 3, 4),
      leaf(0.19), leaf(0.33)))
    BoosterModel(Array(t0, t1), Array(1.0, 1.0), Array(0, 0), Array(0.5),
      "reg:squarederror", 1, 4)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // codegen ensemble walk, keyed on the exact margin (×10⁴ as integer)
    "q_predict_walk" -> ((s, dir) => {
      val df = CoreQueries.table(s, dir, "lineitem").select(
        array(col("l_quantity").cast("double"), col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double")).as("features"))
      df.select(Predictor.predictCol(walkModel)(col("features")).as("p"))
        .select(round(col("p") * 10000).cast("long").as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("n"))
        .orderBy("pk")
    }),

    // exact-method depth-1 split search: the chosen (feature, threshold,
    // leaf weights, child hessians) of a 1-round stump
    "q_stump_exact" -> ((s, dir) => {
      val df = CoreQueries.table(s, dir, "lineitem").select(
        col("l_quantity").cast("double"),
        col("l_linenumber").cast("double"),
        floor(col("l_extendedprice") / 100.0).cast("double").as("y"))
      val rdd = df.rdd.map(r =>
        (Array(r.getDouble(0), r.getDouble(1)), r.getDouble(2), 1.0))
      val model = new GBTTrainer(TrainParams(numRounds = 1, maxDepth = 1,
        eta = 1.0, lambda = 1.0, treeMethod = "exact", baseScore = Some(0.0),
        seed = 7)).fit(rdd)
      val nodes = model.trees(0).nodes
      val root = nodes(0)
      val (l, r) = (nodes(root.left), nodes(root.right))
      import s.implicits._
      Seq((root.feature.toLong, root.threshold.toLong,
        l.leaf(0), r.leaf(0), l.sumHess.toLong, r.sumHess.toLong))
        .toDF("feature", "threshold", "left_leaf", "right_leaf", "n_left", "n_right")
    }),

    // gradient histogram: one interleaved-array treeAggregate over
    // searchBin + the logistic gradient kernel (the training hist shape)
    "q_grad_hist" -> ((s, dir) => {
      val cuts = HistogramCuts(Array(Array.tabulate(50)(i => (i + 1).toDouble)))
      val obj = Objective("binary:logistic")
      val rdd = CoreQueries.table(s, dir, "lineitem").select(
        col("l_quantity").cast("double"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
        .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
      val hist = rdd.treeAggregate(new Array[Double](3 * 50))(
        (acc, row) => {
          val b = cuts.searchBin(0, row._1)
          val out = new Array[Double](2)
          obj.gradient(0.0, row._2, out)
          acc(3 * b) += out(0); acc(3 * b + 1) += out(1); acc(3 * b + 2) += 1.0
          acc
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
      import s.implicits._
      (0 until 50).map(b => (b.toLong, hist(3 * b), hist(3 * b + 1),
        hist(3 * b + 2).toLong))
        .toDF("bin", "sum_g", "sum_h", "n").orderBy("bin")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_predict_walk" ->
      """WITH p AS (
        |  SELECT 0.5
        |    + (CASE WHEN l_quantity <= 25.0
        |        THEN (CASE WHEN l_discount <= 0.05 THEN 0.11 ELSE 0.27 END)
        |        ELSE (CASE WHEN l_extendedprice <= 30000.0 THEN 0.42 ELSE -0.13 END) END)
        |    + (CASE WHEN l_tax <= 0.04 THEN -0.05
        |        ELSE (CASE WHEN l_quantity <= 10.0 THEN 0.19 ELSE 0.33 END) END) AS pred
        |  FROM lineitem)
        |SELECT CAST(round(pred * 10000) AS BIGINT) AS pk, count(*) AS n
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stump_exact" ->
      """WITH t AS (
        |  SELECT l_quantity AS f0, CAST(l_linenumber AS DOUBLE) AS f1,
        |         floor(l_extendedprice / 100.0) AS y
        |  FROM lineitem
        |), tot AS (SELECT sum(y) AS sy, count(*) AS n FROM t),
        |c0 AS (SELECT 0 AS f, f0 AS v, sum(y) AS vy, count(*) AS vn FROM t GROUP BY f0),
        |c1 AS (SELECT 1 AS f, f1 AS v, sum(y) AS vy, count(*) AS vn FROM t GROUP BY f1),
        |cand AS (
        |  SELECT f, v,
        |    sum(vy) OVER (PARTITION BY f ORDER BY v) AS cy,
        |    sum(vn) OVER (PARTITION BY f ORDER BY v) AS cn,
        |    max(v) OVER (PARTITION BY f) AS vmax
        |  FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1)
        |), scored AS (
        |  SELECT f, v, cy, CAST(cn AS DOUBLE) AS cn, sy, n,
        |    cy*cy/(cn+1.0) + (sy-cy)*(sy-cy)/(n-cn+1.0) - sy*sy/(n+1.0) AS gain
        |  FROM cand, tot WHERE v < vmax
        |)
        |SELECT CAST(f AS BIGINT) AS feature, CAST(v AS BIGINT) AS threshold,
        |  cy/(cn+1.0) AS left_leaf, (sy-cy)/(CAST(n AS DOUBLE)-cn+1.0) AS right_leaf,
        |  CAST(cn AS BIGINT) AS n_left, CAST(CAST(n AS DOUBLE)-cn AS BIGINT) AS n_right
        |FROM scored ORDER BY gain DESC, f, v LIMIT 1""".stripMargin,

    "q_grad_hist" ->
      """SELECT CAST(l_quantity AS BIGINT) - 1 AS bin,
        |  0.5 * count(*) - sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS sum_g,
        |  0.25 * count(*) AS sum_h,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
