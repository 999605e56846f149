package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{Binning, HistogramCuts}
import graft.model.{BoosterModel, Node, Tree}
import graft.objective.{CoxGradients, LambdaRankGradients, LambdaRankObjective, Objective}
import graft.predict.Predictor
import graft.tree.{BInst, GBTTrainer, TrainParams}

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
    // codegen ensemble walk, keyed on the exact margin (×10⁴ as integer);
    // pk_r1 re-scores through the PUBLIC iteration_range entry point
    // (Predictor.transform, rounds [0, 1) = tree 0 only — the sliced
    // model's margin, base score included), pinning model.slice + the
    // transform plumbing alongside the full-model walk
    "q_predict_walk" -> ((s, dir) => {
      val df = CoreQueries.table(s, dir, "lineitem").select(
        array(col("l_quantity").cast("double"), col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double")).as("features"))
      Predictor.transform(df, walkModel, "features", iterationRange = (0, 1))
        .withColumn("p", Predictor.predictCol(walkModel)(col("features")))
        .select(round(col("p") * 10000).cast("long").as("pk"),
          round(col("margin") * 10000).cast("long").as("pk_r1"))
        .groupBy("pk", "pk_r1").agg(count(lit(1)).as("n"))
        .orderBy("pk", "pk_r1")
    }),

    // DMatrix.get_quantile_cut parity: the trained histogram boundaries
    // in CSR layout — kind 0 rows carry the indptr, kind 1 rows the flat
    // cut values in (feature, bin) order; same sketch fixture as
    // q_sketch_cuts, so every value is exact
    "q_quantile_cut" -> ((s, dir) => {
      val rdd = CoreQueries.table(s, dir, "lineitem").select(
        col("l_quantity").cast("double"), col("l_linenumber").cast("double"))
        .rdd.map(r => (Array(r.getDouble(0), r.getDouble(1)), 1.0))
      val cuts = Binning.findCuts(rdd, 0, maxBin = 64)
      val (indptr, vals) = cuts.quantileCut
      import s.implicits._
      (indptr.zipWithIndex.map { case (v, i) => (0L, i.toLong, v.toDouble) } ++
        vals.zipWithIndex.map { case (v, j) => (1L, j.toLong, v) })
        .toSeq.toDF("kind", "idx", "v").orderBy("kind", "idx")
    }),

    // exact-method depth-1 split search: the chosen (feature, threshold,
    // leaf weights, child hessians) of a 1-round stump
    "q_stump_exact" -> ((s, dir) => {
      // label is a deterministic function of feature 0 plus bounded noise,
      // so a hugely-positive-gain split exists at EVERY scale factor (the
      // original floor(extendedprice/100) label admits NO positive-gain
      // split at sf0.1 — between-group signal drowns in within-group
      // variance — and a correct trainer must then grow a lone leaf)
      val df = CoreQueries.table(s, dir, "lineitem").select(
        col("l_quantity").cast("double"),
        col("l_linenumber").cast("double"),
        (col("l_quantity") * 2.0 + col("l_linenumber")).cast("double").as("y"))
      val rdd = df.rdd.map(r =>
        (Array(r.getDouble(0), r.getDouble(1)), r.getDouble(2), 1.0))
      val model = new GBTTrainer(TrainParams(numRounds = 1, maxDepth = 1,
        eta = 1.0, lambda = 1.0, treeMethod = "exact", baseScore = Some(0.0),
        seed = 7)).fit(rdd)
      val nodes = model.trees(0).nodes
      val root = nodes(0)
      import s.implicits._
      if (root.isLeaf) // no positive-gain split: surface the leaf, don't crash
        Seq((-1L, -1L, root.leaf(0), root.leaf(0), root.sumHess.toLong, 0L))
          .toDF("feature", "threshold", "left_leaf", "right_leaf", "n_left", "n_right")
      else {
        val (l, r) = (nodes(root.left), nodes(root.right))
        Seq((root.feature.toLong, root.threshold.toLong,
          l.leaf(0), r.leaf(0), l.sumHess.toLong, r.sumHess.toLong))
          .toDF("feature", "threshold", "left_leaf", "right_leaf", "n_left", "n_right")
      }
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
    }),

    // distributed weighted-quantile sketch → cut boundaries. Fixture
    // exactness: both features have far fewer distinct values (50 / 7)
    // than the sketch budget (512 for maxBin 64), so merge/prune never
    // approximates and every rank is an exact integer-valued double; the
    // query points tw·b/64 are exact too (64 is a power of two). The
    // oracle replays query(d) = min value with cumulative count ≥ d.
    "q_sketch_cuts" -> ((s, dir) => {
      val rdd = CoreQueries.table(s, dir, "lineitem").select(
        col("l_quantity").cast("double"), col("l_linenumber").cast("double"))
        .rdd.map(r => (Array(r.getDouble(0), r.getDouble(1)), 1.0))
      val cuts = Binning.findCuts(rdd, 0, maxBin = 64)
      import s.implicits._
      cuts.cuts.zipWithIndex.flatMap { case (c, f) =>
        c.zipWithIndex.map { case (v, b) => (f.toLong, b.toLong, v) }
      }.toSeq.toDF("feature", "bin", "cut").orderBy("feature", "bin")
    }),

    // survival:cox risk-set gradient kernel (CoxGradients: 3-pass
    // partition-prefix sweep with cross-partition tie stitching) vs a
    // window-cumsum oracle. Margin 0 ⇒ exp = 1 exactly, so risk sums are
    // exact integer-valued doubles and the only float chain is the ≤ ~50
    // sequential R/S accumulations — identical on both engines. The
    // distributed machinery under test (range sort, partition stitching,
    // Breslow tie groups, ownership) is fully exercised; the exp link is
    // covered by m_cox_nloglik.
    "q_cox_grad" -> ((s, dir) => {
      val rows = CoreQueries.table(s, dir, "lineitem").select(
        when(col("l_orderkey") % 4 === 0, -floor(col("l_quantity")))
          .otherwise(floor(col("l_quantity"))).cast("double").as("y"))
        .rdd.map(r => BInst(Array.emptyIntArray, r.getDouble(0), 1.0, 0L))
      // persisted like the trainer's cox path: the range sort's TIE order
      // is fetch-dependent, so re-evaluations could misalign the zip below
      val sorted = rows.sortBy(r => math.abs(r.label))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val gh = CoxGradients.compute(sorted.map(r => (r, Array(0.0))))
      import s.implicits._
      sorted.zip(gh).map { case (r, a) => (r.label.toLong, a(0), a(1)) }
        .toDF("y", "g", "h")
        .select(col("y"), round(col("g"), 6).as("g"), round(col("h"), 6).as("h"))
        .groupBy("y", "g", "h").agg(count(lit(1)).as("n"))
        .orderBy("y", "g", "h")
    }),

    // rank:ndcg λ-gradient kernel (LambdaRankGradients, pair_method=all)
    // vs a pairwise-join oracle: 4 bounded groups, strictly distinct
    // in-group scores (unique key mod a prime ≫ group stride) so both
    // engines derive the identical ranking, ΔNDCG and σ terms per pair.
    "q_rank_grad" -> ((s, dir) => {
      // DISTINCT: the synthetic lineitem repeats (orderkey, linenumber)
      // pairs, which would alias keys and tie the ranking scores
      val base = CoreQueries.table(s, dir, "lineitem")
        .where(col("l_orderkey") % 1000 < 4)
        .select((col("l_orderkey") % 1000).as("q"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("key"),
          ((col("l_orderkey") * 8 + col("l_linenumber")) % 9973 / lit(9973.0)).as("p"),
          (col("l_linenumber") % 4).cast("double").as("rel"))
        .distinct()
      // deterministic total order (q, key) ⇒ the two lineages below zip
      // consistently even if the shuffle is re-read
      val paired = base.rdd
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .partitionBy(new org.apache.spark.HashPartitioner(8))
        .mapPartitions(_.toArray.sortBy(t => (t._1, t._2._1)).iterator,
          preservesPartitioning = true)
        .map { case (q, (key, p, rel)) =>
          (BInst(Array.emptyIntArray, rel, 1.0, key, qid = q), p)
        }
      val gh = LambdaRankGradients.compute(
        paired.map { case (r, p) => (r, Array(p)) },
        new LambdaRankObjective("ndcg", pairMethod = "all",
          normalization = false, scoreNormalization = false))
      import s.implicits._
      paired.map(_._1.rowId).zip(gh).map { case (key, a) => (key, a(0), a(1)) }
        .toDF("key", "g", "h")
        .select(col("key"), (round(col("g"), 5) + lit(0.0)).as("g"),
          round(col("h"), 5).as("h"))
        .orderBy("key")
    }),

    // Position-debiased λ-kernel (Unbiased LambdaMART, `src/objective/
    // lambdarank_obj.h:93` LambdaGrad unbiased path): ONE gradient pass
    // with FIXED position-bias curves t⁺(i)=(1+i)^-1/2, t⁻(j)=(1+j)^-1/4
    // over the displayed (input) order — checks the 1/(t⁺·t⁻) pair
    // scaling and the 32-tracked-position guard against closed-form SQL.
    // The iterative t± re-fit is driver-side state covered by
    // UnbiasedLambdaRankSpec (it is not SQL-expressible).
    "q_rank_grad_unbiased" -> ((s, dir) => {
      val base = CoreQueries.table(s, dir, "lineitem")
        .where(col("l_orderkey") % 1000 < 4)
        .select((col("l_orderkey") % 1000).as("q"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("key"),
          ((col("l_orderkey") * 8 + col("l_linenumber")) % 9973 / lit(9973.0)).as("p"),
          (col("l_linenumber") % 4).cast("double").as("rel"))
        .distinct()
      val paired = base.rdd
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .partitionBy(new org.apache.spark.HashPartitioner(8))
        .mapPartitions(_.toArray.sortBy(t => (t._1, t._2._1)).iterator,
          preservesPartitioning = true)
        .map { case (q, (key, p, rel)) =>
          (BInst(Array.emptyIntArray, rel, 1.0, key, qid = q), p)
        }
      val tPlus = Array.tabulate(32)(i => math.pow(1.0 + i, -0.5))
      val tMinus = Array.tabulate(32)(i => math.pow(1.0 + i, -0.25))
      val gh = LambdaRankGradients.compute(
        paired.map { case (r, p) => (r, Array(p)) },
        new LambdaRankObjective("ndcg", pairMethod = "all", unbiased = true,
          normalization = false, scoreNormalization = false),
        Array.empty, tPlus, tMinus)
      import s.implicits._
      paired.map(_._1.rowId).zip(gh).map { case (key, a) => (key, a(0), a(1)) }
        .toDF("key", "g", "h")
        .select(col("key"), (round(col("g"), 5) + lit(0.0)).as("g"),
          round(col("h"), 5).as("h"))
        .orderBy("key")
    }),

    // Reference-DEFAULT λ-kernel (lambdarank_normalization +
    // lambdarank_score_normalization both true, `ranking_utils.h:81-82`):
    // Δ is divided by (|s_i−s_j| + 0.01) (the groups here always have
    // score spread), then each group's λ sums are rescaled by
    // log2(1+Σλ)/Σλ with Σλ = Σ_pairs 2·Δ·ρ (the non-mean branch of
    // `lambdarank_obj.cc:227-245`; pair_method=all is exact enumeration,
    // so it takes the same branch as topk). Hash-matched against the
    // closed form in SQL.
    "q_rank_grad_norm" -> ((s, dir) => {
      val base = CoreQueries.table(s, dir, "lineitem")
        .where(col("l_orderkey") % 1000 < 4)
        .select((col("l_orderkey") % 1000).as("q"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("key"),
          ((col("l_orderkey") * 8 + col("l_linenumber")) % 9973 / lit(9973.0)).as("p"),
          (col("l_linenumber") % 4).cast("double").as("rel"))
        .distinct()
      val paired = base.rdd
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .partitionBy(new org.apache.spark.HashPartitioner(8))
        .mapPartitions(_.toArray.sortBy(t => (t._1, t._2._1)).iterator,
          preservesPartitioning = true)
        .map { case (q, (key, p, rel)) =>
          (BInst(Array.emptyIntArray, rel, 1.0, key, qid = q), p)
        }
      val gh = LambdaRankGradients.compute(
        paired.map { case (r, p) => (r, Array(p)) },
        new LambdaRankObjective("ndcg", pairMethod = "all"))
      import s.implicits._
      paired.map(_._1.rowId).zip(gh).map { case (key, a) => (key, a(0), a(1)) }
        .toDF("key", "g", "h")
        .select(col("key"), (round(col("g"), 5) + lit(0.0)).as("g"),
          round(col("h"), 5).as("h"))
        .orderBy("key")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_predict_walk" ->
      """WITH t AS (
        |  SELECT
        |    (CASE WHEN l_quantity <= 25.0
        |        THEN (CASE WHEN l_discount <= 0.05 THEN 0.11 ELSE 0.27 END)
        |        ELSE (CASE WHEN l_extendedprice <= 30000.0 THEN 0.42 ELSE -0.13 END) END) AS t0,
        |    (CASE WHEN l_tax <= 0.04 THEN -0.05
        |        ELSE (CASE WHEN l_quantity <= 10.0 THEN 0.19 ELSE 0.33 END) END) AS t1
        |  FROM lineitem)
        |SELECT CAST(round((0.5 + t0 + t1) * 10000) AS BIGINT) AS pk,
        |  CAST(round((0.5 + t0) * 10000) AS BIGINT) AS pk_r1, count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // CSR layout over the same exact-cut construction as q_sketch_cuts:
    // indptr = per-feature bin-count prefix sums, flat values in
    // (feature, bin) order
    "q_quantile_cut" ->
      """WITH vals AS (
        |  SELECT 0 AS f, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 1, CAST(l_linenumber AS DOUBLE) FROM lineitem),
        |counts AS (SELECT f, v, CAST(count(*) AS DOUBLE) AS c FROM vals GROUP BY f, v),
        |cum AS (SELECT f, v, sum(c) OVER (PARTITION BY f ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax FROM counts),
        |tw AS (SELECT f, CAST(count(*) AS DOUBLE) AS t FROM vals GROUP BY f),
        |qpts AS (SELECT tw.f AS f, tw.t * r.b / 64 AS d FROM tw, range(1, 64) r(b)),
        |hits AS (SELECT q.f AS f, min(c.v) AS v FROM qpts q
        |  JOIN cum c ON c.f = q.f AND c.rmax >= q.d GROUP BY q.f, q.d),
        |allcuts AS (SELECT DISTINCT f, v FROM
        |  (SELECT * FROM hits UNION ALL SELECT f, max(v) FROM counts GROUP BY f)),
        |ordered AS (
        |  SELECT v, row_number() OVER (ORDER BY f, v) - 1 AS gidx FROM allcuts),
        |nbins AS (SELECT f, count(*) AS c FROM allcuts GROUP BY f)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS kind, CAST(0 AS BIGINT) AS idx,
        |    CAST(0 AS DOUBLE) AS v
        |  UNION ALL
        |  SELECT 0, CAST(f + 1 AS BIGINT),
        |    CAST(sum(c) OVER (ORDER BY f) AS DOUBLE) FROM nbins
        |  UNION ALL
        |  SELECT 1, CAST(gidx AS BIGINT), v FROM ordered
        |) ORDER BY kind, idx""".stripMargin,

    "q_stump_exact" ->
      """WITH t AS (
        |  SELECT l_quantity AS f0, CAST(l_linenumber AS DOUBLE) AS f1,
        |         l_quantity * 2.0 + l_linenumber AS y
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
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // query(d) = min value whose exact cumulative count ≥ d, for the 63
    // quantile points, deduplicated, plus the max value (cutsFromSummary)
    "q_sketch_cuts" ->
      """WITH vals AS (
        |  SELECT 0 AS f, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 1, CAST(l_linenumber AS DOUBLE) FROM lineitem),
        |counts AS (SELECT f, v, CAST(count(*) AS DOUBLE) AS c FROM vals GROUP BY f, v),
        |cum AS (SELECT f, v, sum(c) OVER (PARTITION BY f ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax FROM counts),
        |tw AS (SELECT f, CAST(count(*) AS DOUBLE) AS t FROM vals GROUP BY f),
        |qpts AS (SELECT tw.f AS f, tw.t * r.b / 64 AS d FROM tw, range(1, 64) r(b)),
        |hits AS (SELECT q.f AS f, min(c.v) AS v FROM qpts q
        |  JOIN cum c ON c.f = q.f AND c.rmax >= q.d GROUP BY q.f, q.d),
        |allcuts AS (SELECT DISTINCT f, v FROM
        |  (SELECT * FROM hits UNION ALL SELECT f, max(v) FROM counts GROUP BY f))
        |SELECT CAST(f AS BIGINT) AS feature,
        |  CAST(row_number() OVER (PARTITION BY f ORDER BY v) - 1 AS BIGINT) AS bin,
        |  v AS cut
        |FROM allcuts ORDER BY feature, bin""".stripMargin,

    // value-based Breslow risk sets at margin 0 (exp = 1): riskSum(v) =
    // #rows with |y| ≥ v; R/S are the ascending prefix sums of
    // nEvents/riskSum (and /riskSum²); g = R − 1{event}, h = R − S
    "q_cox_grad" ->
      """WITH s AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN -floor(l_quantity)
        |    ELSE floor(l_quantity) END AS y FROM lineitem),
        |byv AS (SELECT abs(y) AS v, CAST(count(*) AS DOUBLE) AS se,
        |  CAST(sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS ne FROM s GROUP BY 1),
        |c AS (SELECT v, ne, sum(se) OVER (ORDER BY v DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS risk FROM byv),
        |r AS (SELECT v,
        |  sum(ne / risk) OVER (ORDER BY v ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigr,
        |  sum(ne / (risk * risk)) OVER (ORDER BY v ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigs FROM c)
        |SELECT CAST(s.y AS BIGINT) AS y,
        |  round(bigr - CASE WHEN s.y > 0 THEN 1.0 ELSE 0.0 END, 6) AS g,
        |  round(greatest(bigr - bigs, 1e-16), 6) AS h,
        |  count(*) AS n
        |FROM s JOIN r ON abs(s.y) = r.v
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // all-pairs ΔNDCG·σ λ-gradients over 4 bounded groups; the join
    // mirrors contribute(): d = |Δgain·Δdisc|·(1/idcg), ρ = σ(−(p_i−p_j)),
    // per-pair hessian clamp, then per-row signed sums
    "q_rank_grad" ->
      """WITH rows_ AS (
        |  SELECT DISTINCT l_orderkey % 1000 AS q, l_orderkey * 8 + l_linenumber AS key,
        |    (l_orderkey * 8 + l_linenumber) % 9973 / 9973.0 AS p,
        |    CAST(l_linenumber % 4 AS DOUBLE) AS rel
        |  FROM lineitem WHERE l_orderkey % 1000 < 4),
        |ranked AS (SELECT q, key, p, rel,
        |  row_number() OVER (PARTITION BY q ORDER BY p DESC) AS rk FROM rows_),
        |idcg AS (SELECT q, 1.0 / sum((pow(2.0, rel) - 1.0) / (ln(irk + 1.0) / ln(2.0))) AS inv FROM (
        |  SELECT q, rel, row_number() OVER (PARTITION BY q ORDER BY rel DESC) AS irk
        |  FROM rows_) GROUP BY q),
        |pairs AS (
        |  SELECT a.q AS q, a.key AS ki, b.key AS kj,
        |    abs((pow(2.0, a.rel) - pow(2.0, b.rel)) *
        |        (1.0/(ln(a.rk + 1.0)/ln(2.0)) - 1.0/(ln(b.rk + 1.0)/ln(2.0)))) * i.inv AS d,
        |    1.0 / (1.0 + exp(a.p - b.p)) AS rho
        |  FROM ranked a JOIN ranked b ON a.q = b.q AND a.rel > b.rel
        |  JOIN idcg i ON i.q = a.q),
        |contrib AS (
        |  SELECT ki AS key, -d * rho AS cg,
        |    2.0 * d * greatest(rho * (1.0 - rho), 1e-16) AS chh FROM pairs
        |  UNION ALL
        |  SELECT kj, d * rho, 2.0 * d * greatest(rho * (1.0 - rho), 1e-16) FROM pairs)
        |SELECT r.key AS key,
        |  round(coalesce(sum(cg), 0.0), 5) + 0.0 AS g,
        |  round(greatest(coalesce(sum(chh), 0.0), 1e-16), 5) AS h
        |FROM rows_ r LEFT JOIN contrib c ON c.key = r.key
        |GROUP BY r.key ORDER BY r.key""".stripMargin,

    "q_rank_grad_unbiased" ->
      """WITH rows_ AS (
        |  SELECT DISTINCT l_orderkey % 1000 AS q, l_orderkey * 8 + l_linenumber AS key,
        |    (l_orderkey * 8 + l_linenumber) % 9973 / 9973.0 AS p,
        |    CAST(l_linenumber % 4 AS DOUBLE) AS rel
        |  FROM lineitem WHERE l_orderkey % 1000 < 4),
        |ranked AS (SELECT q, key, p, rel,
        |  row_number() OVER (PARTITION BY q ORDER BY p DESC) AS rk,
        |  row_number() OVER (PARTITION BY q ORDER BY key) - 1 AS pos FROM rows_),
        |idcg AS (SELECT q, 1.0 / sum((pow(2.0, rel) - 1.0) / (ln(irk + 1.0) / ln(2.0))) AS inv FROM (
        |  SELECT q, rel, row_number() OVER (PARTITION BY q ORDER BY rel DESC) AS irk
        |  FROM rows_) GROUP BY q),
        |pairs AS (
        |  SELECT a.q AS q, a.key AS ki, b.key AS kj,
        |    abs((pow(2.0, a.rel) - pow(2.0, b.rel)) *
        |        (1.0/(ln(a.rk + 1.0)/ln(2.0)) - 1.0/(ln(b.rk + 1.0)/ln(2.0)))) * i.inv AS d,
        |    1.0 / (1.0 + exp(a.p - b.p)) AS rho,
        |    CASE WHEN a.pos < 32 AND b.pos < 32
        |         THEN pow(1.0 + a.pos, 0.5) * pow(1.0 + b.pos, 0.25)
        |         ELSE 1.0 END AS scale
        |  FROM ranked a JOIN ranked b ON a.q = b.q AND a.rel > b.rel
        |  JOIN idcg i ON i.q = a.q),
        |contrib AS (
        |  SELECT ki AS key, -d * rho * scale AS cg,
        |    2.0 * d * greatest(rho * (1.0 - rho), 1e-16) * scale AS chh FROM pairs
        |  UNION ALL
        |  SELECT kj, d * rho * scale, 2.0 * d * greatest(rho * (1.0 - rho), 1e-16) * scale FROM pairs)
        |SELECT r.key AS key,
        |  round(coalesce(sum(cg), 0.0), 5) + 0.0 AS g,
        |  round(greatest(coalesce(sum(chh), 0.0), 1e-16), 5) AS h
        |FROM rows_ r LEFT JOIN contrib c ON c.key = r.key
        |GROUP BY r.key ORDER BY r.key""".stripMargin,

    // reference defaults: Δ /= (|Δscore| + 0.01) when the group has score
    // spread; per-group λ rescale by log2(1+Σλ)/Σλ, Σλ = Σ 2·Δ·ρ
    "q_rank_grad_norm" ->
      """WITH rows_ AS (
        |  SELECT DISTINCT l_orderkey % 1000 AS q, l_orderkey * 8 + l_linenumber AS key,
        |    (l_orderkey * 8 + l_linenumber) % 9973 / 9973.0 AS p,
        |    CAST(l_linenumber % 4 AS DOUBLE) AS rel
        |  FROM lineitem WHERE l_orderkey % 1000 < 4),
        |gs AS (SELECT q, max(p) AS mx, min(p) AS mn FROM rows_ GROUP BY q),
        |ranked AS (SELECT q, key, p, rel,
        |  row_number() OVER (PARTITION BY q ORDER BY p DESC) AS rk FROM rows_),
        |idcg AS (SELECT q, 1.0 / sum((pow(2.0, rel) - 1.0) / (ln(irk + 1.0) / ln(2.0))) AS inv FROM (
        |  SELECT q, rel, row_number() OVER (PARTITION BY q ORDER BY rel DESC) AS irk
        |  FROM rows_) GROUP BY q),
        |pairs AS (
        |  SELECT a.q AS q, a.key AS ki, b.key AS kj,
        |    abs((pow(2.0, a.rel) - pow(2.0, b.rel)) *
        |        (1.0/(ln(a.rk + 1.0)/ln(2.0)) - 1.0/(ln(b.rk + 1.0)/ln(2.0)))) * i.inv
        |      / (CASE WHEN g.mx <> g.mn THEN abs(a.p - b.p) + 0.01 ELSE 1.0 END) AS d,
        |    1.0 / (1.0 + exp(a.p - b.p)) AS rho
        |  FROM ranked a JOIN ranked b ON a.q = b.q AND a.rel > b.rel
        |  JOIN idcg i ON i.q = a.q JOIN gs g ON g.q = a.q),
        |nrm AS (SELECT q,
        |  CASE WHEN sum(2.0 * d * rho) > 0
        |       THEN ln(1.0 + sum(2.0 * d * rho)) / ln(2.0) / sum(2.0 * d * rho)
        |       ELSE 1.0 END AS nm
        |  FROM pairs WHERE d > 0 GROUP BY q),
        |contrib AS (
        |  SELECT p.q, ki AS key, -d * rho * nm AS cg,
        |    2.0 * d * greatest(rho * (1.0 - rho), 1e-16) * nm AS chh
        |  FROM pairs p JOIN nrm n ON n.q = p.q
        |  UNION ALL
        |  SELECT p.q, kj, d * rho * nm, 2.0 * d * greatest(rho * (1.0 - rho), 1e-16) * nm
        |  FROM pairs p JOIN nrm n ON n.q = p.q)
        |SELECT r.key AS key,
        |  round(coalesce(sum(cg), 0.0), 5) + 0.0 AS g,
        |  round(greatest(coalesce(sum(chh), 0.0), 1e-16), 5) AS h
        |FROM rows_ r LEFT JOIN contrib c ON c.key = r.key
        |GROUP BY r.key ORDER BY r.key""".stripMargin
  )
}
