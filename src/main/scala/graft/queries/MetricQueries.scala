package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.metric.Metrics

/** Oracle-wired queries for the ranking / multiclass / survival / AUC metric
  * surface (`src/metric/rank_metric.cc`, `multiclass_metric.cu`, `auc.cc`,
  * `survival_metric.cu` — SURVEY §2.4/§2.5). Each query evaluates the SAME
  * deterministic fixture in Spark (via [[graft.metric.Metrics]]) and in the
  * DuckDB oracle SQL, with identical rounding and a portable md5-derived
  * tiebreaker so window orders can never diverge between engines.
  *
  * Fixture (`ranked` over lineitem): qid = orderkey%100 (~100 bounded
  * groups), near-continuous score from extendedprice, graded relevance from
  * linenumber, weights 1+tax. Survival fixtures derive censoring from
  * orderkey residues. All double→integer derivations go through floor()
  * explicitly — DuckDB CAST(double AS INT) rounds while Spark truncates.
  */
object MetricQueries {

  import CoreQueries.table

  /** No repartition before the projection: a spread was tried (the sf
    * parquet is one row group → one scan task) and measured net-negative —
    * the extra 600k-row shuffle cost more than the map-side md5/projection
    * work it parallelized, and for the cumsum metrics it broke exchange
    * reuse. At real scale the scan arrives in many splits anyway. */
  private def ranked(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem").select(
      (col("l_orderkey") % 100).as("q"),
      ((floor(col("l_extendedprice") * 100).cast("long") % 1000) / lit(1000.0)).as("p"),
      (col("l_linenumber") % 4).as("rel"),
      TextOps.hash60(concat_ws("_", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        floor(col("l_extendedprice") * 100).cast("long").cast("string"))).as("t"),
      when(col("l_linenumber") % 4 >= 2, 1.0).otherwise(0.0).as("yb"),
      (lit(1.0) + col("l_tax")).as("w"))

  private val rankedSql =
    """SELECT l_orderkey % 100 AS q,
      |  CAST(floor(l_extendedprice * 100) AS BIGINT) % 1000 / 1000.0 AS p,
      |  l_linenumber % 4 AS rel,
      |  CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), '_',
      |    CAST(l_linenumber AS VARCHAR), '_',
      |    CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS VARCHAR))), 1, 15)) AS BIGINT) AS t,
      |  CASE WHEN l_linenumber % 4 >= 2 THEN 1.0 ELSE 0.0 END AS yb,
      |  1.0 + l_tax AS w
      |FROM lineitem""".stripMargin

  /** Multiclass fixture: 3-class label and a deterministic predicted class /
    * probability vector derived from quantity (integer-valued double). */
  private def multi(s: SparkSession, dir: String): DataFrame = {
    val qi = floor(col("l_quantity")).cast("int")
    table(s, dir, "lineitem").select(
      (col("l_linenumber") % 3).cast("double").as("y3"),
      ((qi * 2 + col("l_linenumber")) % 3).cast("double").as("pc"),
      array((0 until 3).map(k =>
        (lit(1.0) + ((qi * (k + 2)) % 7).cast("double")) / 10.0): _*).as("probs"),
      (lit(1.0) + col("l_tax")).as("w"))
  }

  private val multiSql =
    """SELECT CAST(l_linenumber % 3 AS DOUBLE) AS y3,
      |  CAST((CAST(floor(l_quantity) AS INT) * 2 + l_linenumber) % 3 AS DOUBLE) AS pc,
      |  [(1.0 + CAST((CAST(floor(l_quantity) AS INT) * 2) % 7 AS DOUBLE)) / 10.0,
      |   (1.0 + CAST((CAST(floor(l_quantity) AS INT) * 3) % 7 AS DOUBLE)) / 10.0,
      |   (1.0 + CAST((CAST(floor(l_quantity) AS INT) * 4) % 7 AS DOUBLE)) / 10.0] AS probs,
      |  1.0 + l_tax AS w
      |FROM lineitem""".stripMargin

  /** Survival fixture: event time from quantity (heavily tied — exercises
    * Breslow tie handling), censoring from orderkey residues. */
  private def surv(s: SparkSession, dir: String): DataFrame = {
    val t = floor(col("l_quantity"))
    table(s, dir, "lineitem").select(
      when(col("l_orderkey") % 4 === 0, -t).otherwise(t).as("y"),
      ((floor(col("l_extendedprice") * 100).cast("long") % 200) / lit(100.0) - 1.0).as("cp"),
      col("l_quantity").as("lo"),
      when(col("l_orderkey") % 3 === 0, col("l_quantity"))
        .when(col("l_orderkey") % 3 === 1, col("l_quantity") * 2.0)
        .otherwise(lit(null).cast("double")).as("hi"),
      (log(col("l_quantity")) + col("l_discount") - 0.05).as("ap"))
  }

  private val survSql =
    """SELECT CASE WHEN l_orderkey % 4 = 0 THEN -floor(l_quantity) ELSE floor(l_quantity) END AS y,
      |  CAST(floor(l_extendedprice * 100) AS BIGINT) % 200 / 100.0 - 1.0 AS cp,
      |  l_quantity AS lo,
      |  CASE WHEN l_orderkey % 3 = 0 THEN l_quantity
      |       WHEN l_orderkey % 3 = 1 THEN l_quantity * 2.0
      |       ELSE NULL END AS hi,
      |  ln(l_quantity) + l_discount - 0.05 AS ap
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- AUC (auc.cc:153 binary trapezoid; :165 per-group ranking) ----
    "m_auc" -> ((s, dir) =>
      Metrics.aucBinary(ranked(s, dir), col("p"), col("yb"), col("w"))
        .select(round(col("auc"), 6).as("auc"))),

    "m_aucpr" -> ((s, dir) =>
      Metrics.aucPR(ranked(s, dir), col("p"), col("yb"), col("w"))
        .select(round(col("aucpr"), 6).as("aucpr"))),

    "m_auc_rank" -> ((s, dir) =>
      Metrics.aucRanking(ranked(s, dir), col("q"), col("p"), col("yb"))
        .select(round(col("auc"), 6).as("auc"), col("num_groups"))),

    // AMS (rank_metric.cc:48; ratio>=1 = max over candidate thresholds)
    "m_ams" -> ((s, dir) =>
      Metrics.amsAt(ranked(s, dir), col("p"), col("yb"), col("w"), ratio = 1.0)
        .select(round(col("ams"), 6).as("ams"))),

    // ---- ranking (rank_metric.cc:461-469) ----
    "m_ndcg" -> ((s, dir) =>
      Metrics.ndcgAt(ranked(s, dir), col("q"), col("p"), col("rel"), col("t"), k = 5)
        .select(round(col("ndcg"), 6).as("ndcg"), col("num_groups"))),

    "m_map" -> ((s, dir) =>
      Metrics.mapAt(ranked(s, dir), col("q"), col("p"), col("yb"), col("t"), k = 5)
        .select(round(col("map"), 6).as("map"), col("num_groups"))),

    "m_prec" -> ((s, dir) =>
      Metrics.precisionAt(ranked(s, dir), col("q"), col("p"), col("yb"), col("t"), k = 5)
        .select(round(col("precision"), 6).as("precision"), col("num_groups"))),

    // ---- multiclass (multiclass_metric.cu:222,226) ----
    "m_merror" -> ((s, dir) => multi(s, dir)
      .agg(round(Metrics.merror(col("pc"), col("y3"), col("w")), 6).as("merror"))),

    "m_mlogloss" -> ((s, dir) => multi(s, dir)
      .agg(round(Metrics.mlogloss(col("probs"), col("y3"), col("w")), 6).as("mlogloss"))),

    // one-vs-rest multiclass AUC (auc.cc:83 MultiAUC, prevalence-weighted)
    "m_auc_multi" -> ((s, dir) =>
      Metrics.aucMulticlass(multi(s, dir), col("probs"), col("y3"), col("w"))
        .select(round(col("auc"), 6).as("auc_multi"))),

    // ---- survival (rank_metric.cc:204, survival_metric.cu:250,254) ----
    "m_cox_nloglik" -> ((s, dir) =>
      Metrics.coxNloglik(surv(s, dir), col("cp"), col("y"))
        .select(round(col("cox_nloglik"), 6).as("cox_nloglik"))),

    "m_aft_nloglik" -> ((s, dir) =>
      Metrics.aftNloglikLogistic(surv(s, dir), col("ap"), col("lo"), col("hi"), sigma = 1.0)
        .select(round(col("aft_nloglik"), 6).as("aft_nloglik"))),

    // the reference's DEFAULT aft_loss_distribution is normal
    // (survival_util.h AFTParam); erf via the A&S 7.1.26 closed form on
    // both engines
    "m_aft_nloglik_normal" -> ((s, dir) =>
      Metrics.aftNloglik(surv(s, dir), col("ap"), col("lo"), col("hi"),
        sigma = 1.0, dist = "normal")
        .select(round(col("aft_nloglik"), 6).as("aft_nloglik_normal"))),

    "m_aft_nloglik_extreme" -> ((s, dir) =>
      Metrics.aftNloglik(surv(s, dir), col("ap"), col("lo"), col("hi"),
        sigma = 1.0, dist = "extreme")
        .select(round(col("aft_nloglik"), 6).as("aft_nloglik_extreme"))),

    "m_interval_acc" -> ((s, dir) =>
      Metrics.intervalAccuracy(surv(s, dir), col("ap"), col("lo"), col("hi"))
        .select(round(col("interval_accuracy"), 6).as("interval_accuracy")))
  )

  val oracle: Map[String, String] = Map(
    "m_auc" ->
      s"""WITH g AS (
         |  SELECT p, sum(CASE WHEN yb > 0.5 THEN w ELSE 0.0 END) AS tp,
         |    sum(CASE WHEN yb > 0.5 THEN 0.0 ELSE w END) AS fp
         |  FROM ($rankedSql) GROUP BY 1
         |), c AS (
         |  SELECT p, tp, fp,
         |    sum(tp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(fp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp
         |  FROM g
         |)
         |SELECT round(sum(fp * (2.0 * ctp - tp) / 2.0) / (max(ctp) * max(cfp)), 6) AS auc
         |FROM c""".stripMargin,

    "m_aucpr" ->
      s"""WITH g AS (
         |  SELECT p, sum(CASE WHEN yb > 0.5 THEN w ELSE 0.0 END) AS tp,
         |    sum(CASE WHEN yb > 0.5 THEN 0.0 ELSE w END) AS fp
         |  FROM ($rankedSql) GROUP BY 1
         |), c AS (
         |  SELECT p, tp, fp,
         |    sum(tp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(fp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp
         |  FROM g
         |)
         |SELECT round(sum(tp * ((ctp / (ctp + cfp)) +
         |    (CASE WHEN (ctp - tp) + (cfp - fp) > 0
         |          THEN (ctp - tp) / ((ctp - tp) + (cfp - fp)) ELSE 1.0 END)) / 2.0)
         |  / max(ctp), 6) AS aucpr
         |FROM c""".stripMargin,

    "m_auc_rank" ->
      s"""WITH g AS (
         |  SELECT q, p, sum(CASE WHEN yb > 0.5 THEN 1.0 ELSE 0.0 END) AS tp,
         |    sum(CASE WHEN yb > 0.5 THEN 0.0 ELSE 1.0 END) AS fp
         |  FROM ($rankedSql) GROUP BY 1, 2
         |), c AS (
         |  SELECT q, tp, fp,
         |    sum(tp) OVER (PARTITION BY q ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(fp) OVER (PARTITION BY q ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp
         |  FROM g
         |), perq AS (
         |  SELECT q,
         |    CASE WHEN max(ctp) > 0 AND max(cfp) > 0
         |      THEN sum(fp * (2.0 * ctp - tp) / 2.0) / (max(ctp) * max(cfp))
         |      ELSE NULL END AS auc
         |  FROM c GROUP BY q
         |)
         |SELECT round(avg(auc), 6) AS auc, count(*) AS num_groups
         |FROM perq WHERE auc IS NOT NULL""".stripMargin,

    "m_ams" ->
      s"""WITH g AS (
         |  SELECT p, sum(CASE WHEN yb > 0.5 THEN w ELSE 0.0 END) AS tp,
         |    sum(CASE WHEN yb > 0.5 THEN 0.0 ELSE w END) AS fp,
         |    count(*) AS cnt
         |  FROM ($rankedSql) GROUP BY 1
         |), c AS (
         |  SELECT p, tp, fp,
         |    sum(tp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(fp) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp,
         |    sum(cnt) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccnt
         |  FROM g
         |), tot AS (SELECT sum(cnt) AS n FROM g)
         |SELECT round(max(sqrt(2.0 * ((ctp + cfp + 10.0) * ln(1.0 + ctp / (cfp + 10.0)) - ctp))), 6) AS ams
         |FROM c, tot WHERE ccnt < n""".stripMargin,

    "m_ndcg" ->
      s"""WITH r AS (
         |  SELECT q, rel,
         |    row_number() OVER (PARTITION BY q ORDER BY p DESC, t ASC) AS rk,
         |    row_number() OVER (PARTITION BY q ORDER BY rel DESC, t ASC) AS irk
         |  FROM ($rankedSql)
         |), dcg AS (
         |  SELECT q, sum((pow(2.0, rel) - 1.0) / log2(rk + 1.0)) AS dcg
         |  FROM r WHERE rk <= 5 GROUP BY q
         |), idcg AS (
         |  SELECT q, sum((pow(2.0, rel) - 1.0) / log2(irk + 1.0)) AS idcg
         |  FROM r WHERE irk <= 5 GROUP BY q
         |)
         |SELECT round(avg(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END), 6) AS ndcg,
         |  count(*) AS num_groups
         |FROM dcg JOIN idcg USING (q)""".stripMargin,

    "m_map" ->
      s"""WITH r AS (
         |  SELECT q,
         |    CASE WHEN yb > 0 THEN 1.0 ELSE 0.0 END AS rel,
         |    row_number() OVER (PARTITION BY q ORDER BY p DESC, t ASC) AS rk,
         |    sum(CASE WHEN yb > 0 THEN 1.0 ELSE 0.0 END)
         |      OVER (PARTITION BY q ORDER BY p DESC, t ASC
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel
         |  FROM ($rankedSql)
         |), perq AS (
         |  SELECT q, sum(rel * cumrel / rk) AS apnum, sum(rel) AS nrel
         |  FROM r WHERE rk <= 5 GROUP BY q
         |)
         |SELECT round(avg(CASE WHEN nrel > 0 THEN apnum / nrel ELSE 0.0 END), 6) AS map,
         |  count(*) AS num_groups
         |FROM perq""".stripMargin,

    "m_prec" ->
      s"""WITH r AS (
         |  SELECT q, yb,
         |    row_number() OVER (PARTITION BY q ORDER BY p DESC, t ASC) AS rk
         |  FROM ($rankedSql)
         |), perq AS (
         |  SELECT q, sum(CASE WHEN yb > 0 AND rk <= 5 THEN 1.0 ELSE 0.0 END)
         |    / least(5, count(*)) AS prec
         |  FROM r GROUP BY q
         |)
         |SELECT round(avg(prec), 6) AS precision, count(*) AS num_groups
         |FROM perq""".stripMargin,

    "m_merror" ->
      s"""SELECT round(sum(w * CASE WHEN pc <> y3 THEN 1.0 ELSE 0.0 END) / sum(w), 6) AS merror
         |FROM ($multiSql)""".stripMargin,

    "m_mlogloss" ->
      s"""SELECT round(sum(w * -ln(greatest(probs[CAST(y3 AS INT) + 1], 1e-16))) / sum(w), 6) AS mlogloss
         |FROM ($multiSql)""".stripMargin,

    "m_auc_multi" ->
      s"""WITH x AS (
         |  SELECT y3 AS y, w, classes.c AS c, probs[classes.c + 1] AS p
         |  FROM ($multiSql) f, (VALUES (0), (1), (2)) AS classes(c)
         |), g AS (
         |  SELECT c, p,
         |    sum(CASE WHEN y = CAST(c AS DOUBLE) THEN w ELSE 0.0 END) AS tp,
         |    sum(CASE WHEN y = CAST(c AS DOUBLE) THEN 0.0 ELSE w END) AS fp
         |  FROM x GROUP BY 1, 2
         |), cum AS (
         |  SELECT c, tp, fp,
         |    sum(tp) OVER (PARTITION BY c ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(fp) OVER (PARTITION BY c ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp
         |  FROM g
         |), perc AS (
         |  SELECT c, sum(fp * (2.0 * ctp - tp) / 2.0) AS area,
         |    max(ctp) AS ttp, max(cfp) AS tfp
         |  FROM cum GROUP BY c
         |)
         |SELECT round(sum(area / (ttp * tfp) * ttp) / sum(ttp), 6) AS auc_multi
         |FROM perc""".stripMargin,

    "m_cox_nloglik" ->
      s"""WITH byv AS (
         |  SELECT abs(y) AS av, sum(exp(cp)) AS se,
         |    sum(CASE WHEN y > 0 THEN cp ELSE 0.0 END) AS sp,
         |    sum(CASE WHEN y > 0 THEN 1.0 ELSE 0.0 END) AS ne
         |  FROM ($survSql) GROUP BY 1
         |), c AS (
         |  SELECT av, sp, ne,
         |    sum(se) OVER (ORDER BY av DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS risk
         |  FROM byv
         |)
         |SELECT round(-sum(sp - ne * ln(risk)) / sum(ne), 6) AS cox_nloglik
         |FROM c""".stripMargin,

    "m_aft_nloglik" ->
      s"""WITH f AS (SELECT * FROM ($survSql)),
         |l AS (
         |  SELECT CASE
         |    WHEN hi IS NOT NULL AND lo = hi THEN
         |      (exp(-(ln(lo) - ap) / 1.0) / pow(1.0 + exp(-(ln(lo) - ap) / 1.0), 2)) / (1.0 * lo)
         |    WHEN hi IS NULL THEN
         |      1.0 - 1.0 / (1.0 + exp(-(ln(lo) - ap) / 1.0))
         |    ELSE
         |      1.0 / (1.0 + exp(-(ln(hi) - ap) / 1.0)) - 1.0 / (1.0 + exp(-(ln(lo) - ap) / 1.0))
         |  END AS lk
         |  FROM f
         |)
         |SELECT round(avg(-ln(greatest(lk, 1e-12))), 6) AS aft_nloglik FROM l""".stripMargin,

    // normal error distribution: erf emitted as the SAME A&S 7.1.26
    // polynomial the Spark side evaluates (Metrics.erfCol), so both
    // engines compute bit-comparable likelihoods
    "m_aft_nloglik_normal" ->
      s"""WITH f AS (SELECT * FROM ($survSql)),
         |z AS (SELECT lo, hi, (ln(lo) - ap) / 1.0 AS zl,
         |  CASE WHEN hi IS NULL THEN NULL ELSE (ln(hi) - ap) / 1.0 END AS zu FROM f),
         |u AS (SELECT lo, hi, zl, zu, zl / sqrt(2.0) AS ul, zu / sqrt(2.0) AS uu FROM z),
         |t1 AS (SELECT lo, hi, zl, ul, uu,
         |  abs(ul) AS al, 1.0 / (1.0 + 0.3275911 * abs(ul)) AS tl,
         |  abs(uu) AS au, 1.0 / (1.0 + 0.3275911 * abs(uu)) AS tu FROM u),
         |er AS (SELECT lo, hi, zl,
         |  (CASE WHEN ul < 0 THEN -1.0 ELSE 1.0 END) *
         |    (1.0 - (((((1.061405429 * tl - 1.453152027) * tl) + 1.421413741) * tl
         |      - 0.284496736) * tl + 0.254829592) * tl * exp(-al * al)) AS erfl,
         |  (CASE WHEN uu < 0 THEN -1.0 ELSE 1.0 END) *
         |    (1.0 - (((((1.061405429 * tu - 1.453152027) * tu) + 1.421413741) * tu
         |      - 0.284496736) * tu + 0.254829592) * tu * exp(-au * au)) AS erfu
         |  FROM t1),
         |l AS (SELECT CASE
         |    WHEN hi IS NOT NULL AND lo = hi THEN
         |      exp(-zl * zl / 2) / sqrt(2.0 * pi()) / (1.0 * lo)
         |    WHEN hi IS NULL THEN 1.0 - 0.5 * (1.0 + erfl)
         |    ELSE 0.5 * (1.0 + erfu) - 0.5 * (1.0 + erfl)
         |  END AS lk FROM er)
         |SELECT round(avg(-ln(greatest(lk, 1e-12))), 6) AS aft_nloglik_normal FROM l""".stripMargin,

    "m_aft_nloglik_extreme" ->
      s"""WITH f AS (SELECT * FROM ($survSql)),
         |z AS (SELECT lo, hi, (ln(lo) - ap) / 1.0 AS zl,
         |  CASE WHEN hi IS NULL THEN NULL ELSE (ln(hi) - ap) / 1.0 END AS zu FROM f),
         |l AS (SELECT CASE
         |    WHEN hi IS NOT NULL AND lo = hi THEN
         |      exp(zl) * exp(-exp(zl)) / (1.0 * lo)
         |    WHEN hi IS NULL THEN 1.0 - (1.0 - exp(-exp(zl)))
         |    ELSE (1.0 - exp(-exp(zu))) - (1.0 - exp(-exp(zl)))
         |  END AS lk FROM z)
         |SELECT round(avg(-ln(greatest(lk, 1e-12))), 6) AS aft_nloglik_extreme FROM l""".stripMargin,

    "m_interval_acc" ->
      s"""SELECT round(avg(CASE WHEN ap >= ln(lo) AND (hi IS NULL OR ap <= ln(hi))
         |  THEN 1.0 ELSE 0.0 END), 6) AS interval_accuracy
         |FROM ($survSql)""".stripMargin
  )
}
