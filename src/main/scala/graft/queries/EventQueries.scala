package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Event-stream analytics over the `events` table — the batch expression of
  * the Structured Streaming shapes in [[graft.streaming.StreamingScorer]]
  * (same column expressions evaluate unchanged under `readStream`):
  * event-time tumbling windows, gap-based sessionization
  * (`session_window` semantics), and semi-structured JSON props.
  *
  * Oracle-portability: money sums go through integer cents
  * (`round(value*100) → BIGINT`) and time through whole epoch seconds, so
  * every aggregate is order-insensitive integer math — no double-rounding
  * boundary risk between Spark's partial-agg order and DuckDB's.
  *
  * Scale notes: the tumbling window is a plain hash aggregation on
  * (hour, type) — fully parallel, no window function. Sessionization
  * partitions by `user_id` (bounded per-user event counts), the same
  * keying a `session_window` stream would state-partition on. */
object EventQueries {

  /** Events with `ts` normalized to epoch NANOSECONDS as a long, whatever
    * the parquet physical type: TIMESTAMP(NANOS) files are read as raw
    * nanos longs (Spark 4 rejects them otherwise), TIMESTAMP(MICROS) files
    * arrive as TIMESTAMP_NTZ/TIMESTAMP and are converted via `unix_micros`
    * under a UTC session zone — the same naive-epoch interpretation
    * DuckDB's `epoch_ns(ts)` applies in the oracle. All time math below is
    * then exact integer division on the ns long, mirrored by
    * `epoch_ns(ts) // n`. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        // NTZ→LTZ cast reads the naive micros in the session zone; pin it
        // to UTC so the stored micros pass through unchanged (the engine's
        // event-time contract, matching the oracle's naive epoch_ns). The
        // zone id is attached to the Cast during the eager analysis of
        // withColumn, so the prior session zone can be restored right
        // after — a non-UTC caller keeps its own zone for everything else.
        val prevTz = s.conf.get("spark.sql.session.timeZone")
        s.conf.set("spark.sql.session.timeZone", "UTC")
        try raw.withColumn("ts",
          (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts"))
        finally s.conf.set("spark.sql.session.timeZone", prevTz)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // event-time tumbling window: per (hour, event_type) count + cent sum.
    // FLOOR division on the ns long (subtract pmod first): `div` truncates
    // toward zero while the oracle's `//` floors, which would diverge on
    // pre-1970 (negative-epoch) event times — all-integer, no double cast
    "e_window_agg" -> ((s, dir) =>
      events(s, dir).select(
        expr("(ts - pmod(ts, 3600000000000)) div 3600000000000").as("hr"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
        .groupBy("hr", "event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .orderBy("hr", "event_type")),

    // gap-based sessionization (30-min inactivity): sessions + events per user
    "e_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
      events(s, dir).select(col("user_id"), col("event_id"),
        // floor division, matching the oracle's `//` (see e_window_agg)
        expr("(ts - pmod(ts, 1000000000)) div 1000000000").as("sec"))
        .withColumn("gap", col("sec") - lag("sec", 1).over(byUser))
        .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("brk").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ordered conversion funnel view → click → purchase: strictly-after
    // stage times per user, corpus counts + total time-to-convert
    "e_funnel" -> ((s, dir) => {
      val f = funnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      f.agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click"),
        count(col("t3")).as("n_purchase"),
        coalesce(sum(col("t3") - col("t1")), lit(0L)).as("convert_ns"))
    }),

    // weekly cohort retention: cohort = floor-week of a user's first
    // event, cell (cohort, k) = distinct users active k weeks later —
    // two user-keyed aggregates + one distinct, no full-stream window
    "e_retention" -> ((s, dir) => {
      val weekNs = 604800000000000L // 7 * 24 * 3600 * 1e9
      val e = events(s, dir).select(col("user_id"),
        expr(s"(ts - pmod(ts, $weekNs)) div $weekNs").as("wk"))
      val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      e.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("k"))
        .distinct()
        .groupBy("cohort_wk", "k")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_wk", "k")
    }),

    // semi-structured props: JSON field extract + per-type aggregate
    "e_json_props" -> ((s, dir) =>
      events(s, dir).select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type"))
  )

  /** Ordered-funnel stage times: per user, t1 = first stage-1 event,
    * t_i = first stage-i event STRICTLY after t_{i−1}; later stages are
    * null for users who drop out.
    *
    * RE-ENTRY CONTRACT: one row per user, carrying the FIRST complete
    * traversal's times — later traversals are invisible to the batch
    * report. The streaming twin ([[graft.streaming.StreamingFunnel]])
    * drops state on completion and therefore emits one row PER
    * traversal; parity holds exactly for one-traversal users
    * (locked by StreamingSpec's re-entry contract case).
    *
    * ONE user-keyed shuffle total (r10; was K aggregates + K−1 hash
    * joins): non-stage events are dropped map-side, the survivors are
    * hash-repartitioned on user and SORTED WITHIN PARTITIONS by
    * (user, ts, stage) — Spark's external sort, which spills instead of
    * buffering — and a streaming per-partition fold walks consecutive
    * same-user runs greedily: append ts when the event is the next
    * expected stage and strictly after the previous stage time. A
    * time-ordered greedy scan picks exactly the minimal qualifying
    * times, so the result is identical to the join-chain formulation
    * (and to the DuckDB oracle that still replays the join chain).
    *
    * Per-user STATE is O(K) — the ≤K accepted stage times — never the
    * user's event list (r12; was a per-user `collect_list` of every
    * stage event, a single-task OOM for a bot identity with 10⁷–10⁸
    * events, exactly the quantity an adversarial bot inflates). The
    * shuffle count is unchanged: one hash repartition on user; the sort
    * is within-partition only, no global range exchange. */
  private[graft] def funnel(e: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val k = stages.length
    val stageArr = array(stages.map(lit): _*)
    val evs = e.select(col(userCol),
        col(tsCol).cast("long").as("__ts"),
        (array_position(stageArr, col(typeCol)) - 1).cast("int").as("__si"))
      // null-ts events are dropped map-side (dirty data: a null timestamp
      // can never be "the earliest qualifying time"); matches the oracle's
      // join chain, where min(ts) skips NULLs — and keeps the iterator's
      // getLong(1) total
      .where(col("__si") >= 0 && col("__ts").isNotNull)
    val userField = evs.schema.head
    // the fold detects group boundaries with value equality on the
    // external row object; that is only well-defined for discrete scalar
    // key types (long/int/string/decimal/date/...):
    //  - an array, map, struct, or binary user key surfaces as a JVM
    //    object comparing by reference, so every row would open a new
    //    group and silently emit duplicate user rows;
    //  - a float/double key has ill-defined boundaries at the IEEE edge
    //    cases — boxed NaN compares unequal to ITSELF here (each event
    //    of a NaN-keyed user would emit its own group) while Spark's
    //    grouping semantics treat NaNs as one key, and ±0.0 merge or
    //    split depending on the equality used. A fractional user id is
    //    a data bug regardless; reject loudly.
    userField.dataType match {
      case _: types.ArrayType | _: types.MapType | _: types.StructType |
          types.BinaryType | types.FloatType | types.DoubleType =>
        throw new IllegalArgumentException(
          "funnel user column must be a discrete scalar type " +
            s"(integral/string/decimal), got ${userField.dataType}")
      case _ => ()
    }
    val outSchema = types.StructType(userField +:
      (1 to k).map(i => types.StructField(s"t$i", types.LongType, nullable = true)))
    val nPart = e.sparkSession.sessionState.conf.numShufflePartitions
    evs.repartition(nPart, col(userCol))
      .sortWithinPartitions(col(userCol), col("__ts"), col("__si"))
      .mapPartitions { it =>
        new Iterator[Row] {
          private var pendingRow: Row = null
          private var cur: Any = null
          private var open = false
          private val times = new scala.collection.mutable.ArrayBuffer[Long](k)
          private def emit(): Row = {
            val vals = new Array[Any](k + 1)
            vals(0) = cur
            var i = 0
            while (i < k) {
              vals(i + 1) = if (i < times.length) times(i) else null; i += 1
            }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
          private def advance(): Unit = {
            while (pendingRow == null && it.hasNext) {
              val r = it.next()
              val u = r.get(0)
              if (!open || u != cur) {
                if (open && times.nonEmpty) pendingRow = emit()
                cur = u; open = true; times.clear()
              }
              if (times.length < k && r.getInt(2) == times.length &&
                  (times.isEmpty || r.getLong(1) > times.last))
                times += r.getLong(1)
            }
            if (pendingRow == null && open) {
              open = false
              if (times.nonEmpty) pendingRow = emit()
            }
          }
          def hasNext: Boolean = { if (pendingRow == null) advance(); pendingRow != null }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("empty funnel iterator")
            val r = pendingRow; pendingRow = null; r
          }
        }
      }(Encoders.row(outSchema))
  }

  def oracle: Map[String, String] = Map(
    "e_window_agg" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hr, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec
        |  FROM events
        |), g AS (
        |  SELECT user_id,
        |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
        |  FROM e
        |)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |  GROUP BY e.user_id
        |)
        |SELECT CAST(count(s1.t1) AS BIGINT) AS n_view,
        |  CAST(count(s2.t2) AS BIGINT) AS n_click,
        |  CAST(count(s3.t3) AS BIGINT) AS n_purchase,
        |  CAST(coalesce(sum(s3.t3 - s1.t1), 0) AS BIGINT) AS convert_ns
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,

    "e_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events
        |), c AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT e.user_id, c.cohort_wk, e.wk - c.cohort_wk AS k
        |  FROM e JOIN c ON e.user_id = c.user_id
        |)
        |SELECT cohort_wk, k, count(*) AS n_users
        |FROM a GROUP BY cohort_wk, k ORDER BY cohort_wk, k""".stripMargin,

    "e_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
