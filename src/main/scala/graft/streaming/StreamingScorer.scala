package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.BoosterModel
import graft.predict.Predictor

/** Streaming inference (SURVEY §2.9): the reference has no streaming
  * semantics — training continuation + callbacks are its nearest notion —
  * but scoring a stream falls out of the Spark-first design for free: the
  * same codegen [[graft.predict.TreePredict]] expression evaluates
  * unchanged inside a Structured Streaming micro-batch plan (`readStream`
  * → transform → `writeStream`), the flattened model riding along as a
  * plan reference object. No per-batch model shipping, no state store —
  * scoring is stateless row-at-a-time work, so watermarks/output modes
  * stay whatever the surrounding query needs. */
object StreamingScorer {

  /** Append prediction columns to a (streaming or batch) DataFrame:
    * `prediction` always; `margin` for single-output models;
    * `rawPrediction`/`probability` vectors for multiclass. */
  def score(df: DataFrame, model: BoosterModel,
      featuresCol: String = "features"): DataFrame =
    Predictor.transform(df, model, featuresCol)

  /** Windowed streaming metric: per event-time window mean prediction +
    * count (the watermarked-aggregation shape a streaming eval pipeline
    * uses; elementwise metrics compose the same way). */
  def windowedMeanPrediction(scored: DataFrame, timeCol: String,
      window: String, watermark: String): DataFrame =
    scored
      .withWatermark(timeCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(timeCol), window))
      .agg(count(lit(1)).as("n"), avg(col("prediction")).as("mean_prediction"))
}

/** A closed user session emitted by [[StreamingSessionizer]]. */
final case class SessionUpdate(userId: Long, startSec: Long, endSec: Long,
    nEvents: Long)

private final case class SessionState(startSec: Long, lastSec: Long, nEvents: Long)

/** Gap-based sessionization with CUSTOM STATE
  * (`flatMapGroupsWithState`, event-time timeout) — the streaming twin of
  * the batch `e_sessionize` query ([[graft.queries.EventQueries]]): state is
  * one (start, last, count) triple per user, sessions close either when an
  * event arrives after more than `gapSec` of inactivity or when the
  * watermark passes last+gap (timeout). State is partitioned by user across
  * the cluster by the state store — the same `user_id` keying the batch
  * window uses, so both scale identically. */
object StreamingSessionizer {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  /** events: (user_id: Long, ts: Timestamp). Returns closed sessions. */
  def sessionize(events: DataFrame, gapSec: Long, watermark: String): Dataset[SessionUpdate] = {
    implicit val updEnc = Encoders.product[SessionUpdate]
    implicit val longEnc = Encoders.scalaLong
    // the WATERMARKED ts column must flow into the state operator (the
    // unsupported-operation checker rejects event-time timeout otherwise),
    // so keep the timestamp typed and convert to seconds inside the group fn
    implicit val rowEnc = Encoders.product[(Long, java.sql.Timestamp)]
    val stateEnc = Encoders.product[SessionState]
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rowsTs: Iterator[(Long, java.sql.Timestamp)], st: GroupState[SessionState]) => {
          val rows = rowsTs.map(r => (r._1, r._2.getTime / 1000L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          if (st.hasTimedOut) {
            st.getOption.foreach(s =>
              out += SessionUpdate(user, s.startSec, s.lastSec, s.nEvents))
            st.remove()
          } else {
            // micro-batch delivery is unordered within a group: sort the
            // batch, then fold into the running session
            var cur = st.getOption.orNull
            rows.map(_._2).toArray.sorted.foreach { sec =>
              cur match {
                case null => cur = SessionState(sec, sec, 1)
                case s if sec - s.lastSec > gapSec =>
                  out += SessionUpdate(user, s.startSec, s.lastSec, s.nEvents)
                  cur = SessionState(sec, sec, 1)
                case s => cur = SessionState(s.startSec, sec, s.nEvents + 1)
              }
            }
            if (cur != null) {
              st.update(cur)
              // close via timeout once the watermark passes last event + gap
              st.setTimeoutTimestamp((cur.lastSec + gapSec) * 1000L)
            }
          }
          out.iterator
        })(stateEnc, updEnc)
  }
}

/** Streaming twin of the batch conversion funnel
  * ([[graft.queries.EventQueries.funnel]]): per-user state = the stage
  * times reached so far; an event advances the funnel iff it is the
  * next expected stage and strictly after the previous stage time.
  * Within each micro-batch the group's events are SORTED by event time
  * (delivery is unordered), so with batches arriving in event-time
  * order the streaming completions are identical to the batch funnel's
  * completers — the parity `StreamingSpec` asserts it. Emits one
  * [[FunnelCompletion]] when a user reaches the final stage; state is
  * dropped on completion, so per-user state is O(K) and completed
  * users cost nothing thereafter. */
object StreamingFunnel {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  /** events: (user_id: Long, ts: Timestamp, event_type: String). */
  def funnel(events: DataFrame, stages: Seq[String],
      watermark: String): Dataset[FunnelCompletion] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    implicit val outEnc = Encoders.product[FunnelCompletion]
    implicit val longEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.product[(Long, java.sql.Timestamp, String)]
    val stateEnc = Encoders.product[FunnelState]
    val k = stages.length
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type").cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelCompletion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
            st: GroupState[FunnelState]) => {
          var s = st.getOption.getOrElse(FunnelState(Vector.empty, done = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelCompletion]
          if (!s.done) {
            val batch = rows.map(r => (r._2.getTime, r._3)).toArray.sortBy(_._1)
            batch.foreach { case (ms, tpe) =>
              if (!s.done && s.times.length < k &&
                  tpe == stages(s.times.length) &&
                  (s.times.isEmpty || ms > s.times.last)) {
                s = FunnelState(s.times :+ ms, s.times.length + 1 == k)
                if (s.done)
                  out += FunnelCompletion(user, s.times.head, s.times.last)
              }
            }
            if (s.done) st.remove() else st.update(s)
          }
          out.iterator
        })(stateEnc, outEnc)
  }
}

final case class FunnelCompletion(userId: Long, firstMs: Long, lastMs: Long)
private final case class FunnelState(times: Vector[Long], done: Boolean)

/** Streaming ingestion gate for a continuous document feed — the
  * LLM-data-pipeline operators ([[graft.ext.TextOps]] quality/language
  * heuristics, content-hash exact dedup) applied at the `readStream`
  * boundary, where a 100 TB corpus actually arrives. The SAME batch column
  * expressions evaluate inside the micro-batch plan (no forked logic to
  * drift), and dedup state is Spark's watermark-scoped duplicate store
  * keyed by the content hash — partitioned exactly like the batch
  * `Dedup.exactDedup` hash-groupBy, with the watermark bounding state
  * instead of unbounded history (the streaming-correct trade: duplicates
  * farther apart than the watermark pass through and are caught by the
  * periodic batch dedup sweep).
  */
object StreamingIngest {
  import graft.ext.TextOps

  /** Gate + dedup a streaming document feed. Emits the surviving rows with
    * their `content_hash`, `n_tokens`, `quality`, `en_ratio`,
    * `top_bigram_frac` columns.
    *
    * docs: streaming DataFrame with event-time `tsCol` and text `textCol`.
    * The quality/language thresholds mirror the batch `p_quality` /
    * `p_lang_id` heuristics; the repetition gate mirrors the batch
    * Gopher rule (`CorpusFilters.repetitionStats` top-bigram fraction)
    * via the shuffle-free array expression `TextOps.topNgramFraction` —
    * the whole gate stays a stateless projection ahead of the
    * watermark-scoped dedup (default 1.0 = off, matching pre-existing
    * feeds that tuned only quality).
    *
    * `nearDupHashes` > 0 upgrades the dedup key from the exact content
    * hash to a k-hash MinHash signature (`Dedup.withMinhashSignature`,
    * bit-identical slot math to the batch miner): documents whose SHINGLE
    * SETS coincide — reordered, re-wrapped, or boilerplate-identical text
    * — collapse even when their bytes differ. Signature equality is the
    * AND over all k hashes (P = J^k), so this is the near-exact tier of
    * near-dedup; the banded OR-semantics tier (catching J ≈ 0.8) stays a
    * batch sweep (`Dedup.nearDupPairs`) because any-band matching needs
    * cross-key state that a single watermark-scoped dedup cannot hold.
    * Exact duplicates have equal signatures, so the exact tier is
    * subsumed; `content_hash` stays in the output for audit. */
  def cleanDocuments(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes",
      minTokens: Int = 5, minQuality: Double = 0.2,
      maxTopBigramFrac: Double = 1.0, nearDupHashes: Int = 0,
      fixUnicode: Boolean = false, c4: Boolean = false,
      redactPii: Boolean = false): DataFrame = {
    require(docs.isStreaming,
      "cleanDocuments is the streaming twin; batch feeds use Dedup.exactDedup + the p_quality filters")
    // optional pre-gate cleaning stages — all stateless projections, so
    // they ride the stream bit-identically to their batch forms:
    // fixText → C4 line/page filter (dropped pages leave the stream,
    // survivors carry the cleaned text) → PII redaction
    import graft.ext.Cleaning
    val fixed =
      if (fixUnicode) docs.withColumn(textCol, Cleaning.fixText(col(textCol)))
      else docs
    val c4ed =
      if (c4) Cleaning.withC4Columns(fixed, textCol)
        .where(col("page_keep") === 1)
        .withColumn(textCol, col("clean_text"))
        .drop("n_lines", "n_kept", "page_keep", "clean_text")
      else fixed
    val scrubbed =
      if (redactPii) c4ed.withColumn(textCol, Cleaning.redactText(col(textCol)))
      else c4ed
    val t = TextOps.tokens(col(textCol))
    val gated = scrubbed
      .withWatermark(tsCol, watermark)
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("quality", TextOps.qualityScore(col(textCol), t))
      .withColumn("en_ratio", TextOps.enStopwordRatio(t))
      .withColumn("top_bigram_frac", TextOps.topNgramFraction(t, 2))
      .where(col("n_tokens") >= minTokens && col("quality") >= minQuality &&
        col("top_bigram_frac") <= maxTopBigramFrac)
    if (nearDupHashes <= 0) gated.dropDuplicatesWithinWatermark("content_hash")
    else {
      graft.ext.Dedup.withMinhashSignature(gated, textCol, "minhash_sig", nearDupHashes)
        .withColumn("dedup_key",
          // empty signature (no shingles) → fall back to the exact hash
          // so shingle-less short docs don't all collapse onto one key
          when(size(col("minhash_sig")) > 0, concat_ws("_", col("minhash_sig")))
            .otherwise(col("content_hash")))
        .dropDuplicatesWithinWatermark("dedup_key")
        .drop("dedup_key")
    }
  }
}

/** Continuous training over a micro-batch stream — the streaming twin of
  * the reference's `xgb_model` continuation (training.py:40-46): each
  * micro-batch appends `roundsPerBatch` boosted rounds onto the running
  * ensemble via [[graft.tree.GBTTrainer.fitContinue]], starting from the
  * previous model's margins, so the ensemble incrementally tracks the feed
  * without ever re-reading history. The model reference lives on the
  * driver (foreachBatch runs there); executors see each generation as a
  * broadcast inside fitContinue — no state store, no model shipping
  * beyond the per-generation broadcast a batch fit pays anyway.
  *
  * Scale notes: each micro-batch fit is the SAME distributed hist fit as
  * batch training (sketch → bin → level-wise treeAggregates) on just the
  * new data; `maxTrees` bounds ensemble growth (oldest-first slice) so
  * per-row inference cost stays O(maxTrees·depth) on an unbounded feed. */
final class StreamingTrainer(
    params: graft.tree.TrainParams,
    initial: Option[BoosterModel] = None,
    maxTrees: Int = 0) extends Serializable {

  @volatile private var current: Option[BoosterModel] = initial

  /** Latest model generation (None until the first non-empty batch). */
  def model: Option[BoosterModel] = current

  /** Fold one micro-batch of (features, label, weight) rows into the
    * ensemble; returns the updated model. Empty batches are a no-op. */
  def update(batch: org.apache.spark.rdd.RDD[(Array[Double], Double, Double)]): Option[BoosterModel] = {
    if (batch.isEmpty()) return current
    val trainer = new graft.tree.GBTTrainer(params)
    val next = current match {
      case Some(prev) => trainer.fitContinue(batch, prev)
      case None => trainer.fit(batch)
    }
    val bounded =
      if (maxTrees > 0 && next.trees.length > maxTrees) {
        val cut = next.trees.length - maxTrees
        // The dropped (oldest) trees' contribution is baked into every later
        // tree's residual fit; removing them without compensation shifts all
        // predictions by that contribution. Estimate its per-group mean on
        // the current batch and fold it into baseScore so the sliced
        // ensemble keeps the same prediction center.
        val dropped = next.copy(
          trees = next.trees.slice(0, cut),
          treeWeights = next.treeWeights.slice(0, cut),
          treeGroup = next.treeGroup.slice(0, cut),
          baseScore = new Array[Double](next.baseScore.length))
        val (sums, n) = batch
          .map { case (f, _, _) => (dropped.margin(f), 1L) }
          .treeReduce { case ((a, na), (b, nb)) =>
            var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }
            (a, na + nb)
          }
        val sliced = next.slice(cut, next.trees.length)
        sliced.copy(baseScore = Array.tabulate(sliced.baseScore.length)(g =>
          sliced.baseScore(g) + sums(g) / math.max(n, 1L).toDouble))
      } else next
    current = Some(bounded)
    current
  }

  /** foreachBatch sink: decode `featuresCol`/`labelCol` (+ optional
    * `weightCol`) from each micro-batch DataFrame and fold it in. */
  def sink(featuresCol: String = "features", labelCol: String = "label",
      weightCol: String = ""): (DataFrame, Long) => Unit = { (df, _) =>
    val w = if (weightCol.nonEmpty) col(weightCol).cast("double") else lit(1.0)
    val rows = df.select(col(featuresCol), col(labelCol).cast("double"), w)
      .rdd.map { r =>
        val f = r.get(0) match {
          case a: scala.collection.Seq[_] =>
            a.map(x => x.asInstanceOf[Number].doubleValue()).toArray
          case a: Array[Double] => a
          case other => throw new IllegalArgumentException(
            s"featuresCol must be array<double>, got ${other.getClass}")
        }
        (f, r.getDouble(1), r.getDouble(2))
      }
    update(rows)
    ()
  }
}
