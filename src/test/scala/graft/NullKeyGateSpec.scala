package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Null-key semantics of the key-tier gates (exact / normalized / url /
  * signature — the shared `keyedGate` contract): a null canonical key
  * (null url, null text) is NO EVIDENCE of duplication, so null-key rows
  * pass the tier untouched — never collapsed within-batch (each is its
  * own window partition; no hot task on a null-heavy feed), never
  * blocked by the snapshot, and null keys IN the snapshot block nothing.
  * The DuckDB oracles replay the same decision (`p_incr_url`'s null-url
  * classes); Spark's `left_anti` and SQL `NOT IN` diverge on null
  * without it. */
class NullKeyGateSpec extends AnyFunSuite {
  import TestSpark._

  test("url tier: null-url rows all pass through; null prior keys block nothing") {
    import spark.implicits._
    val prior = Seq(
      (1L, "https://example.com/a"),
      (2L, null.asInstanceOf[String]), // dirty snapshot row → null key
      (3L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val keys = Dedup.urlKeys(prior)
    val batch = Seq(
      (10L, "https://example.com/a#f"), // canonical replica → blocked
      (11L, null.asInstanceOf[String]), // null url → pass through
      (12L, null.asInstanceOf[String]), // second null url → ALSO kept
      (13L, null.asInstanceOf[String]), // third — none collapse
      (14L, "https://example.com/new")).toDF("doc_id", "url")
    val kept = Dedup.incrementalUrlDedup(batch, keys)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L, 13L, 14L), kept)
  }

  test("exact + normalized tiers: null-text rows pass through, bloom route unchanged") {
    import spark.implicits._
    val prior = Seq((1L, "same text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "same text"), // exact replica → blocked
      (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]),
      (13L, "novel text")).toDF("doc_id", "text")
    def ids(bloom: Long) = Dedup.incrementalDedupKeys(batch,
        Dedup.exactKeys(prior), bloomExpectedItems = bloom)
      .select("doc_id").as[Long].collect().toSet
    assert(ids(-1L) == Set(11L, 12L, 13L), ids(-1L))
    // the Bloom pre-filter (null keys skip it map-side) never changes
    // the result — null batch keys route to the no-maybe branch, null
    // prior keys are excluded from the filter build
    assert(ids(1000L) == ids(-1L))
    val keptNorm = Dedup.incrementalNormalizedDedup(batch,
        Dedup.canonicalKeys(prior))
      .select("doc_id").as[Long].collect().toSet
    assert(keptNorm == Set(11L, 12L, 13L), keptNorm)
  }

  test("signature tier: null-text rows pass through the key gate") {
    import spark.implicits._
    val prior = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // sig replica → blocked
      (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]),
      (13L, "totally different words entirely here now")).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDedup(batch,
        Dedup.nearDupKeys(prior, numHashes = 16), numHashes = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L, 13L), kept)
  }

  test("streaming urlGate parity holds on a null-url feed (no state-op collapse)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prior = Seq((1L, "https://example.com/a")).toDF("doc_id", "url")
    val keys = Dedup.urlKeys(prior).localCheckpoint()
    val ts = new java.sql.Timestamp(1700000000000L)
    val feed = Seq(
      (10L, "https://example.com/a#f"), // blocked by the snapshot
      (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]), // both null rows survive
      (13L, "https://example.com/new"),
      (14L, "https://example.com/new#t")) // within-stream twin collapses
    val st = MemoryStream[(Long, java.sql.Timestamp, String)]
    val gated = graft.streaming.StreamingIngest.urlGate(
      st.toDF().toDF("doc_id", "ts", "url"), keys, watermark = "1 minute")
    val q = gated.writeStream.format("memory").queryName("null_url_sink")
      .outputMode("append").start()
    try {
      st.addData(feed.map { case (id, u) => (id, ts, u) })
      q.processAllAvailable()
    } finally q.stop()
    val streamKept = spark.table("null_url_sink")
      .select("doc_id").as[Long].collect().toSet
    val batchKept = Dedup.incrementalUrlDedup(feed.toDF("doc_id", "url"), keys)
      .select("doc_id").as[Long].collect().toSet
    assert(streamKept == batchKept && streamKept == Set(11L, 12L, 13L),
      s"stream=$streamKept batch=$batchKept")
  }

  /** Drive one standalone keyed stream twin over a (doc_id, text) feed
    * and return the kept ids. */
  private def runTextTwin(feed: Seq[(Long, String)], sink: String)(
      gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ts = new java.sql.Timestamp(1700000000000L)
    val st = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = gate(st.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      st.addData(feed.map { case (id, t) => (id, ts, t) })
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).select("doc_id").as[Long].collect().toSet
  }

  test("streaming exact/normalized/signature twins: null-text parity with the batch gates (no state-op collapse)") {
    import spark.implicits._
    val prior = Seq((1L, "seen page body here today"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // EXACT twin vs Dedup.incrementalDedupKeys
    val exactKeys = Dedup.exactKeys(prior).localCheckpoint()
    val feedE = Seq(
      (10L, "seen page body here today"),   // snapshot hit → blocked
      (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]),     // both null rows survive
      (13L, "novel page body right here"),
      (14L, "novel page body right here"))  // within-stream twin collapses
    val streamE = runTextTwin(feedE, "null_exact_sink")(
      graft.streaming.StreamingIngest.exactGate(_, exactKeys,
        watermark = "1 minute"))
    val batchE = Dedup.incrementalDedupKeys(feedE.toDF("doc_id", "text"),
      exactKeys).select("doc_id").as[Long].collect().toSet
    assert(streamE == batchE && streamE == Set(11L, 12L, 13L),
      s"stream=$streamE batch=$batchE")
    // NORMALIZED twin vs Dedup.incrementalNormalizedDedup
    val canonKeys = Dedup.canonicalKeys(prior).localCheckpoint()
    val feedN = Seq(
      (10L, "SEEN page, body... here -- today!"), // canonical replica → blocked
      (11L, null.asInstanceOf[String]),
      (12L, null.asInstanceOf[String]),
      (13L, "Novel body!"),
      (14L, "novel BODY"))                        // canonical twin collapses
    val streamN = runTextTwin(feedN, "null_norm_sink")(
      graft.streaming.StreamingIngest.normalizedGate(_, canonKeys,
        watermark = "1 minute"))
    val batchN = Dedup.incrementalNormalizedDedup(feedN.toDF("doc_id", "text"),
      canonKeys).select("doc_id").as[Long].collect().toSet
    assert(streamN == batchN && streamN == Set(11L, 12L, 13L),
      s"stream=$streamN batch=$batchN")
    // SIGNATURE twin vs Dedup.incrementalNearDedup (k = 16): the
    // re-wrapped copy shares the shingle SET (different bytes); the
    // two-token doc exercises the shingle-less md5 fallback
    val sigKeys = Dedup.nearDupKeys(prior, numHashes = 16).localCheckpoint()
    val feedS = Seq(
      (10L, "here today seen page body here today"), // sig-equal? no — different shingles
      (11L, "seen page body here today"),            // signature replica → blocked
      (12L, null.asInstanceOf[String]),
      (13L, null.asInstanceOf[String]),              // nulls survive, uncollapsed
      (14L, "tiny doc"))                             // shingle-less fallback key
    val streamS = runTextTwin(feedS, "null_sig_sink")(
      graft.streaming.StreamingIngest.signatureGate(_, sigKeys,
        numHashes = 16, watermark = "1 minute"))
    val batchS = Dedup.incrementalNearDedup(feedS.toDF("doc_id", "text"),
      sigKeys, numHashes = 16).select("doc_id").as[Long].collect().toSet
    assert(streamS == batchS, s"stream=$streamS batch=$batchS")
    assert(Set(12L, 13L, 14L).subsetOf(streamS) && !streamS(11L), streamS)
  }
}
