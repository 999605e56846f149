package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed snapshot tables — Spark's mechanism for CO-LOCATED joins
  * without a shuffle: a table written with `bucketBy(k, key)` is stored
  * pre-hash-partitioned (and, with `sortBy`, pre-sorted) on the key, and
  * the scan reports that bucketing as its output partitioning — so every
  * later equi-join or aggregation on the key skips the Exchange (and the
  * sort) entirely.
  *
  * The daily-crawl gate artifacts are the motivating case at 100 TB: the
  * prior snapshot's key/signature tables
  * ([[graft.ext.Dedup.nearDupKeys]] / [[graft.ext.Dedup.minhashSignatures]])
  * are written ONCE per snapshot and joined EVERY day. Bucketed on the
  * join key, the snapshot side of the gate never shuffles again — the
  * daily batch alone pays an exchange, sized by the day's crawl rather
  * than the accumulated corpus. The same applies to any dimension that
  * is joined repeatedly on a stable key (document metadata on doc_id,
  * URL tables on the registered domain).
  *
  * Catalog caveat (documented, inherent): the bucketing METADATA lives in
  * the session catalog. On a production cluster that is the persistent
  * metastore and the layout survives across jobs — BucketedSnapshotSpec
  * pins this with a derby-metastore restart round-trip (write under one
  * catalog instance, read exchange-free under a fresh one). In a plain
  * local session the in-memory catalog forgets the table on stop (the
  * parquet files at `path` remain, but a re-read via
  * `spark.read.parquet` does not know the bucketing). Re-register with
  * [[write]] per snapshot build, or run with a persistent metastore.
  */
object BucketedSnapshot {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table at `path`,
    * registered as `tableName`. `numBuckets` must match on both sides of
    * a join for the exchange to be elided — pick one number per key
    * domain and keep it (a snapshot contract, like the signature k). */
  def write(df: DataFrame, tableName: String, path: String,
      keyCol: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)
  }

  /** Read a bucketed table back THROUGH THE CATALOG — `spark.table`, not
    * `spark.read.parquet(path)`: only the catalog route carries the
    * bucketing metadata that lets the planner drop the exchange. */
  def read(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Advance a snapshot table by APPENDING rows — the day-N → day-N+1
    * step of the crawl-gate loop. After a day's batch is gated and
    * accepted, its key/signature projection
    * ([[graft.ext.Dedup.exactKeys]] / [[graft.ext.Dedup.nearDupKeys]] /
    * [[graft.ext.Dedup.minhashSignatures]] — all per-document, so the
    * advanced snapshot ≡ recomputing the projection over prior ∪
    * accepted) is appended here. Only the DAY'S rows are hashed into
    * bucket files; the accumulated corpus is never rewritten or
    * reshuffled — at 100 TB the advance costs O(day), not O(corpus).
    * Spark validates the bucketing spec against the existing table, so a
    * mismatched `numBuckets`/key fails loudly rather than silently
    * degrading the layout.
    *
    * Read-your-own-write contract: the day's accepted rows are normally
    * DERIVED from a gate that scans this same table. Materialize them
    * (write the accepted batch, or `localCheckpoint()`) BEFORE calling
    * `append` — a lazy plan re-evaluated after the advance would see the
    * day's own keys already in the snapshot and gate the day against
    * itself. */
  def append(df: DataFrame, tableName: String, keyCol: String,
      numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    // mode("append").saveAsTable on a MISSING table would quietly create
    // a fresh one holding only the day's keys — every later gate would
    // read a snapshot without the prior corpus and re-admit all
    // historical duplicates. The catalog-forgets-on-restart caveat above
    // makes this an easy state to reach; fail loudly instead.
    require(df.sparkSession.catalog.tableExists(tableName),
      s"snapshot table $tableName is not in the catalog — re-register the " +
        "existing snapshot with write() before advancing it")
    df.write.mode("append").format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)
  }

  /** Compact an append-accumulated snapshot into ONE file per bucket.
    *
    * Each [[append]] adds up to (writing tasks × buckets) files — a year
    * of daily advances leaves thousands of small files per bucket, and
    * scan/open overhead grows with file count even though the layout is
    * still correct. Compaction rewrites the table at `toPath` as
    * `toTable`: the `repartition(numBuckets, key)` uses the SAME
    * Murmur3 hash as the bucketing, so every bucket's rows land in
    * exactly one task and each task emits exactly one bucket file — the
    * rewrite is one shuffle of the key projection (bytes ∝ keys, not
    * corpus text), never a driver collect.
    *
    * Writes to a NEW table/path rather than in place: Spark cannot
    * overwrite a table from a plan that scans it, and at corpus scale an
    * in-place rewrite would have no rollback. Swap names in the catalog
    * (or point the next day's gate at `toTable`) once the write
    * succeeds; drop the old table afterwards. */
  def compact(spark: SparkSession, fromTable: String, toTable: String,
      toPath: String, keyCol: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    // Counter-intuitive but required: read the source with bucketing
    // DISABLED. With it on, the planner sees the scan's bucket layout,
    // drops the explicit repartition as redundant — and then ALSO
    // disables the bucketed scan itself ("disabled by query planner",
    // nothing downstream demands it), leaving NO alignment at all: each
    // bin-packed read task holds several buckets' rows and the write
    // fragments into tasks × buckets files again. With bucketing off,
    // the REPARTITION_BY_NUM exchange survives (AQE never coalesces a
    // user-numbered repartition), its Murmur3 partition id equals the
    // writer's bucket id, and each task emits exactly one bucket file.
    //
    // The flag is flipped on a CLONED session (own conf, shared catalog
    // and warehouse), never the caller's: a concurrent daily-gate query
    // planned mid-compaction would otherwise lose its exchange-free
    // snapshot join, and two overlapping compactions would race on the
    // save/restore and could leave bucketing disabled session-wide.
    val compactSession = spark.newSession()
    compactSession.conf.set("spark.sql.sources.bucketing.enabled", "false")
    compactSession.table(fromTable)
      .repartition(numBuckets, org.apache.spark.sql.functions.col(keyCol))
      .write.mode("overwrite").format("parquet")
      .option("path", toPath)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(toTable)
  }
}
