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
  * metastore and the layout survives across jobs; in a plain local
  * session the in-memory catalog forgets the table on stop (the parquet
  * files at `path` remain, but a re-read via `spark.read.parquet` does
  * not know the bucketing). Re-register with [[write]] per snapshot
  * build, or run with a persistent metastore.
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
    df.write.mode("append").format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)
  }
}
