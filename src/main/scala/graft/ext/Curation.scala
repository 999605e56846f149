package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after cleaning/dedup: deterministic stratified sampling (data mixing)
  * and sequence packing (document concatenation into fixed token-budget
  * training chunks).
  *
  * Scale design (100 TB): sampling is a pure map-side predicate on a
  * splittable content hash — no shuffle, no driver state, reproducible
  * across reruns/retries (the property `rand()` sampling lacks on a
  * cluster). Packing is one global range-partitioned cumulative sum
  * ([[graft.data.DistributedCumsum]] — per-partition totals + prefix
  * offsets, no single-task window) followed by map-side chunk arithmetic.
  */
object Curation {

  /** Uniform fraction of 2^60 for a deterministic per-row coin: md5-based,
    * identical in any engine with md5 (reproducible sampling contract). */
  def hashFraction(key: Column, salt: String): Column =
    TextOps.hash60(concat_ws("_", key.cast("string"), lit(salt))) /
      lit(1152921504606846976.0) // 2^60

  /** Deterministic stratified sample: keep a row iff its hash fraction is
    * under the stratum's rate. `rates` maps stratum value → rate; strata
    * absent from the map use `defaultRate`. */
  def stratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double, keyCol: String,
      salt: String = "strat"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (v, r)) =>
      when(col(strataCol) === v, lit(r)).otherwise(acc)
    }
    df.where(hashFraction(col(keyCol), salt) < rate)
  }

  /** Contiguous sequence packing: documents in `orderCol` order are
    * concatenated and chunked into packs of `budget` tokens — pack id =
    * floor(tokens-before-this-doc / budget), the standard pretraining
    * concat-then-chunk strategy (a doc may straddle a boundary; it is
    * assigned to the pack its first token lands in). Emits one row per
    * input doc with (orderCol, n_tokens, pack_id). */
  def packSequences(df: DataFrame, textCol: String, orderCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val withTokens = df.select(col(orderCol),
      size(TextOps.tokens(col(textCol))).cast("double").as("n_tokens"))
    val c = graft.data.DistributedCumsum.cumsum(
      withTokens, orderCol, descending = false, Seq("n_tokens"))
    c.select(col(orderCol), col("n_tokens").cast("long").as("n_tokens"),
      floor((col("cum_n_tokens") - col("n_tokens")) / budget).cast("long").as("pack_id"))
  }
}
