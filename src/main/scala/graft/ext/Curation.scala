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

  /** One rate-table computation behind [[temperatureRates]] /
    * [[temperatureRatesUnclamped]] (they differ only in the clamp).
    *
    * Determinism contract: per-stratum counts are collected (bounded —
    * strata are languages/sources), the weight sum accumulates
    * left-to-right in stratum-sorted order (an unordered float sum would
    * differ across engines in the last ulp), and each rate is quantized
    * to an integer micro-rate (round-half-up) before the same md5-coin
    * predicate as [[stratifiedSample]].
    *
    * NULL strata are excluded from the table: a null stratum has no
    * n^alpha identity, and the samplers' rate lookup gives unlisted
    * strata rate 0 — so null-stratum rows are deterministically DROPPED
    * (tag unknowns explicitly upstream). Pre-r13 the `toString` on the
    * null group key crashed the driver instead.
    *
    * Scale: one tiny count aggregate to the driver, then a map-side
    * predicate — no shuffle of the corpus. */
  private def rateTable(df: DataFrame, strataCol: String, alpha: Double,
      targetFraction: Double, clamp: Boolean): Seq[(String, Long, Long)] = {
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
      .sortBy(_._1)
    val total = counts.map(_._2).sum
    var wsum = 0.0
    val weights = counts.map { case (s, n) =>
      val w = math.pow(n.toDouble, alpha); wsum += w; (s, n, w)
    }
    weights.map { case (s, n, w) =>
      val raw = targetFraction * total * (w / wsum) / n
      val rate = if (clamp) math.min(1.0, raw) else raw
      (s, n, math.round(rate * 1e6))
    }.toSeq
  }

  /** The per-stratum rate table of [[temperatureSample]]:
    * (stratum, n_docs, rate_micro), stratum-sorted, clamped at rate 1.
    * One tiny aggregate to the driver (strata are bounded by
    * construction); see [[rateTable]] for the determinism and
    * null-stratum contract. */
  def temperatureRates(df: DataFrame, strataCol: String, alpha: Double,
      targetFraction: Double): Seq[(String, Long, Long)] =
    rateTable(df, strataCol, alpha, targetFraction, clamp = true)

  /** Unclamped variant of [[temperatureRates]] — rates above 1 mean the
    * stratum is REPLICATED (epochs over low-resource data, the actual
    * multilingual-mix semantics when alpha pushes mass toward small
    * strata). Same determinism contract. */
  def temperatureRatesUnclamped(df: DataFrame, strataCol: String,
      alpha: Double, targetFraction: Double): Seq[(String, Long, Long)] =
    rateTable(df, strataCol, alpha, targetFraction, clamp = false)

  /** Temperature MIXING with upsampling: every row is emitted
    * ⌊rate⌋ + coin(frac(rate)) times with a `copy_id` column
    * (0-based) — deterministic (the fractional coin is the same
    * md5-coin as [[stratifiedSample]]), so epochs over low-resource
    * strata reproduce across reruns/retries. Map-side explode over a
    * per-row sequence; no shuffle. */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetFraction: Double,
      salt: String = "mix"): DataFrame = {
    val rates = temperatureRatesUnclamped(df, strataCol, alpha, targetFraction)
    val rateExpr = rates.foldLeft(lit(0L)) {
      case (acc, (v, _, m)) => when(col(strataCol) === v, lit(m)).otherwise(acc)
    }
    val whole = (col("rate_micro") / lit(1000000L)).cast("long")
    val fracMicro = col("rate_micro") % lit(1000000L)
    val extra = (hashFraction(col(keyCol), salt) * lit(1e6) < fracMicro).cast("long")
    df.withColumn("rate_micro", rateExpr)
      .withColumn("n_copies", (whole + extra).cast("int"))
      .where(col("n_copies") > 0)
      .select(col("*"), explode(sequence(lit(0), col("n_copies") - 1)).as("copy_id"))
  }

  /** Temperature-weighted mixture sampling — the multilingual/multi-source
    * pretraining mix rule (XLM-R §3.1, mT5: sample stratum l with
    * p_l ∝ n_l^alpha, alpha<1 up-weighting low-resource strata): keep
    * rates are allocated so the EXPECTED kept volume is
    * `targetFraction`·N, split across strata by n_l^alpha, clamped at 1.
    * Appends `rate_micro`; see [[rateTable]] for the determinism and
    * null-stratum contract. */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double, targetFraction: Double,
      salt: String = "temp"): DataFrame = {
    val rates = temperatureRates(df, strataCol, alpha, targetFraction)
    val rateExpr = rates.foldLeft(lit(0L)) {
      case (acc, (v, _, m)) => when(col(strataCol) === v, lit(m)).otherwise(acc)
    }
    df.withColumn("rate_micro", rateExpr)
      .where(hashFraction(col(keyCol), salt) < col("rate_micro") / lit(1e6))
  }

  /** Sliding-window token chunking (the HF-style stride split that
    * prepares documents for embedding/retrieval): chunk k covers tokens
    * [k·stride, k·stride + chunkSize), k = 0 .. ⌊(n−1)/stride⌋ — every
    * token lands in ≥1 chunk, tail chunks may be short, stride <
    * chunkSize gives overlap. One row per chunk via posexplode; pure
    * map-side array arithmetic, no shuffle. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    // the full-coverage contract ("every token lands in ≥1 chunk") only
    // holds when consecutive chunks at least touch; a swapped-argument
    // call would otherwise SILENTLY drop the tokens between chunks
    require(stride <= chunkSize,
      s"stride ($stride) must be <= chunkSize ($chunkSize) for full coverage")
    val staged = df.select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
    val chunks = when(col("_n") > 0,
      transform(
        sequence(lit(0), floor((col("_n") - 1) / stride).cast("int")),
        k => slice(col("_toks"), k * stride + 1, lit(chunkSize))))
      .otherwise(array().cast("array<array<string>>"))
    staged.select(col(idCol), col("_n").as("n_tokens"),
        posexplode(chunks).as(Seq("chunk_id", "_chunk")))
      .select(col(idCol), col("chunk_id"),
        size(col("_chunk")).as("n_chunk_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
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

  /** Per-stratum TOKEN-budget selection — the "give me a 1T-token en +
    * 200B-token de mix" primitive: within each stratum, documents are
    * taken in deterministic `idCol` order until the stratum's token
    * budget is exhausted (a document is kept iff its INCLUSIVE running
    * token count fits the budget — no partial documents). Unlike
    * [[stratifiedSample]] (a per-doc rate coin), the budget is a hard
    * token-count contract, which is how pretraining mixes are actually
    * specified.
    *
    * Scale shape: ONE global range-partitioned cumulative sum over
    * (stratum, id) ([[graft.data.DistributedCumsum]] — no single-task
    * window, no per-stratum pass), then each stratum's running count is
    * recovered by subtracting the stratum's global prefix (a tiny
    * per-stratum aggregate, broadcast back). Map-side predicate after
    * that; text never shuffles (only id/stratum/token-count ride the
    * range exchange).
    *
    * Returns (idCol, strataCol, n_tokens, cum_tokens) for kept docs,
    * cum_tokens = the stratum-local inclusive running count. */
  def takeTokenBudget(df: DataFrame, strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    takeTokenBudgetOrdered(df, strataCol, budgets, defaultBudget,
      None, idCol, textCol)

  /** [[takeTokenBudget]] with a QUALITY order: within each stratum, docs
    * are taken highest-`scoreCol`-first (id tiebreak) until the token
    * budget fills — "the best N tokens per language", the
    * quality-threshold curation rule (take by classifier score /
    * perplexity rank, cut at the budget) rather than id order. Same
    * determinism and scale shape as [[takeTokenBudget]]: the score only
    * changes the cumsum's order key; one range-partitioned pass, text
    * never shuffles, no per-stratum window. */
  def takeTokenBudgetByScore(df: DataFrame, strataCol: String,
      scoreCol: String, budgets: Map[String, Long], defaultBudget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    takeTokenBudgetOrdered(df, strataCol, budgets, defaultBudget,
      Some(scoreCol), idCol, textCol)

  private def takeTokenBudgetOrdered(df: DataFrame, strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      scoreDescCol: Option[String], idCol: String, textCol: String): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    // the optional score rides the cumsum projection only as an order
    // key (highest first); the id tiebreak keeps the key tuple unique
    // as the cumsum's determinism contract requires
    val withTokens = df.select(Seq(col(idCol), col(strataCol)) ++
      scoreDescCol.map(col) :+
      size(TextOps.tokens(col(textCol))).cast("double").as("_nt"): _*)
    val order = Seq(col(strataCol).asc) ++
      scoreDescCol.map(s => col(s).desc) :+ col(idCol).asc
    val c = graft.data.DistributedCumsum.cumsum(withTokens, order, Seq("_nt"))
    // stratum's global prefix = min over the stratum of the EXCLUSIVE
    // cumsum. The min is order-agnostic within the stratum (stratum is
    // the leading order key so its rows are contiguous, and _nt >= 0
    // keeps the exclusive cumsum minimal at the stratum's first global
    // row) — which is what keeps this shared body correct for BOTH the
    // id-order and the score-desc order paths; do not "simplify" to a
    // first()-style lookup that assumes id order
    val prefix = c.groupBy(col(strataCol))
      .agg(min(col("cum__nt") - col("_nt")).as("_pre"))
      .withColumnRenamed(strataCol, "_strat_pre")
    val budget = coalesce(
      try_element_at(typedLit(budgets), col(strataCol)), lit(defaultBudget))
    // null-safe equality: a NULL stratum (untagged docs) forms its own
    // budget group under defaultBudget — a plain equi-join would drop
    // those rows silently (NULL never equals NULL), inconsistent with
    // stratifiedSample's null handling (r13 review)
    c.join(broadcast(prefix), col(strataCol) <=> col("_strat_pre"))
      .select(col(idCol), col(strataCol),
        col("_nt").cast("long").as("n_tokens"),
        (col("cum__nt") - col("_pre")).cast("long").as("cum_tokens"))
      .where(col("cum_tokens") <= budget)
  }

  /** Deterministic epoch shuffle + sharding — the "global shuffle" stage
    * of training-data serving (each epoch re-permutes the corpus under a
    * fresh salt; shard files feed the data loaders): `shard` =
    * hash60(id‖salt) mod `numShards`, and `shard_pos` is the row's
    * 0-based rank within its shard under the (hash, id) order. Together
    * they are a full deterministic permutation of the corpus —
    * reproducible across reruns, task retries, and engines (the md5-based
    * [[TextOps.hash60]] is the same coin as [[stratifiedSample]]), which
    * `df.orderBy(rand())` fundamentally is not on a cluster.
    *
    * Returns (idCol, shard, shard_pos) only — join back to the payload on
    * idCol to write shard files, so the wide text/media columns never
    * ride this shuffle.
    *
    * Scale (100 TB): one range-partitioned
    * [[graft.data.DistributedCumsum]] over (shard, hash, id) gives every
    * row its within-shard rank — a `row_number` over
    * `Window.partitionBy(shard)` would instead sort EACH SHARD in a
    * single task (with 1024 shards over 100 TB that is a ~100 GB
    * single-task sort); the cumsum's range sort keeps parallelism
    * corpus-wide — then the per-shard prefix (numShards scalar rows)
    * broadcasts back.
    *
    * NULL ids are dropped EXPLICITLY (same contract as the null-stratum
    * rule in [[rateTable]]): a null id has no hash identity to permute,
    * and duplicate (all-null) order keys would violate the cumsum's
    * unique-key determinism contract — tag rows with real ids upstream. */
  def epochShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "epoch0"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val base = df.where(col(idCol).isNotNull).select(col(idCol),
        TextOps.hash60(concat(col(idCol).cast("string"), lit("_" + salt)))
          .as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)).cast("int"))
      .withColumn("_one", lit(1.0))
    val c = graft.data.DistributedCumsum.cumsum(base,
      Seq(col("shard").asc, col("_h").asc, col(idCol).asc), Seq("_one"))
    val firsts = c.groupBy(col("shard"))
      .agg(min(col("cum__one")).cast("long").as("_first"))
      .withColumnRenamed("shard", "_sh")
    c.join(broadcast(firsts), col("shard") === col("_sh"))
      .select(col(idCol), col("shard"),
        (col("cum__one").cast("long") - col("_first")).as("shard_pos"))
  }

  /** Byte-packed shard assignment — [[epochShards]]' sibling for when
    * shards target a SIZE rather than a count (the WebDataset
    * convention: ~1 GB tar shards regardless of document length; count
    * balancing skews shard bytes when document sizes vary by orders of
    * magnitude): deterministic hash permutation of the ids, then
    * first-fit linear packing along ONE range-partitioned byte cumsum —
    * shard k holds the documents whose preceding permuted bytes fall in
    * [k·targetBytes, (k+1)·targetBytes), so a document straddling a
    * boundary belongs to the shard where it STARTS and every shard
    * lands within one document of the target. Same scale shape as
    * [[epochShards]]: no per-shard window, no single-task sort, the
    * payload never rides the shuffle (join it back by id). Returns
    * (idCol, n_bytes, shard). Rows with null id or size are dropped;
    * negative sizes are rejected loudly map-side (they would silently
    * corrupt every later boundary). `salt` re-rolls the permutation.
    * A document LARGER than `targetBytes` spans several windows: it
    * belongs to the shard where it starts and the numbering skips the
    * windows it covers — shard ids are deterministic but not
    * necessarily dense ([[graft.sources.TarShards.writeShards]] names
    * files by id, so gaps are harmless). */
  def packShardsBySize(df: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long, salt: String = "pack0"): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sz0 = col(sizeCol).cast("long")
    val base = df.where(col(idCol).isNotNull && sz0.isNotNull)
      .select(col(idCol),
        when(sz0 < 0, raise_error(concat(
            lit("packShardsBySize: negative size for id "),
            col(idCol).cast("string"))))
          .otherwise(sz0).cast("double").as("_sz"),
        TextOps.hash60(concat(col(idCol).cast("string"), lit("_" + salt)))
          .as("_h"))
    val c = graft.data.DistributedCumsum.cumsum(base,
      Seq(col("_h").asc, col(idCol).asc), Seq("_sz"))
    // exact in doubles to 2^53 bytes (≫ any corpus) — and the DuckDB
    // oracle floors the identical quotient. Shard ids are LONG:
    // totalBytes/targetBytes can exceed Int.MaxValue at corpus scale,
    // and a non-ANSI int cast would wrap silently to negative ids
    // (which writeShards rejects — but only after corrupting any other
    // consumer)
    c.select(col(idCol), col("_sz").cast("long").as("n_bytes"),
      floor((col("cum__sz") - col("_sz")) / lit(targetBytes.toDouble))
        .cast("long").as("shard"))
  }
}
