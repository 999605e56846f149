package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality filters — the four canonical LLM-curation operators that
  * sit between cleaning/dedup ([[Dedup]]) and sampling/packing
  * ([[Curation]]) in a pretraining-data pipeline:
  *
  *  - [[decontaminate]] — eval-benchmark decontamination by n-gram overlap
  *    (the GPT-3 appendix-C / Dolma procedure): flag training documents
  *    sharing any n-gram with a held-out evaluation set.
  *  - [[repetitionStats]] — within-document repetition signals from the
  *    Gopher quality rules (Rae et al. 2021, §A1.1): fraction of tokens
  *    covered by the most frequent bigram and by duplicated trigrams,
  *    plus the keep/reject decision at the published-style thresholds.
  *  - [[unigramNll]] — per-document negative log-likelihood under the
  *    corpus unigram LM (the CCNet perplexity-filter shape, with the
  *    corpus itself as the language model).
  *  - [[dsirLogWeight]] — hashed-unigram importance weight
  *    log p_target/p_raw per document (DSIR, Xie et al. 2023), for
  *    importance resampling toward a target domain.
  *
  * Determinism contract: every per-token/per-bucket log term is quantized
  * to fixed-point micro-nats (`round(ln(·)·1e6)` as BIGINT) before any
  * aggregation, so per-document sums are pure integer arithmetic —
  * order-independent and engine-exact (the same portability contract as
  * [[TextOps.hash60]]; float sums over shuffled rows would be
  * order-dependent and could never hash-match a DuckDB oracle).
  *
  * Scale design (100 TB):
  *  - decontaminate: the benchmark n-gram set is small by definition
  *    (eval suites are ~10^5 docs), so it is broadcast — the corpus side
  *    is one map + one partial-aggregated groupBy on doc id, no corpus
  *    shuffle on the n-gram key.
  *  - repetitionStats: two aggregations keyed by (doc, gram) then doc —
  *    hash-partitioned, map-side combined, linear in corpus tokens.
  *  - unigramNll: the vocabulary is unbounded (like TF-IDF), so the
  *    token→count join is a shuffle join by design, NOT a broadcast.
  *  - dsirLogWeight: DSIR's entire point is the bounded hashed feature
  *    space — the per-bucket log-ratio table has `numBuckets` rows
  *    regardless of corpus size and is always broadcast.
  */
object CorpusFilters {

  /** Micro-nat quantization of a (natural-log) expression: BIGINT
    * `round(ln · 1e6)` — ties round away from zero in both Spark
    * (HALF_UP) and DuckDB. */
  private def microNats(lnExpr: Column): Column =
    round(lnExpr * lit(1e6), 0).cast("long")

  /** Benchmark decontamination (GPT-3 appendix C: 13-gram overlap; Dolma
    * uses paragraph+n-gram variants). Counts, per training document, the
    * distinct word `n`-grams it shares with ANY document of `benchmark`,
    * and flags documents with at least one overlap. Returns one row per
    * `docs` row: (idCol, n_overlap, contaminated 0/1).
    *
    * The benchmark n-gram set is deduplicated then broadcast: eval suites
    * are bounded, corpora are not — the corpus side never shuffles on the
    * n-gram key. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // tokens materialize as an ATTRIBUTE before the shingle lambda (the
    // Dedup.minhashSignatures pattern): an inlined split() subtree would
    // be re-evaluated at every element_at inside the transform —
    // O(tokens²) regex work per document.
    val benchNg = benchmark
      .select(TextOps.tokens(col(textCol)).as("_toks"))
      .select(explode(TextOps.shingles(col("_toks"), n)).as("ngram"))
      .distinct()
    val overlap = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), explode(TextOps.shingles(col("_toks"), n)).as("ngram"))
      .join(broadcast(benchNg), "ngram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol)).join(overlap, Seq(idCol), "left").select(
      col(idCol),
      coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
      (coalesce(col("n_overlap"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  /** Gopher-style within-document repetition stats (Rae et al. 2021
    * §A1.1, token-granularity analog of the character-fraction rules):
    *  - `top_bigram_frac`: fraction of tokens covered by occurrences of
    *    the document's most frequent bigram (reject > 0.20 in Gopher);
    *  - `dup_trigram_frac`: fraction of tokens covered by trigrams that
    *    occur more than once (overlap-ignoring, capped at 1 — the same
    *    convention as the public Gopher-rule reimplementations);
    *  - `repetition_keep`: 1 iff both fractions pass the thresholds.
    * Both fractions are ratios of integers rounded to 5 decimals, so the
    * keep decision compares identical doubles in any engine. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", topBigramMax: Double = 0.20,
      dupTrigramMax: Double = 0.18): DataFrame = {
    // _toks materializes as an ATTRIBUTE before any n-gram lambda (the
    // Dedup.minhashSignatures pattern — an inlined split() would be
    // re-evaluated per element_at: O(tokens²) regex per document), and ONE
    // exploded (doc, n, gram)→count aggregate serves both the top-bigram
    // and dup-trigram stats (they differ only in n), instead of two
    // separate explode+groupBy chains each recomputing the token arrays.
    val base = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("n_tok"),
        TextOps.ngramsAll(col("_toks"), 2).as("g2"),
        TextOps.ngramsAll(col("_toks"), 3).as("g3"))
    def tagged(n: Int, grams: Column): Column =
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    val stats = base
      .select(col(idCol), col("n_tok"),
        explode(concat(tagged(2, col("g2")), tagged(3, col("g3")))).as("gn"))
      .select(col(idCol), col("n_tok"), col("gn.n").as("n"), col("gn.g").as("g"))
      .groupBy(col(idCol), col("n_tok"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(when(col("n") === 2, col("c"))).as("top2"),
        sum(when(col("n") === 3 && col("c") >= 2, col("c") * 3)
          .otherwise(0L)).as("dup3"))
    val topFrac = round(
      least(coalesce(col("top2"), lit(0L)) * lit(2.0) / col("n_tok"), lit(1.0)), 5)
    val dupFrac = round(
      least(coalesce(col("dup3"), lit(0L)) * lit(1.0) / col("n_tok"), lit(1.0)), 5)
    base.select(col(idCol), col("n_tok"))
      .join(stats, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        topFrac.as("top_bigram_frac"), dupFrac.as("dup_trigram_frac"),
        (topFrac <= topBigramMax && dupFrac <= dupTrigramMax)
          .cast("long").as("repetition_keep"))
  }

  /** Per-document negative log-likelihood under the corpus unigram LM —
    * the CCNet/KenLM perplexity-filter shape (Wenzek et al. 2020) with
    * the corpus itself as the LM: nll(doc) = Σ_tok ln(N / count(tok)),
    * reported as integer micro-nats (`nll_micro_total`) plus `n_tokens`
    * so callers derive mean-NLL/perplexity buckets. High mean-NLL = rare
    * vocabulary = candidate for filtering.
    *
    * The token→corpus-count join shuffles on the token key by design: the
    * vocabulary is unbounded at corpus scale (same reasoning as TF-IDF —
    * a broadcast would OOM the executors on a real web corpus). */
  def unigramNll(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // perDocTok feeds both the vocabulary rollup and the final per-doc
    // join, and vocab feeds both the scoring and the corpus total. The
    // subtrees are NOT deduped by ReuseExchange (each consumer pushes
    // different isnotnull filters into its copy, so the canonicalized
    // exchanges differ) — without materialization the tokenize+explode+
    // aggregate pass over the corpus executes once per consumer. One
    // eager localCheckpoint per shared aggregate = one corpus pass total
    // (the same shared-intermediate pattern as [[Dedup]]'s CC rounds).
    val perDocTok = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vocab = perDocTok.groupBy("tok").agg(sum("c").as("cnt")).localCheckpoint()
    val total = vocab.agg(sum("cnt").as("total"))
    val scored = vocab.crossJoin(broadcast(total)) // 1-row scalar broadcast
      .select(col("tok"), microNats(log(col("total") / col("cnt"))).as("nll_micro"))
    perDocTok.join(scored, "tok").groupBy(col(idCol)).agg(
      sum("c").as("n_tokens"),
      sum(col("c") * col("nll_micro")).as("nll_micro_total"))
  }

  /** The full Gopher QUALITY rule set (Rae et al. 2021, §A1.1 — the
    * non-repetition half; repetition lives in [[repetitionStats]]):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (# and … marks), bullet-start / ellipsis-end line fractions,
    * alphabetic-word fraction, and minimum stop-word containment. All
    * map-only array expressions over tokens/lines staged as attributes;
    * each metric is emitted (5-dp rounded ratios over exact integer
    * sums, portable) alongside the composite `quality_keep`. */
  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val stop = array(TextOps.EnStopwords.map(lit): _*)
    val staged = docs.select(col(idCol), col(textCol).as("_t"),
        TextOps.tokens(col(textCol)).as("_toks"),
        split(col(textCol), "\n").as("_lines"))
      .withColumn("_n", size(col("_toks")))
      .withColumn("_nl", size(col("_lines")))
    val hashCount = length(col("_t")) - length(regexp_replace(col("_t"), "#", ""))
    // both ellipsis spellings: the three-dot literal AND U+2026 (the
    // single-character ellipsis ubiquitous in scraped snippets) — the
    // Gopher rule counts "… marks", and missing the Unicode form let
    // truncated-snippet pages through (r13 review)
    val ellCount =
      ((length(col("_t")) - length(regexp_replace(col("_t"), "\\.\\.\\.", ""))) / 3 +
        (length(col("_t")) - length(regexp_replace(col("_t"), "…", ""))))
        .cast("long")
    val metrics = staged.select(
      col(idCol),
      col("_n").cast("long").as("n_words"),
      round(aggregate(col("_toks"), lit(0L), (acc, w) => acc + length(w))
        .cast("double") / greatest(col("_n"), lit(1)), 5).as("mean_word_len"),
      round((hashCount + ellCount).cast("double") /
        greatest(col("_n"), lit(1)), 5).as("symbol_ratio"),
      round(size(filter(col("_lines"), l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("\u2022")))
        .cast("double") / greatest(col("_nl"), lit(1)), 5).as("bullet_frac"),
      round(size(filter(col("_lines"), l =>
        l.endsWith("...") || l.endsWith("…")))
        .cast("double") / greatest(col("_nl"), lit(1)), 5).as("ellipsis_frac"),
      // "token contains an ASCII letter" via a single translate pass —
      // same predicate as rlike("[A-Za-z]") without a per-token regex
      // engine invocation (the regex dominated this column's cost)
      round(size(filter(col("_toks"), w =>
        length(w) > length(translate(w,
          "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ", ""))))
        .cast("double") / greatest(col("_n"), lit(1)), 5).as("alpha_frac"),
      size(filter(stop, sw => array_contains(col("_toks"), sw)))
        .cast("long").as("stop_hits"))
    metrics.withColumn("quality_keep",
      (col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("stop_hits") >= minStopHits).cast("int"))
  }

  /** CCNet's head/middle/tail partition (Wenzek et al. 2020 §3.3): rank
    * documents by mean per-token NLL under the LM WITHIN each language
    * and cut into terciles — "head" = most fluent third. Mean NLL is an
    * exact integer (`div`), and ranks carry a doc-id tiebreak, so the
    * buckets are deterministic and engine-portable (the DuckDB oracle's
    * plain `ntile` reproduces them bit-for-bit).
    *
    * Scale shape (r13; was `ntile` over `Window.partitionBy(lang)` —
    * which funnels each language's ENTIRE document set through one task
    * for the sort+count, the classic skewed-stratum scale-killer on a
    * 60%-English 100 TB corpus): one range-partitioned
    * [[graft.data.DistributedCumsum]] over (lang, mean, id) yields the
    * stratum-local RANK (global running count minus the stratum's
    * prefix), and the ntile bucket is integer arithmetic over
    * (rank, stratum count) — first n%b groups of size ⌈n/b⌉, the rest
    * ⌊n/b⌋, exactly SQL ntile's distribution. No per-stratum window;
    * parallelism is corpus-wide regardless of language skew. */
  def ccnetBuckets(docs: DataFrame, langCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val nll = unigramNll(docs, idCol, textCol)
    // mean micro-nats per token via INTEGER division (`div`, not `/`:
    // the double quotient can round up across an integer boundary and
    // then truncate differently than DuckDB's floor `//`)
    val joined = docs.select(col(idCol), col(langCol)).join(nll, idCol)
      .withColumn("mean_nll_micro", expr("nll_micro_total div n_tokens"))
      .withColumn("_one", lit(1.0))
    val c = graft.data.DistributedCumsum.cumsum(joined,
      Seq(col(langCol).asc, col("mean_nll_micro").asc, col(idCol).asc),
      Seq("_one"))
    val stats = c.groupBy(col(langCol))
      .agg(min(col("cum__one")).cast("long").as("_first"),
        count(lit(1)).as("_n"))
      .withColumnRenamed(langCol, "_lang_s")
    // stratum-local rank 1..n; ntile bucket via exact integer ceils:
    // ⌈x/y⌉ = (x + y − 1) div y — no float division near boundaries
    c.join(broadcast(stats), col(langCol) <=> col("_lang_s"))
      .withColumn("_rank", (col("cum__one").cast("long") - col("_first") + 1))
      .withColumn("_q", expr(s"_n div $buckets"))
      .withColumn("_rem", expr(s"_n % $buckets"))
      .withColumn("_cut", col("_rem") * (col("_q") + 1))
      .withColumn("bucket",
        when(col("_rank") <= col("_cut"),
          expr("(_rank + _q) div (_q + 1)"))
          .otherwise(expr("_rem + (_rank - _cut + _q - 1) div _q"))
          .cast("int"))
      .withColumn("tier",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === buckets, "tail")
          .otherwise("middle"))
      .drop("_one", "cum__one", "_lang_s", "_first", "_n", "_rank",
        "_q", "_rem", "_cut")
  }

  /** Per-document NLL under the corpus BIGRAM LM with Jelinek–Mercer
    * interpolation to the unigram (the CCNet/KenLM perplexity-filter
    * ladder, one rung up from [[unigramNll]]):
    * nll(doc) = Σ_bigrams −ln( λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/N )
    * where c(w1·) is the bigram-context count (Σ over bigrams starting
    * w1 — NOT c(w1), which over-counts document-final tokens) and N the
    * corpus token total. Reported as integer micro-nats
    * (`nll_micro_total`) with `n_bigrams`, so callers derive mean
    * NLL/perplexity. Documents with fewer than 2 tokens have no bigrams
    * and drop out (they are [[unigramNll]]'s territory).
    *
    * Scale: both count tables are vocabulary-sized (unbounded), so every
    * lookup is a shuffle join by design — same reasoning as
    * [[unigramNll]]/TF-IDF. The interpolation keeps every probability
    * strictly positive (c(w2) ≥ 1 for any observed token), so no
    * smoothing constants beyond λ. */
  def bigramNll(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    // _toks as an attribute first — same re-inlining hazard as
    // [[repetitionStats]]/[[decontaminate]]. Shared aggregates are
    // localCheckpoint'd for the same reason as [[unigramNll]]: perDocBi
    // has two consumers and biCounts/uni two each, and the consumers'
    // divergent pushed filters defeat ReuseExchange — unmaterialized,
    // the corpus tokenize+explode pass ran THREE times (measured 2.5×
    // slower at sf0.01) instead of twice (once per n-gram order).
    val perDocBi = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), explode(TextOps.ngramsAll(col("_toks"), 2)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val biCounts = perDocBi.groupBy("g").agg(sum("c").as("cb"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
      .localCheckpoint()
    val ctx = biCounts.groupBy("w1").agg(sum("cb").as("cctx"))
    val uni = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
      .localCheckpoint()
    val total = uni.agg(sum("cu").as("n"))
    val scored = biCounts
      .join(ctx, "w1")
      .join(uni.withColumnRenamed("tok", "w2"), "w2")
      .crossJoin(broadcast(total)) // 1-row scalar broadcast
      .select(col("g"), microNats(-log(
        lit(lambda) * col("cb") / col("cctx") +
          lit(1.0 - lambda) * col("cu") / col("n"))).as("nll_micro"))
    perDocBi.join(scored, "g").groupBy(col(idCol)).agg(
      sum("c").as("n_bigrams"),
      sum(col("c") * col("nll_micro")).as("nll_micro_total"))
  }

  /** End-to-end curation pipeline in production stage order: exact dedup
    * → Gopher repetition gate → benchmark decontamination → deterministic
    * stratified sample. Returns the surviving rows of `docs` with all
    * original columns, ready for [[Curation.packSequences]].
    *
    * Cheap exact dedup runs FIRST so every n-gram stage sees only unique
    * survivors (the composition the 20× scale probe measured for the
    * near-dup miner — collapse byte-identical replicas before any
    * quadratic-in-duplicates work). The two n-gram gates are keep-lists
    * applied as left-semi joins on the doc id — no row data moves through
    * the gate shuffles, only ids. */
  def curate(docs: DataFrame, benchmark: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      topBigramMax: Double = 0.20, dupTrigramMax: Double = 0.18): DataFrame = {
    // one corpus pass for the dedup window: `unique` feeds both gate
    // branches and the survivor spine, whose divergent pruned projections
    // defeat ReuseExchange (the [[unigramNll]] lesson) — without the
    // localCheckpoint the corpus-wide md5-window shuffle executes once
    // per consumer (r13 review)
    val unique = Dedup.exactDedup(docs, textCol, idCol).localCheckpoint()
    val repKeep = repetitionStats(unique, idCol, textCol, topBigramMax, dupTrigramMax)
      .where(col("repetition_keep") === 1).select(col(idCol))
    val cleanKeep = decontaminate(unique, benchmark, n, idCol, textCol)
      .where(col("contaminated") === 0).select(col(idCol))
    val survivors = unique
      .join(repKeep, Seq(idCol), "left_semi")
      .join(cleanKeep, Seq(idCol), "left_semi")
    Curation.stratifiedSample(survivors, strataCol, rates, defaultRate, idCol)
  }

  /** DSIR importance log-weight (Xie et al. 2023): hashed-unigram bucket
    * counts over the target subset (rows where `isTarget`) vs the full
    * corpus, add-1 smoothed; per document,
    * w(doc) = Σ_tok ln( p_target(bucket(tok)) / p_raw(bucket(tok)) ),
    * reported as integer micro-nats (`dsir_micro`). Documents with
    * positive weight look more target-like than the corpus average;
    * resample proportionally to exp(w) (or threshold) to shift the
    * mixture toward the target domain.
    *
    * The bucket table is `numBuckets` rows regardless of corpus size —
    * bounded by construction (DSIR's hashed feature space) — so the
    * per-token lookup join is always a broadcast. */
  def dsirLogWeight(docs: DataFrame, isTarget: Column, numBuckets: Int = 512,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    // ONE tokenize+explode pass (r13; was two — the bucket table and the
    // per-doc aggregate each re-ran the corpus explode, and their
    // different exchanges defeat ReuseExchange): aggregate to
    // (doc, bucket, count, is_t) once, localCheckpoint (the
    // [[unigramNll]] shared-intermediate pattern), and derive both the
    // bucket table and the per-doc weights from that — the intermediate
    // is ≤ docs × numBuckets rows, far below the exploded token stream
    val perDocBucket = docs
      .select(col(idCol), isTarget.cast("long").as("is_t"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col(idCol), col("is_t"),
        pmod(TextOps.hash60(col("tok")), lit(numBuckets.toLong)).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"), max(col("is_t")).as("is_t"))
      .localCheckpoint()
    val buckets = perDocBucket.groupBy("b")
      .agg(sum("c").as("raw_c"), sum(col("c") * col("is_t")).as("tgt_c"))
    val totals = buckets.agg(sum("raw_c").as("R"), sum("tgt_c").as("T"))
    val nb = lit(numBuckets.toDouble)
    val scored = buckets.crossJoin(broadcast(totals)) // 1-row scalar broadcast
      .select(col("b"), microNats(log(
        ((col("tgt_c") + lit(1.0)) / (col("T") + nb)) /
          ((col("raw_c") + lit(1.0)) / (col("R") + nb)))).as("w_micro"))
    perDocBucket.join(broadcast(scored), "b")
      .groupBy(col(idCol)).agg(
        sum("c").as("n_tokens"),
        sum(col("c") * col("w_micro")).as("dsir_micro"))
  }
}
