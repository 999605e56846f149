package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, portable hashing, MinHash signatures, SimHash,
  * quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is a pure Column expression (native Spark SQL functions,
  * no UDFs) so whole-stage codegen applies and every operator is pushdown-
  * and oracle-friendly. The hash primitive is a 60-bit value derived from
  * md5 hex — NOT Spark's Murmur3 `hash()` — so the exact same value is
  * computable in any engine with md5 (the DuckDB correctness oracle uses
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`).
  *
  * Scale notes (100 TB): all per-document expressions are embarrassingly
  * parallel map work over the scan — no shuffle, no driver state. The only
  * shuffles in this family are the explicit groupBy/join operators in
  * [[Dedup]] and [[Similarity]].
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable 60-bit hash: first 15 hex digits of md5, as a non-negative
    * Long. Identical in DuckDB: CAST(concat('0x', substr(md5(s),1,15)) AS
    * BIGINT). */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("string")), 1, 15), 16, 10).cast("long")

  /** SQL fragment computing hash60 in the DuckDB dialect (for oracles). */
  def hash60Sql(inner: String): String =
    s"CAST(concat('0x', substr(md5($inner), 1, 15)) AS BIGINT)"

  /** Distinct word n-gram shingles (default 3): the unit set for MinHash /
    * Jaccard near-dedup. Documents shorter than n tokens yield an empty
    * set. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val make = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + lit(j + 1)).cast("int"))): _*))
    when(size(toks) >= n, array_distinct(make)).otherwise(array().cast("array<string>"))
  }

  /** Word n-grams WITHOUT per-document dedup (every occurrence kept) —
    * the repeated-passage mining unit, where occurrence COUNTS matter;
    * [[shingles]] distinct-s for set-similarity (MinHash/Jaccard). */
  def ngramsAll(toks: Column, n: Int): Column = {
    val make = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + lit(j + 1)).cast("int"))): _*))
    when(size(toks) >= n, make).otherwise(array().cast("array<string>"))
  }

  /** 16-bit SimHash over (non-distinct) tokens: bit i is set iff the sum of
    * ±1 votes from each token's hash bit i is positive. Near-duplicate
    * documents land at small Hamming distance. */
  def simhash16(toks: Column): Column = {
    val hashed = transform(toks, t => hash60(t))
    val bits = (0 until 16).map { i =>
      val vote = aggregate(
        hashed, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Order-sensitive document fingerprint: position-weighted sum of token
    * hashes mod a Mersenne prime — a rolling-hash analog that is exactly
    * reproducible in SQL without 64-bit overflow ((h mod p)·pos < 2^52). */
  def fingerprint(toks: Column): Column = {
    val p = 2147483647L // 2^31 − 1
    val withPos = zip_with(
      transform(toks, t => hash60(t) % p),
      sequence(lit(1L), size(toks).cast("long")),
      (h, i) => h * i)
    aggregate(withPos, lit(0L), (acc, x) => (acc + x) % p)
  }

  /** Fraction of tokens covered by the document's most frequent word
    * n-gram, as a pure array expression — shuffle-free, for stateless
    * streaming gates ([[graft.streaming.StreamingIngest]]). Quadratic in
    * the per-document n-gram count, which is fine for bounded stream
    * documents; unbounded batch corpora use
    * [[CorpusFilters.repetitionStats]] (keyed aggregation, linear)
    * instead — the two compute the identical capped fraction. */
  def topNgramFraction(toks: Column, n: Int): Column = {
    val grams = ngramsAll(toks, n)
    val top = array_max(transform(array_distinct(grams),
      g => size(filter(grams, x => x === g))))
    least(coalesce(top, lit(0)).cast("double") * lit(n.toDouble) /
      greatest(size(toks), lit(1)).cast("double"), lit(1.0))
  }

  /** Fixed English stopword list shared with the oracle SQL. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Stopword-ratio language-ID score: fraction of tokens in the English
    * stopword profile (n-gram-profile heuristic reduced to a word profile —
    * the corpus is whitespace-tokenizable). */
  def enStopwordRatio(toks: Column): Column = {
    val stop = array(EnStopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stop, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Document quality score in [0,1]: blend of length saturation, mean token
    * length plausibility and stopword presence — the shape of heuristic
    * quality filters used on web-scale corpora. */
  def qualityScore(textCol: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val meanTokLen = length(textCol).cast("double") / greatest(nTok, lit(1.0))
    val tokLenScore = when(meanTokLen >= 3.0 && meanTokLen <= 10.0, 1.0).otherwise(0.5)
    val stopScore = least(enStopwordRatio(toks) * lit(5.0), lit(1.0))
    (lenScore * 0.4 + tokLenScore * 0.3 + stopScore * 0.3)
  }
}
