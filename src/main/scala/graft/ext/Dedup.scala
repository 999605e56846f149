package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora: exact (content-hash),
  * MinHash+LSH near-duplicate pair mining, and n-gram Jaccard similarity.
  *
  * Scale design (100 TB): exact dedup is one hash-partitioned window (or
  * groupBy) on the 128-bit content hash — never a driver materialization.
  * Near-dedup NEVER goes all-pairs: candidate pairs come from a banded-LSH
  * bucket equi-join (shuffle on the band key), so work is proportional to
  * Σ bucket² over near-duplicate buckets, not n². Skewed buckets (boiler-
  * plate text) should be capped upstream via a bucket-size limit filter,
  * which `lshBuckets` exposes as a plain column for.
  */
object Dedup {

  /** Exact dedup by content hash, keeping the smallest `idCol` per group —
    * deterministic (unlike dropDuplicates) and therefore oracle-checkable.
    * One window over the hash-partitioned data; no shuffle beyond the hash
    * repartition. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature table (id, mh0..mh{k−1}) via the scalable
    * explode→hash→aggregate shape: each shingle is md5-hashed ONCE
    * (one row per (doc, shingle)), and signature slot k is a plain
    * `min(h1 + k·h2)` partial+final aggregation (double hashing,
    * Kirsch–Mitzenmacher). This keeps per-row expression work constant —
    * a giant document never inflates one task's expression tree — and
    * gives map-side combine for free. Docs with no shingles drop out. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: Column,
      numHashes: Int, shingleN: Int = 3): DataFrame = {
    require(numHashes <= 8, "double-hash construction supports <= 8 hashes")
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)
    val exploded = df.select(idCol.as("id"), explode(sh).as("s"))
      .select(col("id"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("s")), 17, 14), 16, 10).cast("long").as("h2"))
    exploded.groupBy("id")
      .agg(min(col("h1")).as("mh0"),
        (1 until numHashes).map(k => min(col("h1") + lit(k.toLong) * col("h2")).as(s"mh$k")): _*)
  }

  /** Per-document LSH bucket rows: (id, band, key) where key hashes
    * `rowsPerBand` consecutive signature slots. Near-duplicates agree on
    * ≥1 band key with high probability (s-curve of banded MinHash). Band
    * keys are cheap arithmetic over the k signature columns. */
  def lshBuckets(signatures: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val bandKey = (b: Int) =>
      md5(concat_ws("_",
        (0 until r).map(j => col(s"mh${b * r + j}").cast("string")): _*))
    signatures.select(col("id"),
      posexplode(array((0 until bands).map(bandKey): _*)).as(Seq("band", "key")))
  }

  /** Candidate near-duplicate pairs (idA < idB) from shared LSH buckets —
    * the bucket equi-join; distinct-ed because pairs can collide in several
    * bands. */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-duplicate mining end-to-end: shingle → signature →
    * banded buckets → candidate join → exact Jaccard verification ≥
    * `threshold`. Returns (id_a, id_b, jaccard). */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 8, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sig = minhashSignatures(df, textCol, col(idCol).cast("long"), numHashes, shingleN)
    val cands = candidatePairs(lshBuckets(sig, numHashes, bands))
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), shingleN)
    val docs = df.select(col(idCol).cast("long").as("id"), sh.as("sh"))
    cands
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Distinct character n-gram set of a string column (for char-level
    * near-dup detection). */
  def charNgrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      array_distinct(transform(
        sequence(lit(1), length(s) - lit(n - 1)),
        i => s.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
