package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** LSH bucket-size skew cap: one boilerplate text repeated N times lands
  * all N rows in the same buckets in EVERY band; without the cap the
  * candidate join contributes N·(N−1)/2 pairs from that bucket alone. */
class DedupSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("an over-cap boilerplate bucket contributes zero candidate pairs") {
    import spark.implicits._
    val boiler = "cookie notice please accept our terms and conditions to continue browsing"
    val rng = new scala.util.Random(5)
    def randText() = (0 until 30).map(_ => s"w${rng.nextInt(5000)}").mkString(" ")
    // 400 identical boilerplate docs + 50 random docs + one true near-dup pair
    val nearA = randText(); val nearB = nearA + " extra"
    val docs = ((0 until 400).map(i => (i.toLong, boiler)) ++
      (400 until 450).map(i => (i.toLong, randText())) ++
      Seq((900L, nearA), (901L, nearB))).toDF("doc_id", "text")

    val sigs = Dedup.minhashSignatures(docs, "text", $"doc_id".cast("long"), 16, 3)
    val buckets = Dedup.lshBuckets(sigs, 16, 4)
    val cappedPairs = Dedup.candidatePairs(buckets, maxBucketSize = 100).collect()
    // the 400-strong boilerplate buckets are dropped: ZERO pairs among ids < 400
    assert(!cappedPairs.exists(r => r.getLong(0) < 400 && r.getLong(1) < 400),
      "capped bucket must not contribute pairs")
    // the true near-dup pair still surfaces through its (small) buckets
    assert(cappedPairs.exists(r => r.getLong(0) == 900L && r.getLong(1) == 901L),
      "near-dup pair must survive the cap")
    // sanity: without the cap the boilerplate bucket floods the join
    val uncapped = Dedup.candidatePairs(buckets, maxBucketSize = 1000000).count()
    assert(uncapped >= 400L * 399 / 2, s"uncapped should flood: $uncapped")
  }
}
