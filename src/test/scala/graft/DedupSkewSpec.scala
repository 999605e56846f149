package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** LSH bucket-size skew cap: one boilerplate text repeated N times lands
  * all N rows in the same buckets in EVERY band; without the cap the
  * candidate join contributes N·(N−1)/2 pairs from that bucket alone. */
class DedupSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("sigBandKeys matches lshBuckets' band keys bit-for-bit (parity-critical)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(11)
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 25).map(_ => s"w${rng.nextInt(300)}").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", $"doc_id", 16, 3)
    val viaColumns = Dedup.lshBuckets(sigs, 16, 4)
      .select("id", "band", "key").as[(Long, Int, String)].collect().toSet
    val viaArray = sigs
      .select(col("id"), posexplode(Dedup.sigBandKeys(
        array((0 until 16).map(k => col(s"mh$k")): _*), 16, 4)).as(Seq("band", "key")))
      .as[(Long, Int, String)].collect().toSet
    assert(viaColumns == viaArray,
      "the streaming gate's array-form band keys must equal the batch bucket keys")
    assert(viaColumns.size == 40 * 4)
  }

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

  test("withMinhashSignature is bit-identical to the explode-aggregate batch shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(9)
    val docs = ((0 until 40).map { i =>
      (i.toLong, (0 until 5 + rng.nextInt(40)).map(_ => s"w${rng.nextInt(200)}").mkString(" "))
    } :+ (99L, "xx")) // shingle-less short doc
      .toDF("doc_id", "text")
    val k = 96 // spans two salt groups
    val arr = Dedup.withMinhashSignature(docs, "text", "sig", k)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val agg = Dedup.minhashSignatures(docs, "text", col("doc_id"), k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(j => r.getLong(j))).toMap
    // shingle-less docs drop out of the aggregate shape, get [] in the row shape
    assert(arr(99L).isEmpty && !agg.contains(99L))
    agg.foreach { case (id, sig) =>
      assert(arr(id) == sig, s"doc $id: row-shape and batch-shape signatures differ")
    }
    assert(agg.size == 40)
  }
}
