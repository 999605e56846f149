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

  test("keepBestPerCluster: aggregate argmax is row-identical to the window path on a mega-cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // one mega-component (ids 0..4999 star-chained through hub 0) dwarfing
    // everything else, two small clusters with SCORE TIES, and a tail of
    // unclustered docs — the shape that serialized the old per-cluster
    // row_number window into one sorting task
    val mega = (1 until 5000).map(i => (0L, i.toLong))
    val smallA = Seq((6000L, 6001L), (6001L, 6002L)) // scores tie below
    val smallB = Seq((7000L, 7001L))
    val pairs = (mega ++ smallA ++ smallB).toDF("id_a", "id_b")
    val docs = ((0 until 5000).map(i => (i.toLong, (i % 97).toLong)) ++
      Seq((6000L, 5L), (6001L, 5L), (6002L, 5L)) ++ // tie: smallest id wins
      Seq((7000L, 1L), (7001L, 9L)) ++
      (8000 until 8050).map(i => (i.toLong, i.toLong))) // unclustered
      .toDF("doc_id", "score")
    val got = Dedup.keepBestPerCluster(docs, pairs, col("score"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // reference: the pre-r16 window spelling over the same labels
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label"))
    val withL = docs.select(col("doc_id"), col("score").as("_score"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_score"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("_score").desc, col("doc_id").asc)
    val want = withL.withColumn("_rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"),
        (col("_rn") === 1).cast("long").as("kept"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == docs.count())
    assert(got.toSeq == want.toSeq,
      "aggregate-argmax keep-best must be row-identical to the window path")
    // spot-check the semantics directly: mega-cluster keeps the max score
    // (96, smallest id carrying it = 96); the tied small cluster keeps 6000
    assert(got.filter(_._3 == 1L).map(_._1).toSet.contains(96L))
    assert(got.find(_._1 == 6000L).get._3 == 1L)
    assert(got.find(_._1 == 6001L).get._3 == 0L)
    assert((8000 until 8050).forall(i => got.find(_._1 == i.toLong).get._3 == 1L))
  }

  test("connectedComponents maxClusterSize loud-rejects a monster component") {
    import spark.implicits._
    val pairs = ((1 until 200).map(i => (0L, i.toLong)) :+ (500L, 501L))
      .toDF("id_a", "id_b")
    for (alg <- Seq("propagation", "star")) {
      val e = intercept[IllegalStateException] {
        Dedup.connectedComponents(pairs, "id_a", "id_b",
          algorithm = alg, maxClusterSize = 100L).collect()
      }
      assert(e.getMessage.contains("200 members"), s"$alg: ${e.getMessage}")
      // under the cap (or cap off) the labels come back untouched
      assert(Dedup.connectedComponents(pairs, "id_a", "id_b",
        algorithm = alg, maxClusterSize = 500L).count() == 202)
    }
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
