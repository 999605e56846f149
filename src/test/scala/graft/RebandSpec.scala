package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** The banded tier's RE-BAND lifecycle (r18): the persisted artifact is
  * the signature table, so retuning the s-curve (bands × rows) is a
  * map-only band-key recompute off stored slots — never a corpus
  * re-read. Pins (a) rebandSignatures ≡ lshBuckets ≡ the streaming
  * twin's sigBandKeys derivation, bit for bit, (b) re-banded-from-
  * snapshot ≡ fresh-built-from-text, (c) _gen carried, and (d) the
  * recall direction the retune exists for. */
class RebandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs = {
    import spark.implicits._
    // fully-distinct token streams per doc (J ≈ 0 between any two), so
    // the only near-duplicate structure is what a fixture class adds
    (0 until 40).map(i => (i.toLong,
      (0 until 28).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("rebandSignatures == lshBuckets == sigBandKeys on stored slots; fresh-build parity; _gen carried") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, "text", col("doc_id"), 16)
      .localCheckpoint()
    for (b <- Seq(1, 2, 4, 8)) {
      val reb = Dedup.rebandSignatures(sigs, 16, b)
      assert(reb.columns.toSeq == Seq("id", "band", "key"))
      val lsh = Dedup.lshBuckets(sigs, 16, b)
      assert(reb.except(lsh).isEmpty && lsh.except(reb).isEmpty, s"bands=$b")
      // streaming-twin parity: the same keys from the array spelling
      val sigArr = array((0 until 16).map(k => col(s"mh$k")): _*)
      val viaArr = sigs.select(col("id"),
        posexplode(Dedup.sigBandKeys(sigArr, 16, b)).as(Seq("band", "key")))
      assert(reb.except(viaArr).isEmpty && viaArr.except(reb).isEmpty, s"bands=$b arr")
    }
    // re-banded from the STORED table == fresh-built from text (the
    // no-corpus-re-read claim: stored slots are sufficient)
    val fresh = Dedup.lshBuckets(
      Dedup.minhashSignatures(docs, "text", col("doc_id"), 16), 16, 8)
    val reb8 = Dedup.rebandSignatures(sigs, 16, 8)
    assert(reb8.except(fresh).isEmpty && fresh.except(reb8).isEmpty)
    // _gen carried untouched on a stamped snapshot
    val rebG = Dedup.rebandSignatures(
      Dedup.stampSignatureGeneration(sigs, 4L, 16), 16, 4)
    assert(rebG.columns.toSeq == Seq("id", "band", "key", "_gen"))
    assert(rebG.select("_gen").distinct().as[Long].collect().toSeq == Seq(4L))
    assert(rebG.drop("_gen").except(Dedup.rebandSignatures(sigs, 16, 4)).isEmpty)
    // shape guards
    intercept[IllegalArgumentException] {
      Dedup.rebandSignatures(docs, 16, 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.rebandSignatures(sigs, 16, 5)
    }
  }

  test("re-banding moves recall in the s-curve direction: bands=1 passes the appended class, bands=8 blocks it") {
    import spark.implicits._
    val prior = docs.where($"doc_id" % 3 =!= 0)
    val sigs = Dedup.minhashSignatures(prior, "text", col("doc_id"), 16)
      .localCheckpoint()
    val replicas = prior.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" sur1 sur2 sur3 sur4")).as("text"))
    val novel = docs.where($"doc_id" % 3 === 0)
    val batch = novel.unionByName(replicas)
    def keptReplicas(bands: Int): Long =
      Dedup.incrementalBandedNearDedup(batch, sigs, numHashes = 16,
          bands = bands, threshold = 0.6, maxBucketSize = 1000)
        .where($"doc_id" >= 1000).count()
    val nRep = replicas.count()
    val stale = keptReplicas(1)
    val rebanded = keptReplicas(8)
    // r=16 banding is effectively signature equality — most appended
    // replicas never candidate; r=2 banding catches them
    assert(stale > rebanded, s"stale=$stale rebanded=$rebanded")
    assert(rebanded <= nRep / 4, s"rebanded=$rebanded of $nRep")
    // novel docs survive both operating points
    assert(Dedup.incrementalBandedNearDedup(novel, sigs, numHashes = 16,
      bands = 8, threshold = 0.6, maxBucketSize = 1000).count() == novel.count())
  }

  test("nearDupKeysFromSignatures on the stored table == nearDupKeys from text") {
    import spark.implicits._
    // include shingle-less docs (< 3 tokens) so the md5 fallback branch —
    // which fromSignatures must take from the DOCS side, since those rows
    // never enter the signature table — is exercised, plus an exact pair
    val short = Seq((100L, "one two"), (101L, "lone"), (102L, "one two"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(short)
    val sigs = Dedup.minhashSignatures(all, "text", col("doc_id"), 16)
      .localCheckpoint()
    val fromText = Dedup.nearDupKeys(all, numHashes = 16)
    val fromSigs = Dedup.nearDupKeysFromSignatures(sigs, all, numHashes = 16)
    // multiset equality (duplicate keys matter: the two identical short
    // docs must contribute two fallback rows on both routes)
    val a = fromText.groupBy("_key").count()
    val b = fromSigs.groupBy("_key").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(fromSigs.count() == all.count())
  }
}
