package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Distributed min-label-propagation connected components
  * (`Dedup.connectedComponents`) over hand-built graphs with known
  * component structure. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    Dedup.connectedComponents(df, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components, a chain and a triangle, resolve to their min ids") {
    // chain 1-2-3-4 (diameter 3 forces multiple propagation rounds),
    // triangle 10-11-12, and an isolated pair 20-21
    val labels = cc(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (12L, 10L),
      (11L, 12L), (21L, 20L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the iteration cap") {
    // 0-1-2-...-19: worst-case diameter for label propagation
    val labels = cc((0L until 19L).map(i => (i, i + 1)))
    assert(labels.size == 20)
    assert(labels.values.forall(_ == 0L))
  }

  test("non-convergence within maxIter fails loudly, not silently-wrong labels") {
    import spark.implicits._
    // diameter-19 path cannot finish in 3 rounds; partially-propagated
    // labels must never be handed back as canonical component ids
    val df = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponents(df, "a", "b", maxIter = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("duplicate and reversed pairs do not change the result") {
    val labels = cc(Seq((5L, 6L), (6L, 5L), (5L, 6L), (6L, 7L)))
    assert(labels == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  private def ccStar(pairs: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    Dedup.connectedComponents(df, "a", "b", maxIter, algorithm = "star").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("large-star/small-star matches propagation on random graphs") {
    val rng = new scala.util.Random(47)
    for (trial <- 0 until 3) {
      val n = 30 + rng.nextInt(30)
      val pairs = Seq.fill(n)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val want = cc(pairs)
      val got = ccStar(pairs)
      assert(got == want, s"trial $trial: star=$got propagation=$want pairs=$pairs")
    }
  }

  test("star variant converges on a 10k-vertex path graph without raising maxIter") {
    // diameter 10_000 ≫ any sane propagation cap; Kiveris et al. bound the
    // alternating scheme's rounds logarithmically, so the DEFAULT cap of 25
    // must be enough — the adversarial long-chain case propagation throws on
    val labels = ccStar((0L until 10000L).map(i => (i, i + 1)), maxIter = 25)
    assert(labels.size == 10001)
    assert(labels.values.forall(_ == 0L),
      s"non-root labels: ${labels.filter(_._2 != 0L).take(5)}")
  }

  test("keepBestPerCluster keeps the max-score member, tiebreak min id; singletons keep") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3} (chain), cluster {7,8}, singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L),  // 2 and 3 tie on score -> keep 2
      (7L, 5L), (8L, 50L),              // keep 8 (higher score, larger id)
      (9L, 1L)).toDF("doc_id", "score")
    val out = graft.ext.Dedup.keepBestPerCluster(docs, pairs, col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 0L),
      (7L, 7L, 0L), (8L, 7L, 1L),
      (9L, 9L, 1L)), out.toSeq)
  }
}
