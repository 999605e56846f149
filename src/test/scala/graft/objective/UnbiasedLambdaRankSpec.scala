package graft.objective

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tree.{GBTTrainer, TrainParams}

/** Unbiased LambdaMART (lambdarank_unbiased — ref `src/objective/
  * lambdarank_obj.h:93` LambdaGrad unbiased path, `lambdarank_obj.cc:40`
  * UpdatePositionBias; Hu et al. eq. 30/31): pair gradients divided by
  * estimated position-bias ratios t⁺/t⁻, which are themselves re-fit each
  * iteration from the accumulated pair costs. */
class UnbiasedLambdaRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  test("all-ones t± reproduce the biased gradients; accumulators fill") {
    val labels = Array(2.0, 0.0, 1.0, 0.0, 3.0, 1.0)
    val margins = Array(0.3, -0.1, 0.8, 0.2, -0.4, 0.0)
    val weights = Array.fill(6)(1.0)
    val biased = LambdaRankGradients.groupGradients(
      labels, margins, weights, "ndcg", true, 0, "all", 8, 1L,
      null, null, null, null, false, false, 1.0)
    val ones = Array.fill(32)(1.0)
    val li = new Array[Double](32); val lj = new Array[Double](32)
    val unb = LambdaRankGradients.groupGradients(
      labels, margins, weights, "ndcg", true, 0, "all", 8, 1L,
      ones, ones.clone(), li, lj, false, false, 1.0)
    biased.zip(unb).foreach { case (a, b) =>
      assert(math.abs(a(0) - b(0)) < 1e-12 && math.abs(a(1) - b(1)) < 1e-12,
        "t±=1 must leave gradients unchanged")
    }
    // every label-discordant pair contributes positive cost at its positions
    assert(li.take(6).exists(_ > 0) && lj.take(6).exists(_ > 0),
      s"eq.30/31 numerators must accumulate: li=${li.take(6).toSeq} lj=${lj.take(6).toSeq}")
    assert(li.drop(6).forall(_ == 0.0), "positions beyond the group stay empty")
  }

  test("t± scaling divides pair gradients by t⁺(high)·t⁻(low)") {
    val labels = Array(1.0, 0.0)
    val margins = Array(0.0, 0.0)
    val w = Array(1.0, 1.0)
    val biased = LambdaRankGradients.groupGradients(
      labels, margins, w, "pairwise", true, 0, "all", 8, 0L, null, null, null, null, false, false, 1.0)
    val tp = Array.fill(32)(1.0); tp(0) = 0.5 // high doc sits at position 0
    val tm = Array.fill(32)(1.0); tm(1) = 0.25 // low doc at position 1
    val unb = LambdaRankGradients.groupGradients(
      labels, margins, w, "pairwise", true, 0, "all", 8, 0L, tp, tm, null, null, false, false, 1.0)
    // scale = 1/(0.5 · 0.25) = 8
    assert(math.abs(unb(0)(0) / biased(0)(0) - 8.0) < 1e-9, "gradient scale")
    assert(math.abs(unb(0)(1) / biased(0)(1) - 8.0) < 1e-9, "hessian scale")
  }

  /** Position-biased click fixture with a CONFOUND: true relevance depends
    * on x0, but docs are displayed ranked by an irrelevant legacy score x1,
    * and clicks (training labels) are censored by a propensity decaying
    * with display position. Naive training credits x1 (it correlates with
    * getting seen); debiasing removes the positional advantage — the
    * setting of Hu et al., "Unbiased LambdaMART". */
  private def clickData(seed: Int, nGroups: Int = 120, groupSize: Int = 20) = {
    val rng = new scala.util.Random(seed)
    (0 until nGroups).flatMap { q =>
      val docs = (0 until groupSize).map { _ =>
        val x = Array(rng.nextGaussian(), rng.nextGaussian())
        val trueRel = if (x(0) + 0.3 * rng.nextGaussian() > 0.6) 1.0 else 0.0
        (x, trueRel)
      }.sortBy(-_._1(1)) // display order: legacy ranker = x1 desc
      docs.zipWithIndex.map { case ((x, trueRel), pos) =>
        val propensity = 1.0 / (1.0 + pos) // steep position bias
        val click = if (trueRel > 0 && rng.nextDouble() < propensity) 1.0 else 0.0
        (x, click, trueRel, 1.0, q.toLong)
      }
    }
  }

  private def trueNdcgAt5(rows: Seq[(Array[Double], Double, Double, Double, Long)],
      margin: Array[Double] => Double): Double = {
    def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val byQ = rows.zipWithIndex.groupBy(_._1._5)
    val vals = byQ.values.flatMap { g =>
      val ranked = g.sortBy { case ((x, _, _, _, _), i) => (-margin(x), i) }.take(5)
      val dcg = ranked.zipWithIndex.map { case (((_, _, rel, _, _), _), r) => rel * disc(r + 1) }.sum
      val ideal = g.map(_._1._3).sortBy(-_).take(5).zipWithIndex
        .map { case (rel, r) => rel * disc(r + 1) }.sum
      if (ideal > 0) Some(dcg / ideal) else None
    }
    vals.sum / vals.size
  }

  test("t± estimation recovers the decaying propensity; model still learns") {
    val rows = clickData(31)
    // 4 slices of 600 rows = 30 groups each: group boundaries align with
    // partition boundaries, so display order survives the qid shuffle
    val rdd = sc.parallelize(rows.map { case (x, click, _, w, q) => (x, click, w, q) }, 4)
    val trainer = new GBTTrainer(TrainParams(
      objective = "rank:ndcg", numRounds = 20, maxDepth = 3, eta = 0.3,
      maxBin = 32, seed = 7, lambdarankUnbiased = true,
      minTrainPartitions = 0))
    val debiased = trainer.fitRanking(rdd)

    // the learned t⁺ must recover the 1/(1+pos) decay shape: normalized to
    // 1 at position 0, finite, non-negative (the reference's own
    // assertions, test_ranking.py test_unbiased) — AND decaying, which
    // the synthetic propensity makes checkable
    val (tp, tm) = trainer.positionBias.get
    assert(math.abs(tp(0) - 1.0) < 1e-12 && math.abs(tm(0) - 1.0) < 1e-12,
      "t± normalized at position 0")
    assert(tp.forall(v => v >= 0 && !v.isNaN && !v.isInfinite), s"ti+ sane: ${tp.toSeq}")
    assert(tm.forall(v => v >= 0 && !v.isNaN && !v.isInfinite), s"tj- sane: ${tm.toSeq}")
    val early = tp.slice(1, 5).sum / 4
    val late = tp.slice(15, 20).sum / 5
    assert(late < early && early < 1.0,
      s"ti+ should decay with display position: early=$early late=$late tp=${tp.toSeq}")

    // debiased model must still rank by TRUE relevance despite censored
    // clicks — and not collapse onto the legacy-score confound
    val evalRows = clickData(77) // fresh draw from the same distribution
    val nu = trueNdcgAt5(evalRows, x => debiased.margin(x)(0))
    assert(nu > 0.75, s"debiased model should learn true relevance: $nu")

    // and the biased baseline on the same data trains fine (non-inferiority
    // guard only: with 20 display slots both models see most docs, so
    // strict superiority is fixture-dependent — the reference's own test
    // asserts t± sanity, not superiority)
    val biased = new GBTTrainer(TrainParams(
      objective = "rank:ndcg", numRounds = 20, maxDepth = 3, eta = 0.3,
      maxBin = 32, seed = 7, minTrainPartitions = 0)).fitRanking(rdd)
    val nb = trueNdcgAt5(evalRows, x => biased.margin(x)(0))
    assert(nu > nb - 0.05, s"debiasing must not collapse ranking: biased=$nb unbiased=$nu")
  }
}
