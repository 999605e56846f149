package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  /** Synthetic LTR data: relevance is a noisy monotone function of x1
    * (mirrors `tests/python/test_ranking.py`'s learnable fixtures). */
  private def makeData(seed: Int, nGroups: Int = 60, groupSize: Int = 20) = {
    val rng = new scala.util.Random(seed)
    (0 until nGroups).flatMap { q =>
      (0 until groupSize).map { _ =>
        val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
        val score = x(0) + 0.4 * rng.nextGaussian()
        val rel = math.max(0, math.min(3, math.round(1.5 + score).toInt)).toDouble
        (x, rel, 1.0, q.toLong)
      }
    }
  }

  private def meanNdcgAt5(rows: Seq[(Array[Double], Double, Double, Long)],
      margin: Array[Double] => Double): Double = {
    def gain(l: Double) = math.pow(2.0, l) - 1.0
    def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val byQ = rows.zipWithIndex.groupBy(_._1._4)
    val ndcgs = byQ.values.map { g =>
      val ranked = g.sortBy { case ((x, _, _, _), i) => (-margin(x), i) }.take(5)
      val dcg = ranked.zipWithIndex.map { case (((_, rel, _, _), _), r) => gain(rel) * disc(r + 1) }.sum
      val ideal = g.map(_._1._2).sortBy(-_).take(5).zipWithIndex
        .map { case (rel, r) => gain(rel) * disc(r + 1) }.sum
      if (ideal > 0) dcg / ideal else 0.0
    }
    ndcgs.sum / ndcgs.size
  }

  test("rank:ndcg training beats the untrained ordering") {
    val rows = makeData(41)
    val data = sc.parallelize(rows, 6)
    val model = new GBTTrainer(TrainParams(objective = "rank:ndcg",
      numRounds = 15, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 9)).fitRanking(data)
    val before = meanNdcgAt5(rows, _ => 0.0)
    val after = meanNdcgAt5(rows, x => model.margin(x)(0))
    assert(after > before + 0.15, s"ndcg@5 $after should beat untrained $before")
    assert(after > 0.8, s"learnable fixture should reach high ndcg, got $after")
  }

  test("rank:pairwise training improves pair concordance") {
    val rows = makeData(43)
    val data = sc.parallelize(rows, 6)
    val model = new GBTTrainer(TrainParams(objective = "rank:pairwise",
      numRounds = 10, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 9)).fitRanking(data)
    // concordance within groups: P(margin_i > margin_j | rel_i > rel_j)
    val byQ = rows.groupBy(_._4)
    var conc = 0L; var tot = 0L
    byQ.values.foreach { g =>
      val scored = g.map { case (x, rel, _, _) => (rel, model.margin(x)(0)) }
      for ((ri, mi) <- scored; (rj, mj) <- scored if ri > rj) {
        tot += 1; if (mi > mj) conc += 1
      }
    }
    val rate = conc.toDouble / tot
    assert(rate > 0.75, s"pairwise concordance $rate should be well above chance")
  }

  test("rank:ndcg with topk pair truncation still learns") {
    val rows = makeData(47)
    val data = sc.parallelize(rows, 6)
    val model = new GBTTrainer(TrainParams(objective = "rank:ndcg",
      lambdarankTopK = 8,
      numRounds = 10, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 9)).fitRanking(data)
    val after = meanNdcgAt5(rows, x => model.margin(x)(0))
    assert(after > meanNdcgAt5(rows, _ => 0.0) + 0.1, s"topk ndcg@5 $after")
  }

  test("group-weight normalizer: uniformly rescaled weights leave the model identical") {
    // w_norm = n_groups / Σ group-weights (RankingCache, ranking_utils.cc:44)
    // exactly cancels a uniform weight rescale: gpair · (3w) · (n/Σ3w) =
    // gpair · w · (n/Σw) — so weights 3.0 must train the SAME model as 1.0
    val rows = makeData(53)
    def fit(w: Double) = new GBTTrainer(TrainParams(objective = "rank:ndcg",
      numRounds = 6, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 9,
      minTrainPartitions = 0))
      .fitRanking(sc.parallelize(rows.map { case (x, rel, _, q) => (x, rel, w, q) }, 1))
    val unit = fit(1.0)
    val tripled = fit(3.0)
    val probe = rows.take(40).map(_._1)
    probe.foreach { x =>
      val a = unit.margin(x)(0); val b = tripled.margin(x)(0)
      assert(a == b, s"uniform group-weight rescale changed the model: $a vs $b")
    }
  }
}
