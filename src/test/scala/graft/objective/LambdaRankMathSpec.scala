package graft.objective

import org.scalatest.funsuite.AnyFunSuite

/** Validates the closed-form NDCG / MAP swap deltas inside
  * LambdaRankGradients.groupGradients against brute-force metric
  * recomputation after physically swapping the pair in the ranked list. */
class LambdaRankMathSpec extends AnyFunSuite {

  private def ranking(rows: Seq[(Double, Double, Double)]): Array[Int] =
    rows.indices.sortBy(i => (-rows(i)._2, i)).toArray

  private def ndcgOf(rows: Seq[(Double, Double, Double)], order: Seq[Int]): Double = {
    def gain(l: Double) = math.pow(2.0, l) - 1.0
    def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val dcg = order.zipWithIndex.map { case (i, r) => gain(rows(i)._1) * disc(r + 1) }.sum
    val idcg = rows.map(r => gain(r._1)).sortBy(-_).zipWithIndex
      .map { case (g, r) => g * disc(r + 1) }.sum
    if (idcg > 0) dcg / idcg else 0.0
  }

  private def apOf(rows: Seq[(Double, Double, Double)], order: Seq[Int]): Double = {
    val rel = order.map(i => rows(i)._1 > 0)
    val nRel = rel.count(identity)
    if (nRel == 0) return 0.0
    var cum = 0; var s = 0.0
    rel.zipWithIndex.foreach { case (r, k) =>
      if (r) { cum += 1; s += cum.toDouble / (k + 1) }
    }
    s / nRel
  }

  /** brute λ-gradients by swap simulation. */
  private def brute(rows: Seq[(Double, Double, Double)], variant: String): Seq[(Double, Double)] = {
    val n = rows.length
    val g = new Array[Double](n); val h = new Array[Double](n)
    val order = ranking(rows)
    val posOf = new Array[Int](n)
    order.zipWithIndex.foreach { case (i, p) => posOf(i) = p }
    val m0 = variant match {
      case "ndcg" => ndcgOf(rows, order.toSeq)
      case "map" => apOf(rows, order.toSeq)
      case _ => 0.0
    }
    for (i <- 0 until n; j <- 0 until n) {
      val li = rows(i)._1; val lj = rows(j)._1
      val mapPair = variant != "map" || (li > 0 && lj <= 0)
      if (li > lj && mapPair) {
        val d = variant match {
          case "pairwise" => 1.0
          case _ =>
            val swapped = order.clone()
            val t = swapped(posOf(i)); swapped(posOf(i)) = swapped(posOf(j)); swapped(posOf(j)) = t
            val m1 = if (variant == "ndcg") ndcgOf(rows, swapped.toSeq) else apOf(rows, swapped.toSeq)
            math.abs(m1 - m0)
        }
        if (d > 0) {
          val rho = 1.0 / (1.0 + math.exp(rows(i)._2 - rows(j)._2))
          g(i) -= d * rho; g(j) += d * rho
          // reference pair hessian max(σ(1−σ), ε)·Δ·2 (lambdarank_obj.h:134)
          val hh = 2.0 * d * math.max(rho * (1 - rho), 1e-16)
          h(i) += hh; h(j) += hh
        }
      }
    }
    rows.indices.map(i => (g(i) * rows(i)._3, math.max(h(i), 1e-16) * rows(i)._3))
  }

  /** brute with the reference-default normalizations ON (ranking_utils.h:
    * 81-82): Δ /= (|Δscore|+0.01) when the group's best and worst current
    * scores differ, then group λ's rescaled by log2(1+Σλ)/Σλ (the non-mean
    * branch; `all` enumerates exactly like topk with k=∞). */
  private def bruteNormalized(rows: Seq[(Double, Double, Double)], variant: String): Seq[(Double, Double)] = {
    val n = rows.length
    val g = new Array[Double](n); val h = new Array[Double](n)
    val order = ranking(rows)
    val posOf = new Array[Int](n)
    order.zipWithIndex.foreach { case (i, p) => posOf(i) = p }
    val spread = rows(order.head)._2 != rows(order.last)._2
    val m0 = variant match {
      case "ndcg" => ndcgOf(rows, order.toSeq)
      case "map" => apOf(rows, order.toSeq)
      case _ => 0.0
    }
    var sumLambda = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      val li = rows(i)._1; val lj = rows(j)._1
      val mapPair = variant != "map" || (li > 0 && lj <= 0)
      if (li > lj && mapPair) {
        var d = variant match {
          case "pairwise" => 1.0
          case _ =>
            val swapped = order.clone()
            val t = swapped(posOf(i)); swapped(posOf(i)) = swapped(posOf(j)); swapped(posOf(j)) = t
            val m1 = if (variant == "ndcg") ndcgOf(rows, swapped.toSeq) else apOf(rows, swapped.toSeq)
            math.abs(m1 - m0)
        }
        if (spread) d /= math.abs(rows(i)._2 - rows(j)._2) + 0.01
        if (d > 0) {
          val rho = 1.0 / (1.0 + math.exp(rows(i)._2 - rows(j)._2))
          g(i) -= d * rho; g(j) += d * rho
          val hh = 2.0 * d * math.max(rho * (1 - rho), 1e-16)
          h(i) += hh; h(j) += hh
          sumLambda += 2.0 * d * rho
        }
      }
    }
    val norm = if (sumLambda > 0) math.log(1.0 + sumLambda) / math.log(2.0) / sumLambda else 1.0
    rows.indices.map(i => (g(i) * norm * rows(i)._3, math.max(h(i) * norm, 1e-16) * rows(i)._3))
  }

  test("reference-default normalization: score-gap division + log2(1+Σλ)/Σλ rescale") {
    val rng = new scala.util.Random(43)
    for (trial <- 0 until 20; variant <- Seq("ndcg", "map", "pairwise")) {
      val n = 2 + rng.nextInt(12)
      val rows = Seq.fill(n)((rng.nextInt(4).toDouble, rng.nextGaussian(), 0.5 + rng.nextDouble()))
      val got = LambdaRankGradients.groupGradients(rows, variant, expGain = true,
        topK = 0, normalization = true, scoreNormalization = true)
      val want = bruteNormalized(rows, variant)
      rows.indices.foreach { i =>
        assert(math.abs(got(i)(0) - want(i)._1) < 1e-9,
          s"$variant trial $trial g($i): ${got(i)(0)} vs ${want(i)._1} rows=$rows")
        assert(math.abs(got(i)(1) - want(i)._2) < 1e-9,
          s"$variant trial $trial h($i): ${got(i)(1)} vs ${want(i)._2}")
      }
    }
  }

  test("mean pair method normalizes by 1/num_pair") {
    // constant margins ⇒ no score spread ⇒ scoreNormalization is a no-op,
    // and mean-method normalization is exactly a 1/numPair rescale of the
    // unnormalized sampled-pair kernel (identical RNG seed ⇒ same pairs)
    val rows = Seq((2.0, 0.1, 1.0), (0.0, 0.1, 1.0), (1.0, 0.1, 1.0), (3.0, 0.1, 1.0))
    val raw = LambdaRankGradients.groupGradients(rows, "ndcg", expGain = true,
      topK = 0, pairMethod = "mean", numPair = 4, qid = 9L)
    val norm = LambdaRankGradients.groupGradients(rows, "ndcg", expGain = true,
      topK = 0, pairMethod = "mean", numPair = 4, qid = 9L,
      normalization = true, scoreNormalization = true)
    rows.indices.foreach { i =>
      assert(math.abs(norm(i)(0) - raw(i)(0) / 4.0) < 1e-12, s"g($i)")
      if (raw(i)(1) > 1e-15) // below that both clamp to the 1e-16 floor
        assert(math.abs(norm(i)(1) - raw(i)(1) / 4.0) < 1e-12, s"h($i)")
    }
  }

  test("ndcg / map / pairwise group gradients match swap simulation") {
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 20; variant <- Seq("ndcg", "map", "pairwise")) {
      val n = 2 + rng.nextInt(12)
      val rows = Seq.fill(n)((rng.nextInt(4).toDouble, rng.nextGaussian(), 0.5 + rng.nextDouble()))
      val got = LambdaRankGradients.groupGradients(rows, variant, expGain = true, topK = 0)
      val want = brute(rows, variant)
      rows.indices.foreach { i =>
        assert(math.abs(got(i)(0) - want(i)._1) < 1e-9,
          s"$variant trial $trial g($i): ${got(i)(0)} vs ${want(i)._1} rows=$rows")
        assert(math.abs(got(i)(1) - want(i)._2) < 1e-9,
          s"$variant trial $trial h($i): ${got(i)(1)} vs ${want(i)._2}")
      }
    }
  }
}
