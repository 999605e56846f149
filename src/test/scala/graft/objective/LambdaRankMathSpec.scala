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
          val hh = math.max(d * rho * (1 - rho), 1e-16)
          h(i) += hh; h(j) += hh
        }
      }
    }
    rows.indices.map(i => (g(i) * rows(i)._3, math.max(h(i), 1e-16) * rows(i)._3))
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
