package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.objective.{AFT, CoxGradients, Objective}
import graft.tree.{BInst, GBTTrainer, TrainParams}

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  /** Brute-force value-based Breslow gradients: for each row,
    * riskSum(v) = Σ_{|y_j| ≥ v} e^{p_j}, R_i/S_i sum 1/riskSum (and
    * squared) over event VALUES ≤ |y_i| (whole tie groups). */
  private def bruteCox(rows: Seq[(Double, Double, Double)]): Seq[(Double, Double)] = {
    def riskSum(v: Double) =
      rows.filter { case (y, _, _) => math.abs(y) >= v }.map { case (_, p, _) => math.exp(p) }.sum
    val eventVals = rows.filter(_._1 > 0).map(r => math.abs(r._1)).distinct
    rows.map { case (y, p, w) =>
      val v = math.abs(y)
      val r = eventVals.filter(_ <= v)
        .map(u => rows.count { case (y2, _, _) => y2 > 0 && math.abs(y2) == u } / riskSum(u)).sum
      val s = eventVals.filter(_ <= v)
        .map(u => rows.count { case (y2, _, _) => y2 > 0 && math.abs(y2) == u } / math.pow(riskSum(u), 2)).sum
      val e = math.exp(p)
      (w * (e * r - (if (y > 0) 1.0 else 0.0)), w * (e * r - e * e * s))
    }
  }

  test("CoxGradients matches brute force across partitions with boundary ties") {
    val rng = new scala.util.Random(13)
    // heavy ties (values 1..8 over 400 rows) force tie groups to span
    // range-partition boundaries
    val rows = (0 until 400).map { i =>
      val t = (i / 50 + 1).toDouble // sorted ascending, 50-row tie groups
      val y = if (rng.nextInt(4) == 0) -t else t
      (y, rng.nextGaussian() * 0.3, 0.5 + rng.nextDouble())
    }
    val packed = sc.parallelize(rows.map { case (y, p, w) =>
      (BInst(Array(0), y, w, 0L), Array(p))
    }, 7)
    val got = CoxGradients.compute(packed).collect()
    val want = bruteCox(rows)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, (wg, wh)), i) =>
      assert(math.abs(g(0) - wg) < 1e-9, s"g at row $i: ${g(0)} vs $wg")
      assert(math.abs(g(1) - wh) < 1e-9, s"h at row $i: ${g(1)} vs $wh")
    }
  }

  test("survival:cox training decreases the partial likelihood on a censored fixture") {
    val rng = new scala.util.Random(21)
    val rows = (0 until 2000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      // hazard grows with x1 ⇒ event time shrinks with x1
      val t = -math.log(rng.nextDouble()) / math.exp(1.2 * x1) + 0.01
      val censored = rng.nextInt(4) == 0
      (Array(x1, x2), if (censored) -t else t, 1.0)
    }
    val data = sc.parallelize(rows, 6)
    val model = new GBTTrainer(TrainParams(objective = "survival:cox",
      numRounds = 8, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 5)).fit(data)

    def nloglik(margins: Seq[Double]): Double = {
      val withM = rows.zip(margins)
      val events = withM.filter(_._1._2 > 0)
      events.map { case ((_, y, _), p) =>
        val risk = withM.filter { case ((_, y2, _), _) => math.abs(y2) >= math.abs(y) }
          .map { case (_, p2) => math.exp(p2) }.sum
        -(p - math.log(risk))
      }.sum / events.length
    }
    val base = nloglik(rows.map(_ => 0.0))
    val trained = nloglik(rows.map { case (f, _, _) => model.margin(f)(0) })
    assert(trained < base - 0.05, s"cox nloglik $trained should beat baseline $base")
    // hazard ordering learned: margin correlates positively with x1
    val ms = rows.map { case (f, _, _) => (f(0), model.margin(f)(0)) }
    val corr = {
      val mx = ms.map(_._1).sum / ms.size; val my = ms.map(_._2).sum / ms.size
      val num = ms.map { case (a, b) => (a - mx) * (b - my) }.sum
      num / math.sqrt(ms.map(a => (a._1 - mx) * (a._1 - mx)).sum *
        ms.map(a => (a._2 - my) * (a._2 - my)).sum)
    }
    assert(corr > 0.5, s"margin should track the x1 hazard, corr=$corr")
  }

  test("survival:aft training recovers log-time on an interval-censored fixture") {
    val rng = new scala.util.Random(31)
    val rows = (0 until 2000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val t = math.exp(1.0 * x1 + 0.3 * rng.nextGaussian()) + 0.01
      rng.nextInt(10) match {
        case 0 | 1 => (Array(x1, x2), t, Double.PositiveInfinity, 1.0) // right-censored
        case 2     => (Array(x1, x2), t, t * 2.0, 1.0)                 // interval
        case _     => (Array(x1, x2), t, t, 1.0)                       // observed
      }
    }
    val data = sc.parallelize(rows, 6)
    val model = new GBTTrainer(TrainParams(objective = "survival:aft",
      aftDistribution = "normal", aftScale = 1.0,
      numRounds = 10, maxDepth = 3, maxBin = 64, eta = 0.3, seed = 5)).fitSurvival(data)
    // mean squared error of predicted log-time vs true log-time on the
    // UNCENSORED rows must beat the constant base-score model
    val obs = rows.filter { case (_, lo, hi, _) => hi == lo }
    def mse(f: Array[Double] => Double) =
      obs.map { case (x, lo, _, _) => math.pow(f(x) - math.log(lo), 2) }.sum / obs.size
    val baseMargin = model.baseScore(0)
    val baseMse = mse(_ => baseMargin)
    val fitMse = mse(x => model.margin(x)(0))
    assert(fitMse < baseMse * 0.6, s"aft mse $fitMse should beat base $baseMse")
  }

  test("AFT gradients are finite and point the right way in all censoring branches") {
    for (dist <- Seq("normal", "logistic", "extreme")) {
      val aft = new AFT(dist, 1.0)
      val out = new Array[Double](2)
      // underprediction of an observed time ⇒ negative gradient (push up)
      aft.gradientInterval(0.0, math.exp(2.0), math.exp(2.0), out)
      assert(out(0) < 0 && out(1) > 0, s"$dist uncensored: ${out.mkString(",")}")
      // right-censored with survival beyond prediction ⇒ push up too
      aft.gradientInterval(0.0, math.exp(2.0), Double.PositiveInfinity, out)
      assert(out(0) < 0 && out(1) > 0, s"$dist right-censored: ${out.mkString(",")}")
      // overprediction of interval ⇒ positive gradient (push down)
      aft.gradientInterval(3.0, math.exp(0.5), math.exp(1.0), out)
      assert(out(0) > 0 && out(1) > 0, s"$dist interval: ${out.mkString(",")}")
    }
  }

  test("Metrics.aftNloglik agrees with the objective's scalar nloglik for all 3 distributions") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rng = new scala.util.Random(61)
    // mix of uncensored (lo == hi), right-censored (hi = null→NaN on the
    // scalar side) and interval rows
    val rows = (0 until 500).map { i =>
      val lo = 0.5 + rng.nextDouble() * 9
      val hi = i % 3 match {
        case 0 => lo
        case 1 => Double.NaN
        case _ => lo * (1.5 + rng.nextDouble())
      }
      (rng.nextGaussian(), lo, hi)
    }
    val df = rows.map { case (p, lo, hi) =>
      (p, lo, if (hi.isNaN) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(hi))
    }.toDF("p", "lo", "hi")
    for (dist <- Seq("normal", "logistic", "extreme"); sigma <- Seq(1.0, 1.7)) {
      val got = graft.metric.Metrics
        .aftNloglik(df, col("p"), col("lo"), col("hi"), sigma, dist)
        .head().getDouble(0)
      val aft = new AFT(dist, sigma)
      val want = rows.map { case (p, lo, hi) => aft.nloglik(p, lo, hi) }.sum / rows.length
      assert(math.abs(got - want) < 1e-9, s"$dist sigma=$sigma: df=$got scalar=$want")
    }
  }

  test("validLabel is enforced at fit entry with a violation count") {
    val bad = sc.parallelize((0 until 100).map { i =>
      (Array(i.toDouble), if (i % 10 == 0) 0.0 else 1.0 + i, 1.0) // gamma needs y > 0
    }, 4)
    val e = intercept[IllegalArgumentException] {
      new GBTTrainer(TrainParams(objective = "reg:gamma", numRounds = 1)).fit(bad)
    }
    assert(e.getMessage.contains("10 label(s)"), e.getMessage)

    val badW = sc.parallelize((0 until 50).map { i =>
      (Array(i.toDouble), 1.0, if (i == 7) -1.0 else 1.0)
    }, 4)
    val e2 = intercept[IllegalArgumentException] {
      new GBTTrainer(TrainParams(objective = "reg:squarederror", numRounds = 1)).fit(badW)
    }
    assert(e2.getMessage.contains("1 instance weight"), e2.getMessage)
  }
}
