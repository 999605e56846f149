package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.DistributedCumsum
import graft.metric.Metrics

class CumsumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed cumsum matches single-task window cumsum") {
    val rng = new scala.util.Random(11)
    val df = (0 until 5000).map(i => (i.toDouble + rng.nextDouble() * 0.5,
      rng.nextDouble(), rng.nextGaussian())).toDF("k", "a", "b")
      .repartition(7) // scatter the input
    val got = DistributedCumsum.cumsum(df, "k", descending = false, Seq("a", "b"))
      .select("k", "cum_a", "cum_b").collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum_a", sum("a").over(w)).withColumn("cum_b", sum("b").over(w))
      .select("k", "cum_a", "cum_b").collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((k1, a1, b1), (k2, a2, b2)) =>
      assert(k1 == k2)
      assert(math.abs(a1 - a2) < 1e-6, s"cum_a at $k1")
      assert(math.abs(b1 - b2) < 1e-6, s"cum_b at $k1")
    }
  }

  test("aucBinary is scale-safe (no unpartitioned window) and correct") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 4000).map { _ =>
      val y = if (rng.nextBoolean()) 1.0 else 0.0
      // informative but noisy score, with deliberate ties
      val p = math.rint((y * 0.3 + rng.nextDouble()) * 50) / 50.0
      (p, y, 1.0 + rng.nextDouble())
    }
    val df = rows.toDF("p", "y", "w")
    val out = Metrics.aucBinary(df, col("p"), col("y"), col("w"))
    // plan audit: the scalable path must not contain ANY Window operator —
    // the cumulative sweep runs via range partitions + prefix offsets
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    val auc = out.head().getDouble(0)
    // brute-force weighted tie-corrected Mann-Whitney reference
    val pos = rows.filter(_._2 > 0.5)
    val neg = rows.filter(_._2 <= 0.5)
    var num = 0.0
    for ((pp, _, wp) <- pos; (pn, _, wn) <- neg) {
      if (pp > pn) num += wp * wn
      else if (pp == pn) num += 0.5 * wp * wn
    }
    val want = num / (pos.map(_._3).sum * neg.map(_._3).sum)
    assert(math.abs(auc - want) < 1e-9, s"auc $auc vs brute $want")
  }

  test("coxNloglik matches brute-force Breslow partial likelihood") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 600).map { _ =>
      val t = (rng.nextInt(20) + 1).toDouble // heavy ties
      val y = if (rng.nextInt(4) == 0) -t else t
      val p = rng.nextGaussian() * 0.5
      (p, y)
    }
    val df = rows.toDF("p", "y")
    val got = Metrics.coxNloglik(df, col("p"), col("y")).head().getDouble(0)
    // brute force: for each event i, -(p_i - log Σ_{|y_j| >= |y_i|} e^{p_j}),
    // mean over events (value-based Breslow risk sets)
    val events = rows.filter(_._2 > 0)
    val want = events.map { case (p, y) =>
      val risk = rows.filter { case (_, y2) => math.abs(y2) >= math.abs(y) }
        .map { case (p2, _) => math.exp(p2) }.sum
      -(p - math.log(risk))
    }.sum / events.length
    assert(math.abs(got - want) < 1e-9, s"cox $got vs brute $want")
  }
}
