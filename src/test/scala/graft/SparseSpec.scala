package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

class SparseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  test("sparse fit produces the identical model to the NaN-dense encoding") {
    val rng = new scala.util.Random(101)
    val nf = 12
    // each row has ~4 of 12 features present; label depends on two of them
    val rows = (0 until 2500).map { _ =>
      val present = rng.shuffle((0 until nf).toList).take(4).sorted.toArray
      val values = present.map(f => rng.nextGaussian() + f * 0.1)
      val fmap = present.zip(values).toMap
      val y = fmap.getOrElse(2, 0.0) * 2.0 - fmap.getOrElse(7, 0.0) + 0.05 * rng.nextGaussian()
      (present, values, y, 1.0)
    }
    val p = TrainParams(numRounds = 6, maxDepth = 4, maxBin = 32, eta = 0.3, seed = 11,
      minTrainPartitions = 0) // keep 1 partition: no auto-repartition
    // single partition pins the sketch/histogram merge order, so the two
    // encodings must agree BIT-FOR-BIT (multi-partition fits differ at
    // ~1e-4 in cut placement purely from treeAggregate merge order)
    val sparseModel = new GBTTrainer(p).fitSparse(sc.parallelize(rows, 1), nf)
    val dense = rows.map { case (idx, vs, y, w) =>
      val f = Array.fill(nf)(Double.NaN)
      idx.zip(vs).foreach { case (i, v) => f(i) = v }
      (f, y, w)
    }
    val denseModel = new GBTTrainer(p).fit(sc.parallelize(dense, 1))
    assert(sparseModel.trees.length == denseModel.trees.length)
    sparseModel.trees.zip(denseModel.trees).zipWithIndex.foreach { case ((s, d), t) =>
      assert(s.nodes.length == d.nodes.length, s"tree $t size")
      s.nodes.zip(d.nodes).foreach { case (a, b) =>
        assert(a.feature == b.feature, s"tree $t split feature")
        assert(a.threshold == b.threshold, s"tree $t threshold")
        assert(a.leaf.toSeq == b.leaf.toSeq, s"tree $t leaf")
        assert(a.defaultLeft == b.defaultLeft, s"tree $t default dir")
      }
    }
    // and both predict identically on densified rows
    dense.take(50).foreach { case (f, _, _) =>
      assert(sparseModel.margin(f)(0) == denseModel.margin(f)(0))
    }
  }

  test("sparse fit learns the signal") {
    val rng = new scala.util.Random(103)
    val nf = 100 // wide: dense bins would be 100 ints/row, sparse stores 5
    val rows = (0 until 3000).map { _ =>
      val present = rng.shuffle((0 until nf).toList).take(5).sorted.toArray
      val values = present.map(_ => rng.nextGaussian())
      val y = (if (present.contains(3)) 5.0 else 0.0) +
        values.headOption.getOrElse(0.0) * 0.2 + 0.1 * rng.nextGaussian()
      (present, values, y, 1.0)
    }
    val model = new GBTTrainer(TrainParams(numRounds = 8, maxDepth = 4,
      maxBin = 32, eta = 0.3, seed = 13)).fitSparse(sc.parallelize(rows, 5), nf)
    val mse = rows.map { case (idx, vs, y, _) =>
      val f = Array.fill(nf)(Double.NaN)
      idx.zip(vs).foreach { case (i, v) => f(i) = v }
      math.pow(model.margin(f)(0) - y, 2)
    }.sum / rows.size
    val varY = {
      val m = rows.map(_._3).sum / rows.size
      rows.map(r => (r._3 - m) * (r._3 - m)).sum / rows.size
    }
    assert(mse < varY * 0.3, s"sparse model mse $mse vs label variance $varY")
  }
}
