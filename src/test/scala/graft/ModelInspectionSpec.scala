package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.tree.{GBTTrainer, TrainParams}

/** Model-inspection surfaces: `trees_to_dataframe` (core.py:3103) and
  * `get_split_value_histogram` (core.py:3327) conventions. */
class ModelInspectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sc = spark.sparkContext

  private lazy val model = {
    val rng = new scala.util.Random(5)
    val rows = (0 until 1500).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian())
      (x, 2.0 * x(0) - x(1) + 0.2 * rng.nextGaussian(), 1.0)
    }
    new GBTTrainer(TrainParams(numRounds = 4, maxDepth = 3, eta = 0.5, seed = 3))
      .fit(sc.parallelize(rows, 3))
  }

  test("treesToDataFrame: reference conventions (Leaf rows, ids, weighted gain)") {
    val df = model.treesToDataFrame(spark)
    assert(df.columns.toSeq == Seq("tree", "target", "node", "id", "feature",
      "split", "categories", "yes", "no", "missing", "gain", "cover"))
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).distinct.sorted.toSeq == (0 until model.trees.length))
    val leaves = rows.filter(_.getString(4) == "Leaf")
    val splits = rows.filterNot(_.getString(4) == "Leaf")
    assert(leaves.nonEmpty && splits.nonEmpty)
    // leaves: null split/children, value (weight-folded) in gain
    leaves.foreach { r =>
      assert(r.isNullAt(5) && r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9))
    }
    // the weight-folded leaf of tree 0 node x equals eta * stored leaf
    val t0leaf = model.trees(0).nodes.zipWithIndex.filter(_._1.isLeaf).head
    val row0 = rows.find(r => r.getInt(0) == 0 && r.getInt(2) == t0leaf._2).get
    assert(math.abs(row0.getDouble(10) - 0.5 * t0leaf._1.leaf(0)) < 1e-12)
    // splits: id strings wire up (yes/no/missing point at rows that exist)
    val ids = rows.map(_.getString(3)).toSet
    splits.foreach { r =>
      assert(ids.contains(r.getString(7)) && ids.contains(r.getString(8)) &&
        ids.contains(r.getString(9)), s"dangling child in $r")
      assert(!r.isNullAt(5), "numeric split must carry its threshold")
    }
    // every reachable node appears exactly once
    assert(rows.map(_.getString(3)).distinct.length == rows.length)
  }

  test("transform iteration_range scores the sliced prefix of the ensemble") {
    import spark.implicits._
    val df = Seq((Array(0.5, -1.0, 0.2), 0.0), (Array(-2.0, 1.0, 0.0), 0.0))
      .toDF("features", "y")
    val ranged = graft.predict.Predictor
      .transform(df, model, "features", iterationRange = (0, 2))
      .select(col("prediction")).as[Double].collect()
    val sliced = graft.predict.Predictor
      .transform(df, model.slice(0, 2), "features")
      .select(col("prediction")).as[Double].collect()
    val full = graft.predict.Predictor.transform(df, model, "features")
      .select(col("prediction")).as[Double].collect()
    assert(ranged.toSeq == sliced.toSeq)
    assert(ranged.toSeq != full.toSeq, "2-round prefix must differ from 4 rounds")
  }

  test("splitValueHistogram mirrors np.histogram semantics") {
    val vals = model.trees.flatMap(_.nodes.filter(n => !n.isLeaf && n.feature == 0)
      .map(_.threshold))
    assert(vals.nonEmpty, "fixture must split on f0")
    // unbinned: one bin per unique value count preserved in total
    val full = model.splitValueHistogram(0)
    assert(full.map(_._2).sum == vals.length)
    // capped bins: counts conserved, edges ascending, width uniform
    val capped = model.splitValueHistogram(0, bins = Some(3))
    assert(capped.length <= 3 && capped.map(_._2).sum == vals.length)
    assert(capped.map(_._1).toSeq == capped.map(_._1).sorted.toSeq)
    // a feature never split on yields an empty histogram
    assert(model.splitValueHistogram(99).isEmpty)
  }
}
