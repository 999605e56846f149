package graft.predict

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.BoosterModel
import graft.objective.Objective

/** Batch prediction — the reference's CPU predictor
  * (`src/predictor/cpu_predictor.cc:392-533`) as vectorized UDFs over the
  * broadcast model (`XGBoostEstimator.scala:640` broadcasts the booster the
  * same way). Spark rows are already the "inplace predict" zero-copy unit;
  * whole-stage codegen wraps the UDF call, and the model travels once per
  * executor via the closure/broadcast, never per row.
  */
object Predictor {

  /** Raw margin per output group (ref `PredictBatch` margin path). */
  def marginUdf(model: BoosterModel) =
    udf { (features: Seq[Double]) => model.margin(features.toArray) }

  /** Transformed single-output prediction (ref `PredTransform`). */
  def predictUdf(model: BoosterModel) = {
    val obj = Objective(model.objective)
    udf { (features: Seq[Double]) => obj.predTransform(model.margin(features.toArray)(0)) }
  }

  /** Multiclass: softprob vector. */
  def softprobUdf(model: BoosterModel) =
    udf { (features: Seq[Double]) =>
      val m = model.margin(features.toArray)
      val max = m.max
      val e = m.map(x => math.exp(x - max))
      val s = e.sum
      e.map(_ / s)
    }

  /** Multiclass: argmax class. */
  def argmaxUdf(model: BoosterModel) =
    udf { (features: Seq[Double]) =>
      val m = model.margin(features.toArray)
      var best = 0; var k = 1
      while (k < m.length) { if (m(k) > m(best)) best = k; k += 1 }
      best.toDouble
    }

  /** Per-tree leaf indices (ref `pred_leaf`, `cpu_predictor.cc:535-602`). */
  def leafUdf(model: BoosterModel) =
    udf { (features: Seq[Double]) => model.leafIndices(features.toArray) }

  /** Per-feature contributions (nfeat+1 incl. bias) that sum to the margin —
    * cover-weighted path attribution (Saabas), the fast variant of the
    * reference's `approx_contribs` (`include/xgboost/learner.h:111`); the
    * sum-to-margin invariant of `tests/python/test_shap.py` holds by
    * construction. */
  def contribUdf(model: BoosterModel): org.apache.spark.sql.expressions.UserDefinedFunction = {
    // precompute cover-weighted node values per tree (driver-side, model is small)
    val nodeValues: Array[Array[Double]] = model.trees.map { t =>
      val v = new Array[Double](t.nodes.length)
      val cover = new Array[Double](t.nodes.length)
      def fill(i: Int): (Double, Double) = { // (weightedValue, cover)
        val n = t.nodes(i)
        if (n.isLeaf) { v(i) = n.leaf(0); cover(i) = math.max(n.sumHess, 1e-16); (v(i) * cover(i), cover(i)) }
        else {
          val (lv, lc) = fill(n.left)
          val (rv, rc) = fill(n.right)
          cover(i) = lc + rc
          v(i) = (lv + rv) / cover(i)
          (lv + rv, cover(i))
        }
      }
      fill(0)
      v
    }
    val nf = model.numFeatures
    udf { (features: Seq[Double]) =>
      val x = features.toArray
      val out = new Array[Double](nf + 1)
      out(nf) = model.baseScore(0)
      var t = 0
      while (t < model.trees.length) {
        val tree = model.trees(t)
        val vals = nodeValues(t)
        val w = model.treeWeights(t)
        out(nf) += w * vals(0)
        var i = 0
        while (!tree.nodes(i).isLeaf) {
          val n = tree.nodes(i)
          val fv = x(n.feature)
          val next =
            if (java.lang.Double.isNaN(fv)) { if (n.defaultLeft) n.left else n.right }
            else if (n.isCategorical) {
              if (java.util.Arrays.binarySearch(n.categoriesRight, fv.toInt) >= 0) n.right else n.left
            } else if (fv <= n.threshold) n.left
            else n.right
          out(n.feature) += w * (vals(next) - vals(i))
          i = next
        }
        t += 1
      }
      out
    }
  }

  /** Transform helper mirroring the reference Spark layer's output columns
    * (`XGBoostEstimator.scala:563-680`): adds margin/prediction (+leaf,
    * +contrib on demand). */
  def transform(df: DataFrame, model: BoosterModel, featuresCol: String,
      withLeaf: Boolean = false, withContrib: Boolean = false): DataFrame = {
    val f = col(featuresCol)
    var out = df
    if (model.numGroups > 1) {
      out = out
        .withColumn("rawPrediction", marginUdf(model)(f))
        .withColumn("probability", softprobUdf(model)(f))
        .withColumn("prediction", argmaxUdf(model)(f))
    } else {
      out = out
        .withColumn("margin", marginUdf(model)(f).getItem(0))
        .withColumn("prediction", predictUdf(model)(f))
    }
    if (withLeaf) out = out.withColumn("leaf", leafUdf(model)(f))
    if (withContrib) out = out.withColumn("contrib", contribUdf(model)(f))
    out
  }
}
