package graft.predict

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.model.BoosterModel

/** Batch prediction — the reference's CPU predictor
  * (`src/predictor/cpu_predictor.cc:392-533`) as a native Catalyst
  * expression ([[TreePredict]]) over the flattened ensemble: the tree walk
  * is emitted INSIDE whole-stage codegen (no UDF serializer round-trip, no
  * Seq boxing), and the model travels once per executor as a codegen
  * reference object — Spark's analog of the reference Spark layer's booster
  * broadcast (`XGBoostEstimator.scala:640`). */
object Predictor {

  private def pred(model: BoosterModel, mode: Int)(features: Column): Column =
    ColumnBridge.column(TreePredict(ColumnBridge.expression(features), FlatModel(model), mode))

  /** Raw margin per output group (ref `PredictBatch` margin path). */
  def marginCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Margin)(features)

  /** Single-output raw margin as a scalar. */
  def marginScalarCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.MarginScalar)(features)

  /** Transformed single-output prediction (ref `PredTransform`). */
  def predictCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Value)(features)

  /** Multiclass: softprob vector. */
  def softprobCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Softprob)(features)

  /** Multiclass: argmax class. */
  def argmaxCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Argmax)(features)

  /** Per-tree leaf indices (ref `pred_leaf`, `cpu_predictor.cc:535-602`). */
  def leafCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Leaf)(features)

  /** Per-feature contributions (nfeat+1 incl. bias) that sum to the
    * margin — EXACT TreeSHAP (ref `pred_contribs`, `shap.cc:101-340`). */
  def contribCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Shap)(features)

  /** Saabas cover-weighted path attribution — the fast variant of the
    * reference's `approx_contribs` (`include/xgboost/learner.h:111`); the
    * sum-to-margin invariant of `tests/python/test_shap.py` holds by
    * construction. */
  def approxContribCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.Contrib)(features)

  /** SHAP interaction values, (nfeat+1)² flattened row-major (ref
    * `pred_interactions`): row sums = SHAP values, grand total = margin. */
  def interactionsCol(model: BoosterModel)(features: Column): Column =
    pred(model, TreePredict.ShapInter)(features)

  // ---- sparse rows: (sorted indices, parallel values), never densified ----

  private def predSparse(model: BoosterModel, mode: Int)(idx: Column, vals: Column): Column =
    ColumnBridge.column(TreePredictSparse(ColumnBridge.expression(idx),
      ColumnBridge.expression(vals), FlatModel(model), mode))

  /** Transformed prediction over sparse (indices, values) feature columns —
    * a 100k-wide one-hot row costs O(depth·trees·log nnz), not O(width). */
  def predictSparseCol(model: BoosterModel)(idx: Column, vals: Column): Column =
    predSparse(model, TreePredict.Value)(idx, vals)

  /** Raw scalar margin over sparse features. */
  def marginSparseCol(model: BoosterModel)(idx: Column, vals: Column): Column =
    predSparse(model, TreePredict.MarginScalar)(idx, vals)

  /** Per-tree leaf indices over sparse features. */
  def leafSparseCol(model: BoosterModel)(idx: Column, vals: Column): Column =
    predSparse(model, TreePredict.Leaf)(idx, vals)

  /** Transform helper mirroring the reference Spark layer's output columns
    * (`XGBoostEstimator.scala:563-680`): adds margin/prediction (+leaf,
    * +contrib on demand). */
  def transform(df: DataFrame, model: BoosterModel, featuresCol: String,
      withLeaf: Boolean = false, withContrib: Boolean = false,
      iterationRange: (Int, Int) = (0, 0)): DataFrame = {
    // reference `predict(iteration_range=(a, b))` (core.py:2436): score
    // with boosting rounds [a, b) only; (0, 0) = the full model. The
    // slice happens driver-side once — the broadcast literal shrinks
    // with it, so partial-model scoring is CHEAPER, not a filter at
    // eval time. Rounds are counted as numGroups trees per round (the
    // default one-parallel-tree layout); num_parallel_tree > 1 ensembles
    // slice by tree index via model.slice directly.
    val m =
      if (iterationRange == ((0, 0))) model
      else model.slice(iterationRange._1 * model.numGroups,
        iterationRange._2 * model.numGroups)
    transformSliced(df, m, col(featuresCol), withLeaf, withContrib)
  }

  private def transformSliced(df: DataFrame, model: BoosterModel, f: Column,
      withLeaf: Boolean, withContrib: Boolean): DataFrame = {
    var out = df
    if (model.numGroups > 1) {
      out = out
        .withColumn("rawPrediction", marginCol(model)(f))
        .withColumn("probability", softprobCol(model)(f))
        .withColumn("prediction", argmaxCol(model)(f))
    } else {
      out = out
        .withColumn("margin", marginScalarCol(model)(f))
        .withColumn("prediction", predictCol(model)(f))
    }
    if (withLeaf) out = out.withColumn("leaf", leafCol(model)(f))
    if (withContrib) out = out.withColumn("contrib", contribCol(model)(f))
    out
  }
}
