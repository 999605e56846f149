package graft.api

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.linear.{GBLinearTrainer, LinearModel, LinearParams}

/** MLlib Estimator for the gblinear booster (the reference's
  * `booster=gblinear` path through the same Spark-package API,
  * `src/gbm/gblinear.cc` + `XGBoostEstimator.scala` surface): `fit(df)`
  * runs distributed coordinate descent, the model's `transform` scores
  * with a native codegen dot-product kernel ([[graft.ext.VectorDot]], no
  * UDF), and the model persists as JSON. */
class GraftLinearRegressor(override val uid: String)
    extends Estimator[GraftLinearModel] with GraftXGBParams {
  def this() = this(Identifiable.randomUID("graftLinReg"))

  final val objective = new Param[String](this, "objective", "gblinear objective")
  final val updater = new Param[String](this, "updater", "shotgun | coord_descent")
  final val featureSelector = new Param[String](this, "featureSelector",
    "cyclic | shuffle | random | greedy | thrifty")
  final val topK = new IntParam(this, "topK", "feature selector top-k (0 = all)")
  setDefault(objective -> "reg:squarederror", updater -> "shotgun",
    featureSelector -> "cyclic", topK -> 0)
  def setObjective(v: String): this.type = set(objective, v)
  def setUpdater(v: String): this.type = set(updater, v)
  def setFeatureSelector(v: String): this.type = set(featureSelector, v)
  def setTopK(v: Int): this.type = set(topK, v)

  override def fit(ds: Dataset[_]): GraftLinearModel = {
    validateFeatures(ds.schema)
    val params = LinearParams(
      objective = $(objective), numRounds = $(numRound), eta = $(eta),
      lambda = $(lambda), alpha = $(alpha), updater = $(updater),
      featureSelector = $(featureSelector), topK = $(topK), seed = $(seed))
    val m = new GBLinearTrainer(params).fit(extractRdd(ds))
    copyValues(new GraftLinearModel(uid, m)).setParent(this)
  }
  override def copy(extra: ParamMap): GraftLinearRegressor = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = {
    validateFeatures(schema)
    schema.add($(predictionCol), "double")
  }
}

class GraftLinearModel(override val uid: String, val model: LinearModel)
    extends Model[GraftLinearModel] with GraftXGBParams {

  override def transform(ds: Dataset[_]): DataFrame = {
    val f = featuresAsArray(ds)
    // dot product as a codegen kernel: missing (NaN) contributes 0,
    // matching LinearModel.margin / the reference's sparse semantics
    val dot = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.ext.VectorDot(ColumnBridge.expression(f),
        ColumnBridge.expression(lit(model.weights)), skipNaN = true))
    }
    val margin = dot + lit(model.baseScore + model.bias)
    val pred = model.objective match {
      case o if o.contains("logistic") => lit(1.0) / (lit(1.0) + exp(-margin))
      case "count:poisson" | "reg:gamma" | "reg:tweedie" => exp(margin)
      case _ => margin
    }
    ds.withColumn($(predictionCol), pred)
  }
  override def copy(extra: ParamMap): GraftLinearModel =
    copyValues(new GraftLinearModel(uid, model), extra).setParent(parent)
  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), "double")
}

/** MLlib classifier for the gblinear booster: binary (logistic link, one
  * weight vector) or multiclass (`numClass` ≥ 3 — softmax lanes via
  * [[graft.linear.GBLinearTrainer.fitMulti]], the reference's
  * `num_output_group` path). Emits the standard rawPrediction /
  * probability / prediction columns so MLlib evaluators and Pipelines
  * consume the output directly. */
class GraftLinearClassifier(override val uid: String)
    extends Estimator[GraftLinearClassificationModel] with GraftXGBParams {
  def this() = this(Identifiable.randomUID("graftLinCls"))

  final val numClass = new IntParam(this, "numClass", "number of classes (2 = binary)")
  final val updater = new Param[String](this, "updater", "shotgun | coord_descent")
  final val featureSelector = new Param[String](this, "featureSelector",
    "cyclic | shuffle | random | greedy | thrifty")
  final val topK = new IntParam(this, "topK", "feature selector top-k (0 = all)")
  final val rawPredictionCol = new Param[String](this, "rawPredictionCol", "raw margin column")
  final val probabilityCol = new Param[String](this, "probabilityCol", "probability column")
  setDefault(numClass -> 2, updater -> "shotgun", featureSelector -> "cyclic",
    topK -> 0, rawPredictionCol -> "rawPrediction", probabilityCol -> "probability")
  def setNumClass(v: Int): this.type = set(numClass, v)
  def setUpdater(v: String): this.type = set(updater, v)
  def setFeatureSelector(v: String): this.type = set(featureSelector, v)
  def setTopK(v: Int): this.type = set(topK, v)
  def setRawPredictionCol(v: String): this.type = set(rawPredictionCol, v)
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)

  override def fit(ds: Dataset[_]): GraftLinearClassificationModel = {
    validateFeatures(ds.schema)
    val params = LinearParams(
      objective = if ($(numClass) > 2) "multi:softprob" else "binary:logistic",
      numRounds = $(numRound), eta = $(eta), lambda = $(lambda), alpha = $(alpha),
      updater = $(updater), featureSelector = $(featureSelector),
      topK = $(topK), seed = $(seed))
    val trainer = new GBLinearTrainer(params)
    val m: Either[LinearModel, graft.linear.MultiLinearModel] =
      if ($(numClass) > 2) Right(trainer.fitMulti(extractRdd(ds), $(numClass)))
      else Left(trainer.fit(extractRdd(ds)))
    copyValues(new GraftLinearClassificationModel(uid, m)).setParent(this)
  }
  override def copy(extra: ParamMap): GraftLinearClassifier = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = {
    validateFeatures(schema)
    schema.add($(rawPredictionCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
      .add($(probabilityCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
      .add($(predictionCol), "double")
  }
}

class GraftLinearClassificationModel(override val uid: String,
    val model: Either[LinearModel, graft.linear.MultiLinearModel])
    extends Model[GraftLinearClassificationModel] with GraftXGBParams {
  final val rawPredictionCol = new Param[String](this, "rawPredictionCol", "raw margin column")
  final val probabilityCol = new Param[String](this, "probabilityCol", "probability column")
  setDefault(rawPredictionCol -> "rawPrediction", probabilityCol -> "probability")

  override def transform(ds: Dataset[_]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val f = featuresAsArray(ds)
    val arr2vec = org.apache.spark.ml.functions.array_to_vector _
    def dot(w: Array[Double], b: Double) = {
      ColumnBridge.column(graft.ext.VectorDot(ColumnBridge.expression(f),
        ColumnBridge.expression(lit(w)), skipNaN = true)) + lit(b)
    }
    model match {
      case Left(lm) =>
        val m = dot(lm.weights, lm.baseScore + lm.bias)
        val tmp = "_graft_lin_m"
        val mc = col(tmp)
        val p = lit(1.0) / (lit(1.0) + exp(-mc))
        ds.withColumn(tmp, m)
          .withColumn($(rawPredictionCol), arr2vec(array(-mc, mc)))
          .withColumn($(probabilityCol), arr2vec(array(lit(1.0) - p, p)))
          .withColumn($(predictionCol), when(p > 0.5, 1.0).otherwise(0.0))
          .drop(tmp)
      case Right(mm) =>
        // K codegen dot kernels → margin array → numerically-stable softmax
        val tmp = "_graft_lin_ms"
        val margins = array((0 until mm.numClass).map(k =>
          dot(mm.weights(k), mm.baseScore(k) + mm.bias(k))): _*)
        val ms = col(tmp)
        val mx = array_max(ms)
        val sqlfn = org.apache.spark.sql.functions
        val exps = sqlfn.transform(ms, v => exp(v - mx))
        val prob = sqlfn.transform(exps, v => v / sqlfn.aggregate(exps, lit(0.0), _ + _))
        ds.withColumn(tmp, margins)
          .withColumn($(rawPredictionCol), arr2vec(ms))
          .withColumn($(probabilityCol), arr2vec(prob))
          .withColumn($(predictionCol),
            (array_position(ms, array_max(ms)) - 1).cast("double"))
          .drop(tmp)
    }
  }
  override def copy(extra: ParamMap): GraftLinearClassificationModel =
    copyValues(new GraftLinearClassificationModel(uid, model), extra).setParent(parent)
  override def transformSchema(schema: StructType): StructType =
    schema.add($(rawPredictionCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
      .add($(probabilityCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
      .add($(predictionCol), "double")
}

object LinearModelIO {
  def toJson(m: LinearModel): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(JObject(
      "weights" -> JArray(m.weights.map(JDouble(_)).toList),
      "bias" -> JDouble(m.bias),
      "base_score" -> JDouble(m.baseScore),
      "objective" -> JString(m.objective),
      "num_features" -> JInt(BigInt(m.numFeatures)))))
  }
  def fromJson(s: String): LinearModel = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(s)
    LinearModel(
      (j \ "weights").extract[List[Double]].toArray,
      (j \ "bias").extract[Double],
      (j \ "base_score").extract[Double],
      (j \ "objective").extract[String],
      (j \ "num_features").extract[Int])
  }
}
