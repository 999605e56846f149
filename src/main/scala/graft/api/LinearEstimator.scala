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
