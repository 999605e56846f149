package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.BoosterModel
import graft.predict.Predictor

/** Streaming inference (SURVEY §2.9): the reference has no streaming
  * semantics — training continuation + callbacks are its nearest notion —
  * but scoring a stream falls out of the Spark-first design for free: the
  * same codegen [[graft.predict.TreePredict]] expression evaluates
  * unchanged inside a Structured Streaming micro-batch plan (`readStream`
  * → transform → `writeStream`), the flattened model riding along as a
  * plan reference object. No per-batch model shipping, no state store —
  * scoring is stateless row-at-a-time work, so watermarks/output modes
  * stay whatever the surrounding query needs. */
object StreamingScorer {

  /** Append prediction columns to a (streaming or batch) DataFrame:
    * `prediction` always; `margin` for single-output models;
    * `rawPrediction`/`probability` vectors for multiclass. */
  def score(df: DataFrame, model: BoosterModel,
      featuresCol: String = "features"): DataFrame =
    Predictor.transform(df, model, featuresCol)

  /** Windowed streaming metric: per event-time window mean prediction +
    * count (the watermarked-aggregation shape a streaming eval pipeline
    * uses; elementwise metrics compose the same way). */
  def windowedMeanPrediction(scored: DataFrame, timeCol: String,
      window: String, watermark: String): DataFrame =
    scored
      .withWatermark(timeCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(timeCol), window))
      .agg(count(lit(1)).as("n"), avg(col("prediction")).as("mean_prediction"))
}
