package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.predict.Predictor
import graft.queries.{CoreQueries, EventQueries, KernelQueries, LinearQueries, MetricQueries, PipelineQueries, SourceQueries, TrainQueries}
import graft.tree.{GBTTrainer, TrainParams}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: end-to-end GBDT — sketch →
    * bin → hist-grow 5 trees → predict → per-flag rmse (driver smoke-checks
    * rows>0). */
  def entry(spark: SparkSession): DataFrame =
    TrainQueries.queries("t_train_hist_rmse")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ MetricQueries.queries ++ TrainQueries.queries ++
      PipelineQueries.queries ++ LinearQueries.queries ++ SourceQueries.queries ++
      EventQueries.queries ++ KernelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ MetricQueries.oracle ++ TrainQueries.oracle ++
      PipelineQueries.oracle ++ LinearQueries.oracle ++ SourceQueries.oracle ++
      EventQueries.oracle ++ KernelQueries.oracle
}
