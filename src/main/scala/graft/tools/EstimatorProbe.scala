package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the t_train_estimator bench row: times fit /
  * transform+materialize / evaluator separately to attribute the row's
  * wall clock. Not part of the driver contract. */
object EstimatorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val featureCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").limit(1).count() // warm
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .repartition(32, col("l_orderkey"))
      .select(
        array(featureCols.map(c => col(c).cast("double")): _*).as("features"),
        when(col("l_extendedprice") / col("l_quantity") +
          (col("l_orderkey") % 7) * 300.0 > 2500.0, 1.0).otherwise(0.0).as("label"))
    val model = t("fit") {
      new graft.api.XGBoostClassifier()
        .setNumRound(5).setMaxDepth(3).setMaxBin(64).setSeed(7L).fit(df)
    }
    val out = t("transform+cache+count") {
      val o = model.transform(df).cache(); o.count(); o
    }
    val auc = t("evaluator") {
      new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
        .setRawPredictionCol("rawPrediction").evaluate(out)
    }
    println(f"[probe] auc=$auc%.4f")
    spark.stop()
  }
}
