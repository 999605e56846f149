package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-bench: bisect a slow query into stages and time each
  * variant twice in one JVM (second number = JIT-warm).
  * `runMain graft.Probe [sfDir]` */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.TextOps

    def ranked = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      (col("l_orderkey") % 100).as("q"),
      ((floor(col("l_extendedprice") * 100).cast("long") % 1000) / lit(1000.0)).as("p"),
      (col("l_linenumber") % 4).as("rel"),
      TextOps.hash60(concat_ws("_", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        floor(col("l_extendedprice") * 100).cast("long").cast("string"))).as("t"),
      when(col("l_linenumber") % 4 >= 2, 1.0).otherwise(0.0).as("yb"))

    val rw = Window.partitionBy(col("q")).orderBy(col("p").desc, col("t").asc)

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
    }

    if (sys.env.contains("PROBE_STUMP")) {
      import graft.tree.{GBTTrainer, TrainParams}
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
        col("l_quantity").cast("double"),
        col("l_linenumber").cast("double"),
        floor(col("l_extendedprice") / 100.0).cast("double").as("y"))
      val frac = sys.env.getOrElse("PROBE_FRAC", "1.0").toDouble
      val method = sys.env.getOrElse("PROBE_METHOD", "exact")
      val all = df.rdd.map(r => (Array(r.getDouble(0), r.getDouble(1)), r.getDouble(2), 1.0))
      val rdd = if (frac < 1.0) all.sample(withReplacement = false, frac, 1L) else all
      val model = new GBTTrainer(TrainParams(numRounds = 1, maxDepth = 1,
        eta = 1.0, lambda = 1.0, treeMethod = method, baseScore = Some(0.0),
        seed = 7)).fit(rdd)
      val nodes = model.trees(0).nodes
      println(s"PROBE-STUMP nodes=${nodes.length} root=${nodes(0)}")
      spark.stop(); return
    }
    time("base-count")(ranked.count())
    time("rk-only")(ranked.withColumn("rk", row_number().over(rw)).count())
    time("rk-filter")(ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 5).count())
    time("rk-agg(prec)")(ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 5)
      .groupBy("q").agg((sum(when(col("yb") > 0, 1.0).otherwise(0.0)) / 5).as("prec"))
      .agg(avg("prec"), count("*")).count())
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    time("rk-filter-noWGL")(ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 5).count())
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    time("rk-filter-loose")(ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 1000000000).count())
    time("rk-filter-noT")(ranked.withColumn("rk", row_number().over(
      Window.partitionBy(col("q")).orderBy(col("p").desc)))
      .where(col("rk") <= 5).count())
    def metrics(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      println(s"==== METRICS $name ====")
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println(s"  ${p.nodeName}: $ms".take(220))
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case _ =>
        }
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    metrics("rk-filter-noWGL", ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 5))
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    metrics("ndcg-agg", ranked
      .withColumn("rk", row_number().over(rw))
      .withColumn("irk", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("rel").desc, col("t").asc)))
      .groupBy("q").agg(sum(when(col("rk") <= 5, col("rel"))).as("a"),
        sum(when(col("irk") <= 5, col("rel"))).as("b")))
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "2097152")
    time("rk-filter-bigbuf")(ranked.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= 5).count())
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4096")
    time("rk-project-consume")(ranked.withColumn("rk", row_number().over(rw))
      .select((col("rk") <= 5).as("keep")).count())
    time("presort-only")(ranked.sortWithinPartitions(col("q"), col("p").desc, col("t")).count())
    time("ndcg-two-windows-collect") {
      ranked
        .withColumn("rk", row_number().over(rw))
        .withColumn("irk", row_number().over(
          Window.partitionBy(col("q")).orderBy(col("rel").desc, col("t").asc)))
        .groupBy("q").agg(sum(when(col("rk") <= 5, col("rel"))).as("a"),
          sum(when(col("irk") <= 5, col("rel"))).as("b")).collect().length.toLong
    }
    time("ndcg-two-windows")(ranked
      .withColumn("rk", row_number().over(rw))
      .withColumn("irk", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("rel").desc, col("t").asc)))
      .groupBy("q").agg(sum(when(col("rk") <= 5, col("rel"))).as("a"),
        sum(when(col("irk") <= 5, col("rel"))).as("b")).count())
    spark.stop()
  }
}
