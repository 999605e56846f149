package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan probe: run one SparkEntry query and print its final
  * (post-AQE) executed plan plus per-job timing. Not part of the driver
  * contract — a local profiling aid.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <queryName> [confK=V;K=V]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    if (args.length > 2) args(2).split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id*2)").collect() // warm
    // construction INSIDE the timed region: iterative operators do eager
    // localCheckpoint work while building the DataFrame (Bench times the
    // same way)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"== $name took $sec%.2f s ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
