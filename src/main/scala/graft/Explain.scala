package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan of a registered SparkEntry query — the loop the
  * brief asks for ("explain the plan and iterate until it's the plan you'd
  * want") without editing query code. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"==== $name ====")
    df.explain("formatted")
    spark.stop()
  }
}
