package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DataLoader

/** URI-ingestion queries (§2.1 rows 1-2): a deterministic 1000-row slice
  * of lineitem is dumped to libsvm AND csv text, read back through
  * `DataLoader.load(uri)` (the `DMatrix::Load` analog over Spark's
  * partitioned file sources), and aggregated — DuckDB computes the same
  * aggregates straight from the parquet, so a hash match proves the text
  * scans parse values losslessly (`Double.toString` round-trips). */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_uri_scan" -> ((s, dir) => {
      val rows = CoreQueries.table(s, dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber").limit(1000)
        .select(
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 100000.0).as("y"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .collect()
      val tmp = java.nio.file.Files.createTempDirectory("graft_uri")
      val lsv = new StringBuilder
      val csv = new StringBuilder
      val jsl = new StringBuilder
      rows.foreach { r =>
        val y = r.getDouble(0)
        val fs = (1 to 4).map(r.getDouble)
        lsv.append(y).append(fs.zipWithIndex.map { case (v, i) => s" ${i + 1}:$v" }.mkString).append('\n')
        csv.append(y).append(',').append(fs.mkString(",")).append('\n')
        jsl.append(s"""{"label": $y, "features": [${fs.mkString(", ")}]}""").append('\n')
      }
      java.nio.file.Files.writeString(tmp.resolve("part.libsvm"), lsv.toString)
      java.nio.file.Files.writeString(tmp.resolve("part.csv"), csv.toString)
      java.nio.file.Files.writeString(tmp.resolve("part.jsonl"), jsl.toString)
      def agg(df: DataFrame, src: String): DataFrame = df.agg(
        lit(src).as("src"),
        count(lit(1)).as("n"),
        round(sum("label"), 4).as("sum_label"),
        round(sum(element_at(col("features"), 1)), 4).as("sum_qty"),
        round(sum(element_at(col("features"), 4)), 4).as("sum_tax"))
      agg(DataLoader.load(s, s"$tmp/part.libsvm?format=libsvm&numFeatures=4"), "libsvm")
        .unionByName(agg(DataLoader.load(s, s"$tmp/part.csv?format=csv"), "csv"))
        .unionByName(agg(DataLoader.load(s, s"$tmp/part.jsonl"), "jsonl"))
    })
  )

  private val subSql =
    """SELECT l_extendedprice * (1 - l_discount) / 100000.0 AS y,
      |  l_quantity, l_extendedprice, l_discount, l_tax
      |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_uri_scan" ->
      s"""WITH sub AS ($subSql),
         |a AS (
         |  SELECT count(*) AS n, round(sum(y), 4) AS sum_label,
         |    round(sum(l_quantity), 4) AS sum_qty, round(sum(l_tax), 4) AS sum_tax
         |  FROM sub
         |)
         |SELECT 'libsvm' AS src, n, sum_label, sum_qty, sum_tax FROM a
         |UNION ALL
         |SELECT 'csv' AS src, n, sum_label, sum_qty, sum_tax FROM a
         |UNION ALL
         |SELECT 'jsonl' AS src, n, sum_label, sum_qty, sum_tax FROM a""".stripMargin
  )
}
