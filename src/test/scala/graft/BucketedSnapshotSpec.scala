package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.BucketedSnapshot

/** The bucketed-snapshot contract: joins and aggregations on the bucket
  * key run WITHOUT an exchange on the bucketed side — asserted on the
  * physical plan, not just claimed. */
class BucketedSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("bucketed join on the key elides every exchange; results match the plain join") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val meta = docs.select(col("doc_id"), (col("n_chars") % 7).as("grade"))
    BucketedSnapshot.write(docs, "bk_docs", tmpDir("bk_docs"), "doc_id", 8)
    BucketedSnapshot.write(meta, "bk_meta", tmpDir("bk_meta"), "doc_id", 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedSnapshot.read(spark, "bk_docs")
        .join(BucketedSnapshot.read(spark, "bk_meta"), "doc_id")
      val rows = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed-bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      // same rows as the un-bucketed join
      val plain = docs.join(meta, "doc_id").count()
      assert(rows == plain && rows > 0)
      // aggregation on the bucket key also skips the exchange (plan-only
      // inspection: executedPlan is computed lazily and independently of
      // any action, so running the query first proves nothing extra)
      val agg = BucketedSnapshot.read(spark, "bk_docs")
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n${aggPlan.take(1200)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_docs")
      spark.sql("DROP TABLE IF EXISTS bk_meta")
    }
  }

  test("the gate artifact case: a bucketed prior-key table anti-joins without shuffling the prior side") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text")
    val priorKeys = graft.ext.Dedup.nearDupKeys(
      docs.where(col("doc_id") % 3 =!= 0), numHashes = 16)
    BucketedSnapshot.write(priorKeys.distinct(), "bk_prior_keys",
      tmpDir("bk_prior"), "_key", 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batchKeys = graft.ext.Dedup.nearDupKeys(
        docs.where(col("doc_id") % 3 === 0), numHashes = 16)
      // plan-only: exchange elision for bucketed scans is decided
      // statically (AQE cannot introduce an exchange the initial plan
      // lacks), so no action needs to run
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllMatchIn(df.queryExecution.executedPlan.toString).length
      val bucketed = exchanges(batchKeys.join(
        BucketedSnapshot.read(spark, "bk_prior_keys"), Seq("_key"), "left_anti"))
      // the plain form recomputes + re-shuffles the prior side from text
      val plain = exchanges(batchKeys.join(
        graft.ext.Dedup.nearDupKeys(docs.where(col("doc_id") % 3 =!= 0),
          numHashes = 16).distinct(), Seq("_key"), "left_anti"))
      // the batch side's own exchanges remain in both; the bucketed prior
      // contributes ZERO where the plain prior pays its aggregation and
      // join-key shuffles
      assert(bucketed < plain,
        s"bucketed prior must shuffle strictly less: $bucketed vs $plain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_prior_keys")
    }
  }
}
