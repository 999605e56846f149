package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, PipelineQueries}
import graft.tree.{GBTTrainer, TrainParams}

/** Physical-plan audits: the properties that decide 100 TB behavior are
  * asserted here, not just eyeballed — filters reach the parquet scan,
  * small dimensions broadcast, scoring stays inside whole-stage codegen,
  * recode never joins, and the LSH pipeline never goes cartesian. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and projection push down to the parquet scan") {
    val p = plan(CoreQueries.queries("q_filter_cast")(spark, sf))
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("GreaterThan(l_discount"), s"discount filter not pushed:\n${p.take(800)}")
    // column pruning: the scan must not read all 11 lineitem columns
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("l_shipdate"), s"unpruned scan: $read")
  }

  test("small dimension joins broadcast") {
    val p = plan(CoreQueries.queries("q_join_agg")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin"), "small dim should not sort-merge")
  }

  test("prediction runs inside whole-stage codegen") {
    val rows = (0 until 200).map(i => (Array(i.toDouble), i.toDouble, 1.0))
    val model = new GBTTrainer(TrainParams(numRounds = 2, maxDepth = 2, seed = 1))
      .fit(spark.sparkContext.parallelize(rows, 2))
    import org.apache.spark.sql.functions._
    // parquet-backed input: a local Seq would constant-fold to a
    // LocalTableScan and hide the codegen pipeline
    val df = CoreQueries.table(spark, sf, "lineitem")
      .select(array(col("l_quantity"), col("l_tax")).as("features"))
    val scored = df.withColumn("pred",
      graft.predict.Predictor.predictCol(model)(col("features")))
    val p = plan(scored)
    assert(p.contains("graft_predict"), "predict expression missing from plan")
    // the `*(n)` prefix marks a WholeStageCodegen stage in plan strings
    assert("\\*\\(\\d+\\) Project \\[[^\n]*graft_predict".r.findFirstIn(p).isDefined,
      s"predict fell out of codegen:\n${p.take(600)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("SQLAppliedFunction"),
      "predict must not use a UDF path")
  }

  test("decontamination broadcasts the benchmark n-gram set; DSIR broadcasts the bucket table") {
    val pDecon = plan(PipelineQueries.queries("p_decontaminate")(spark, sf))
    assert(pDecon.contains("BroadcastHashJoin"),
      s"benchmark n-grams must broadcast:\n${pDecon.take(800)}")
    assert(!pDecon.contains("CartesianProduct"), "decontamination went cartesian")
    val pDsir = plan(PipelineQueries.queries("p_dsir_weight")(spark, sf))
    // two broadcasts by design: the 1-row totals and the bounded bucket table
    assert(pDsir.contains("BroadcastHashJoin") || pDsir.contains("BroadcastNestedLoopJoin"),
      s"bucket lookup must broadcast:\n${pDsir.take(800)}")
    assert(!pDsir.contains("CartesianProduct"), "dsir went cartesian")
    // the unigram-LM vocabulary join is NOT hint-forced to broadcast
    // (unbounded vocab): at this fixture size Catalyst auto-broadcasts the
    // small side, so assert the at-scale shape by disabling the size-based
    // auto-broadcast — the plan must degrade to a shuffle join, proving no
    // broadcast() hint pins the unbounded side in memory
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val pNll = plan(PipelineQueries.queries("p_unigram_nll")(spark, sf))
      assert(pNll.contains("SortMergeJoin") || pNll.contains("ShuffledHashJoin"),
        s"vocab join should shuffle once auto-broadcast is off:\n${pNll.take(800)}")
      // the DSIR bucket lookup is hint-forced: it must broadcast even with
      // size-based auto-broadcast disabled (bounded by construction)
      val pDsir2 = plan(PipelineQueries.queries("p_dsir_weight")(spark, sf))
      assert(pDsir2.contains("BroadcastHashJoin"),
        s"bucket lookup must stay broadcast at scale:\n${pDsir2.take(800)}")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("category recode is a broadcast map lookup, not a join") {
    val li = CoreQueries.table(spark, sf, "lineitem")
    val dict = graft.data.CategoryEncoder.fit(li, Seq("l_returnflag"))
    val p = plan(dict.transform(li).select("l_returnflag_code"))
    assert(!p.contains("Join"), s"recode must not join:\n${p.take(600)}")
  }

  test("near-dup candidate generation never goes cartesian") {
    val p = plan(PipelineQueries.queries("p_near_dup")(spark, sf))
    assert(!p.contains("CartesianProduct"), "LSH pipeline must stay bucketed")
    // the self-join on (band, key) is an equi-join
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected an equi-join on bucket keys")
  }

  test("cleaning shuffle ops: hash-keyed equi-joins only, no cartesian, window on domain") {
    // paragraph dedup: count pass + join-back ride the 60-bit hash key
    val pPara = plan(PipelineQueries.queries("p_para_dedup")(spark, sf))
    assert(!pPara.contains("CartesianProduct"), "paragraph dedup must stay keyed")
    assert(pPara.contains("HashAggregate"), "expected map-side combined counts")
    // span removal: hot-set join is an equi-join on the ngram key
    val pSpan = plan(PipelineQueries.queries("p_span_dedup")(spark, sf))
    assert(!pSpan.contains("CartesianProduct"), "span removal must stay keyed")
    assert(pSpan.contains("SortMergeJoin") || pSpan.contains("ShuffledHashJoin") ||
      pSpan.contains("BroadcastHashJoin"), "expected an equi-join on the ngram key")
    // domain cap: exactly one Window (the per-domain quota), no join
    val pCap = plan(PipelineQueries.queries("p_domain_cap")(spark, sf))
    assert(pCap.contains("Window"), "expected the per-domain row_number window")
    assert(!pCap.contains("Join"), "domain cap must not join")
  }

  test("funnel is one user-keyed aggregation: no joins, no window") {
    val p = plan(graft.queries.EventQueries.queries("e_funnel")(spark, sf))
    assert(!p.contains("Join"), s"funnel must not join:\n${p.take(600)}")
    assert(!p.contains("Window"), s"funnel must not window:\n${p.take(600)}")
    // the greedy stage fold rides ObjectHashAggregate (collect_list)
    assert(p.contains("Aggregate"), "expected the user-keyed aggregation")
  }

  test("token budget: text stays out of the cumsum exchange; incremental dedup stays keyed") {
    val pBudget = plan(PipelineQueries.queries("p_token_budget")(spark, sf))
    // no per-stratum window over the full stream. The cumsum itself is
    // opaque here: DistributedCumsum returns an RDD-backed frame, so its
    // internal range exchange can never appear in this plan string — what
    // IS visible is the ExistingRDD boundary (the query's own trailing
    // orderBy also emits a rangepartitioning, so matching on that string
    // would be vacuous)
    assert(!pBudget.contains("Window"), s"no window:\n${pBudget.take(600)}")
    assert(pBudget.contains("ExistingRDD"),
      s"expected the RDD-backed cumsum boundary:\n${pBudget.take(800)}")
    val pIncr = plan(PipelineQueries.queries("p_incr_dedup")(spark, sf))
    assert(!pIncr.contains("CartesianProduct"), "incremental dedup must stay keyed")
    assert(pIncr.contains("LeftAnti") || pIncr.contains("left_anti"),
      s"expected the hash anti-join:\n${pIncr.take(800)}")
  }

  test("incremental near-dedup stays keyed; semdedup composition never goes cartesian") {
    val pNear = plan(PipelineQueries.queries("p_incr_neardup")(spark, sf))
    assert(!pNear.contains("CartesianProduct"),
      "signature gate must stay keyed")
    assert(pNear.contains("LeftAnti") || pNear.contains("left_anti"),
      s"expected the signature-key anti-join:\n${pNear.take(800)}")
    val pSem = plan(PipelineQueries.queries("p_semdedup_keep_best")(spark, sf))
    assert(!pSem.contains("CartesianProduct"),
      "semdedup pair mining must stay an equi-join on the cell id")
  }

  test("epoch shards: range cumsum + broadcast prefix, no per-shard window; keep-first span dedup stays keyed") {
    val pShards = plan(PipelineQueries.queries("p_epoch_shards")(spark, sf))
    // the within-shard rank must ride the cumsum, not a
    // Window.partitionBy(shard) (one task per shard = 100 GB sorts).
    // The cumsum's own range exchange is invisible here (RDD-backed
    // frame → ExistingRDD boundary; the rangepartitioning string in
    // this plan would come from the query's trailing orderBy, so
    // asserting on it proves nothing)
    assert(!pShards.contains("Window"), s"no per-shard window:\n${pShards.take(600)}")
    assert(pShards.contains("ExistingRDD"),
      s"expected the RDD-backed cumsum boundary:\n${pShards.take(800)}")
    assert(pShards.contains("BroadcastHashJoin"),
      s"the numShards-row prefix table must broadcast:\n${pShards.take(800)}")
    val pKf = plan(PipelineQueries.queries("p_span_dedup_keep_first")(spark, sf))
    assert(!pKf.contains("CartesianProduct"),
      "canonical-occurrence resolution must stay on the n-gram key")
    // canonical min is a map-side-combined aggregate, never a per-ngram
    // window (a hot boilerplate n-gram would sort in one task)
    assert(!pKf.contains("Window"), s"no per-ngram window:\n${pKf.take(600)}")
  }

  test("near-dup verification broadcast is gated by BYTES, not rows") {
    import org.apache.spark.sql.functions._
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    // identical texts in pairs (2i, 2i+1) so every doc is a candidate-pair
    // member and docsSh carries the whole corpus's shingle arrays
    def corpus(nDocs: Int, tokensPerDoc: Int) =
      spark.range(nDocs).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(tokensPerDoc - 1)),
          i => concat(lit("tok"), i.cast("string"), lit("_"),
            floor(col("id") / 2).cast("long").cast("string"))), " ").as("text"))
    def verifyPlan(df: org.apache.spark.sql.DataFrame): String =
      graft.ext.Dedup.nearDupPairs(df, "text", "doc_id",
        numHashes = 16, bands = 4).queryExecution.executedPlan.toString
    try {
      // WIDE corpus: 8k rows — far under the old 100k-row threshold —
      // but ~20 MB of shingle strings, over the 64 KB session budget.
      // The old rows<=100k gate would broadcast this shape (at real
      // web-doc widths: a multi-GB executor OOM); the byte gate must NOT
      // hint a broadcast. (Catalyst estimates a checkpointed LogicalRDD
      // at ~18 B/row — arrays of strings count as pointer-sized — so the
      // fixture needs >3.6k rows to ALSO clear the stats-based
      // auto-broadcast and expose our gate's decision in the plan.)
      spark.conf.set(thresholdKey, (64 * 1024).toString)
      val pWide = verifyPlan(corpus(8000, 100))
      assert(!pWide.contains("BroadcastHashJoin"),
        s"wide docs under a 64 KB budget must NOT broadcast:\n${pWide.take(800)}")
      // narrow corpus at the default 10 MB budget: broadcast expected
      spark.conf.set(thresholdKey, (10 * 1024 * 1024).toString)
      val pNarrow = verifyPlan(corpus(30, 20))
      assert(pNarrow.contains("BroadcastHashJoin"),
        s"narrow docs under the default budget must broadcast:\n${pNarrow.take(800)}")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("r14 ops: holdout/attrition/norm-dedup map-shaped, byte packing windowless, sample melt exchange-free") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // domain holdout: the assignment IS a hash — map-only, no exchange,
    // no join, no window on the operator itself
    val pH = plan(graft.ext.UrlOps.holdoutByDomain(
      docs.select(col("doc_id"),
        concat(lit("https://www.ex"), col("doc_id") % 40, lit(".com/p")).as("url")),
      "url", valPermille = 200))
    assert(!pH.contains("Exchange") && !pH.contains("Join") &&
      !pH.contains("Window"), pH.take(600))
    // attrition: classification is one when-chain — no join, no window
    val ffPlan = plan(docs.select(
      when(!coalesce(col("n_chars") > 10, lit(false)), lit(0))
        .otherwise(lit(1)).as("_ff")).groupBy("_ff").agg(count(lit(1))))
    assert(!ffPlan.contains("Join") && !ffPlan.contains("Window"), ffPlan.take(400))
    // normalized dedup: exactly the exactDedup shape — since r19 a
    // SINGLE-PASS map-side-combined min_by(struct, id) aggregate, NOT
    // a window (a byte-identical mega-group must never sort through
    // one task) and NOT the r18 agg + semi-join (which evaluated the
    // canonicalization subtree twice and paid a second exchange).
    // Exactly ONE shuffle exchange, zero joins, zero windows.
    val pN = plan(graft.ext.Dedup.normalizedDedup(docs, "text", "doc_id"))
    assert(!pN.contains("Join") && !pN.contains("Window") &&
      "Exchange hashpartitioning".r.findAllMatchIn(pN).length == 1,
      pN.take(600))
    // byte packing: the cumsum is the range boundary — no per-shard
    // window, no join on the data path
    val pP = plan(graft.ext.Curation.packShardsBySize(
      docs.withColumn("n_bytes", octet_length(col("text"))),
      "doc_id", "n_bytes", 16384L))
    assert(!pP.contains("Window"), "packing must not window:\n" + pP.take(600))
    // sample melt: writeSampleShards' member explode is map-side —
    // Generate over the scan, no join before the shard repartition
    val melted = docs.select(col("doc_id").cast("string").as("k"),
      col("text").cast("binary").as("b"))
      .select(explode(array(struct(lit("txt").as("ext"), col("b").as("body")))).as("m"))
    assert(!plan(melted).contains("Exchange"), plan(melted).take(400))
  }

  test("r15: sample-shard read reassembles with ZERO exchange (adjacency fold, not a blob groupBy)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 64)
      .withColumn("shard", pmod(col("doc_id"), lit(2)))
      .withColumn("key", format_string("%06d", col("doc_id")))
      .withColumn("txt", col("text").cast("binary"))
      .withColumn("meta", col("lang").cast("binary"))
    val out = java.nio.file.Files.createTempDirectory("plan_samples")
    graft.sources.TarShards.writeSampleShards(docs, out.toString, "shard",
      "key", Seq("json" -> "meta", "txt" -> "txt"))
    try {
      val df = graft.sources.TarShards.readSampleShards(spark, out.toString)
      val p = plan(df)
      // the writer guarantees <key>.* adjacency within each archive; the
      // reader must exploit it — a groupBy here would shuffle every blob
      // byte of the corpus
      assert(!p.contains("Exchange"),
        "sample reassembly must fold adjacent members, not shuffle blobs:\n" +
          p.take(600))
      assert(df.count() == 64)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("r15: the four-tier gate rows stay keyed — no cartesian anywhere in the plan") {
    val pN = plan(PipelineQueries.queries("p_crawl_norm")(spark, sf))
    assert(!pN.contains("CartesianProduct"),
      "the normalized tier must stay an equi-anti-join")
    val pT = plan(PipelineQueries.queries("p_crawl_norm_ttl")(spark, sf))
    assert(!pT.contains("CartesianProduct"),
      "four-tier retention must stay keyed")
  }

  test("corpus-scale operating points stay equi-joined (k128 miner, multi-probe ANN)") {
    val p128 = plan(PipelineQueries.queries("p_near_dup_k128")(spark, sf))
    assert(!p128.contains("CartesianProduct"), "128-hash miner must stay bucketed")
    val pAnn = plan(PipelineQueries.queries("p_ann_lsh_p16")(spark, sf))
    assert(!pAnn.contains("CartesianProduct"), "multi-probe ANN must stay bucketed")
    assert(pAnn.contains("SortMergeJoin") || pAnn.contains("ShuffledHashJoin") ||
      pAnn.contains("BroadcastHashJoin"), "expected an equi-join on the probe bucket")
    // the ×17 probe fanout must sit on the QUERY side only: the corpus
    // branch reaches the join without a Generate (explode) above its scan
    val joinIdx = pAnn.indexOf("Join")
    assert(joinIdx >= 0 && pAnn.substring(0, joinIdx).nonEmpty)
    assert(pAnn.contains("Generate explode"), "probe fanout should be an explode")
  }
}
