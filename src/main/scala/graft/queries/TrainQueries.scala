package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.predict.Predictor
import graft.tree.{GBTTrainer, TrainParams}

/** Training-based queries — not SQL-expressible (the boosting loop is
  * driver-coordinated iteration), so these get the driver's rows-only
  * check; correctness is covered by the ScalaTest invariants
  * (loss-decrease, SHAP sum, JSON roundtrip) mirroring the reference's
  * hypothesis-style tests (`tests/python/test_updaters.py`).
  */
object TrainQueries {

  private val featureCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Feature/label decode for the trainer: the projection (and label
    * arithmetic) happens in the DataFrame FIRST so column pruning reaches
    * the parquet scan — `.rdd` on the full table would read every column —
    * and the row decode is positional, not name-lookup-per-value. */
  def lineitemTrainingData(s: SparkSession, dir: String) = {
    val df = CoreQueries.table(s, dir, "lineitem").select(
      featureCols.map(c => col(c).cast("double")) :+
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 100000.0).as("label"): _*)
    val n = featureCols.length
    df.rdd.map { r =>
      val f = new Array[Double](n)
      var i = 0
      while (i < n) { f(i) = r.getDouble(i); i += 1 }
      (f, r.getDouble(n), 1.0)
    }
  }

  /** Deterministic full-binary-tree ensemble (heap layout): internal node i
    * splits feature (i % nf) at a threshold swept across the plausible
    * lineitem value range so every path is exercised. */
  private def syntheticEnsemble(numTrees: Int, depth: Int, nf: Int): graft.model.BoosterModel = {
    import graft.model.{BoosterModel, Node, Tree}
    val internal = (1 << depth) - 1
    val total = (1 << (depth + 1)) - 1
    val trees = Array.tabulate(numTrees) { t =>
      Tree(Array.tabulate(total) { i =>
        if (i < internal)
          Node(feature = (i + t) % nf, threshold = ((i * 7 + t * 13) % 50).toDouble,
            defaultLeft = (i + t) % 2 == 0, left = 2 * i + 1, right = 2 * i + 2,
            leaf = Array.empty, gain = 0.0, sumHess = 1.0, categoriesRight = Array.empty)
        else
          Node(feature = -1, threshold = 0.0, defaultLeft = true, left = -1, right = -1,
            leaf = Array(((i * 3 + t) % 11) * 0.01), gain = 0.0, sumHess = 1.0,
            categoriesRight = Array.empty)
      })
    }
    BoosterModel(trees, Array.fill(numTrees)(0.1), new Array[Int](numTrees),
      Array(0.5), "reg:squarederror", 1, nf)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hist-method regression: train → transform → per-flag error summary
    "t_train_hist_rmse" -> ((s, dir) => {
      val data = lineitemTrainingData(s, dir).cache()
      val model = new GBTTrainer(TrainParams(numRounds = 5, maxDepth = 4,
        maxBin = 64, eta = 0.3, seed = 7)).fit(data)
      import s.implicits._
      val df = CoreQueries.table(s, dir, "lineitem").select(
        array(featureCols.map(c => col(c).cast("double")): _*).as("features"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) / 100000.0).as("label"),
        col("l_returnflag"))
      val out = Predictor.transform(df, model, "features")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sqrt(avg(pow(col("prediction") - col("label"), 2))), 3).as("rmse"))
        .orderBy("l_returnflag")
      data.unpersist(blocking = false)
      out
    }),

    // pure inference throughput: a synthetic 60-tree depth-5 ensemble over
    // every lineitem row through the codegen predictor — isolates the
    // per-row scoring tax the 100 TB inference scan pays, with ZERO
    // training jobs in the timed region
    "t_predict_throughput" -> ((s, dir) => {
      val model = syntheticEnsemble(numTrees = 60, depth = 5,
        nf = featureCols.length)
      val df = CoreQueries.table(s, dir, "lineitem").select(
        array(featureCols.map(c => col(c).cast("double")): _*).as("features"))
      Predictor.transform(df, model, "features")
        .agg(count(lit(1)).as("n_scored"),
          round(avg(col("prediction")), 3).as("mean_pred"))
    }),

    // binary classification: train → leaf/contrib outputs exercised
    "t_train_logistic_auc" -> ((s, dir) => {
      val df = CoreQueries.table(s, dir, "lineitem")
      val n = featureCols.length
      val data = df.select(
        featureCols.map(c => col(c).cast("double")) :+
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"): _*)
        .rdd.map { r =>
          val f = new Array[Double](n)
          var i = 0
          while (i < n) { f(i) = r.getDouble(i); i += 1 }
          (f, r.getDouble(n), 1.0)
        }.cache()
      val model = new GBTTrainer(TrainParams(objective = "binary:logistic",
        numRounds = 5, maxDepth = 3, maxBin = 64, seed = 7)).fit(data)
      val scored = Predictor.transform(
        df.select(array(featureCols.map(c => col(c).cast("double")): _*).as("features"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y")),
        model, "features")
      data.unpersist(blocking = false)
      graft.metric.Metrics.aucBinary(scored, col("prediction"), col("y"), lit(1.0))
        .select(round(col("auc"), 3).as("auc"))
    }),

    // MLlib Estimator facade end-to-end: fit(df) → transform(df) with
    // rawPrediction/probability/prediction consumed by a standard evaluator
    "t_train_estimator" -> ((s, dir) => {
      import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
      // label is a noisy function of unit price so the evaluator AUC
      // demonstrates actual learning, not a coin-flip fixture
      // repartition after the projection: the sf parquet is a single row
      // group, so without it the scan — and every narrow stage downstream,
      // including the evaluator's per-row scoring — runs as ONE task
      // hash repartition on the key column (round-robin would sort each
      // input partition by the full row — array compares — first)
      val df = CoreQueries.table(s, dir, "lineitem")
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
        .select(
          array(featureCols.map(c => col(c).cast("double")): _*).as("features"),
          when(col("l_extendedprice") / col("l_quantity") +
            (col("l_orderkey") % 7) * 300.0 > 2500.0, 1.0).otherwise(0.0).as("label"))
      val model = new graft.api.XGBoostClassifier()
        .setNumRound(5).setMaxDepth(3).setMaxBin(64).setSeed(7L).fit(df)
      val out = model.transform(df).cache()
      out.count()
      val auc = new BinaryClassificationEvaluator()
        .setRawPredictionCol("rawPrediction").evaluate(out)
      val res = out.groupBy("prediction")
        .agg(count(lit(1)).as("n"))
        .withColumn("evaluator_auc", round(lit(auc), 3))
        .orderBy("prediction")
      out.unpersist(blocking = false)
      res
    }),

    // learning-to-rank: qid-grouped lambdarank training, NDCG@5 surfaced
    "t_train_rank_ndcg" -> ((s, dir) => {
      val df = CoreQueries.table(s, dir, "lineitem")
      val n = featureCols.length
      val data = df.select(
        featureCols.map(c => col(c).cast("double")) :+
          (col("l_linenumber") % 4).cast("double").as("rel") :+
          (col("l_orderkey") % 100).as("q"): _*)
        .rdd.map { r =>
          val f = new Array[Double](n)
          var i = 0
          while (i < n) { f(i) = r.getDouble(i); i += 1 }
          (f, r.getDouble(n), 1.0, r.getLong(n + 1))
        }.cache()
      val model = new GBTTrainer(TrainParams(objective = "rank:ndcg",
        numRounds = 5, maxDepth = 3, maxBin = 64, seed = 7)).fitRanking(data)
      val scored = Predictor.transform(
        df.select(array(featureCols.map(c => col(c).cast("double")): _*).as("features"),
          (col("l_orderkey") % 100).as("q"),
          (col("l_linenumber") % 4).cast("double").as("rel"),
          col("l_orderkey").as("t")),
        model, "features")
      data.unpersist(blocking = false)
      graft.metric.Metrics.ndcgAt(scored, col("q"), col("margin"), col("rel"), col("t"), k = 5)
        .select(round(col("ndcg"), 3).as("ndcg"), col("num_groups"))
    }),

    // model IO + feature importance surfaced as a table. The op under
    // test is importance+JSON roundtrip, not training: a 2-round model
    // exercises it identically at a fraction of the bench cost
    // the ops under test are importance extraction + JSON roundtrip —
    // driver-side model ops — so they run on a deterministic fixture
    // ensemble; training them from scratch here would just re-time the
    // trainer (already timed by t_train_*) to produce 4 numbers
    "t_feature_importance" -> ((s, dir) => {
      val model = syntheticEnsemble(numTrees = 20, depth = 4, nf = featureCols.length)
      val roundtrip = graft.model.BoosterModel.fromJson(model.toJson)
      import s.implicits._
      val imp = roundtrip.featureImportance("weight").toSeq.sortBy(_._1)
        .map { case (f, v) => (featureCols(f), v) }
      imp.toDF("feature", "n_splits").orderBy("feature")
    })
  )
}
