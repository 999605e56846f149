package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.linear.{GBLinearTrainer, LinearModel, LinearParams}

/** Learned corpus-quality filter, trained WITH THE ENGINE ITSELF — the
  * fastText/DataComp-shape classifier that graduates from the heuristic
  * gates ([[TextOps.qualityScore]], [[CorpusFilters]]) to a model: hashed
  * bag-of-words features (bounded dimensionality, the DSIR/Vowpal hashing
  * trick) into a [[graft.linear.GBLinearTrainer]] logistic regression.
  * The reference plays exactly this role in public curation stacks (a
  * gradient-boosted/linear filter over cheap text features); here the
  * whole loop — featurize, weak-label, train, score — stays inside the
  * library.
  *
  * Scale design (100 TB): featurization is map-only (per-row token
  * hashing into a fixed `numBuckets`-dim dense vector — no vocabulary,
  * no shuffle, same rationale as [[CorpusFilters.dsirLogWeight]]); the
  * trainer is the engine's distributed coordinate-descent gblinear
  * (histogram-free, one treeAggregate per update); scoring broadcasts
  * the weight vector as a literal array into a codegen dot product
  * ([[Similarity.dot]]) — no UDF, no driver loop.
  *
  * Determinism: the JVM `hash60` here is bit-identical to
  * [[TextOps.hash60]]'s SQL (first 15 hex digits of md5 as a long), so a
  * featurization can be reproduced in the DuckDB oracle; training with
  * `updater=coord_descent` is order-deterministic (golden-digest row
  * `t_hash_quality_clf`).
  */
object QualityClassifier {

  /** JVM twin of [[TextOps.hash60]]: first 15 hex digits of md5(s) as a
    * non-negative long — bit-identical to the SQL/DuckDB spelling. */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // 15 hex digits = 60 bits: 7 full bytes + the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Dense hashed-BoW vector for one token array: bucket = hash60 mod
    * `numBuckets`, value = ln(1 + count) (sublinear tf, the fastText
    * convention) — or the raw integer count with `sublinearTf = false`,
    * which keeps every feature value an exact double for the SQL-oracle
    * scoring path (integer counts survive any engine bit-for-bit; ln is
    * a libm call whose last ulp is not portable). */
  def featurize(toks: Seq[String], numBuckets: Int,
      sublinearTf: Boolean = true): Array[Double] = {
    val counts = new Array[Int](numBuckets)
    toks.foreach { t => counts((hash60(t) % numBuckets).toInt) += 1 }
    val out = new Array[Double](numBuckets)
    var b = 0
    while (b < numBuckets) {
      if (counts(b) > 0)
        out(b) = if (sublinearTf) math.log1p(counts(b).toDouble) else counts(b).toDouble
      b += 1
    }
    out
  }

  /** Weak label column from the heuristic gates: 1 iff the composite
    * quality score clears `minQuality` AND the stopword ratio clears
    * `minEnRatio` — the standard bootstrap where heuristics label the
    * training set and the learned filter generalizes past them. */
  def weakLabel(textCol: Column, minQuality: Double = 0.55,
      minEnRatio: Double = 0.05): Column = {
    val t = TextOps.tokens(textCol)
    (TextOps.qualityScore(textCol, t) >= minQuality &&
      TextOps.enStopwordRatio(t) > minEnRatio).cast("double")
  }

  /** (features, label, weight) training rows from a document table —
    * map-only featurization, ready for [[GBLinearTrainer]]. */
  def trainingRows(docs: DataFrame, textCol: String = "text",
      numBuckets: Int = 256, minQuality: Double = 0.55,
      minEnRatio: Double = 0.05): RDD[(Array[Double], Double, Double)] = {
    val nb = numBuckets
    docs.select(col(textCol).cast("string"), weakLabel(col(textCol), minQuality, minEnRatio))
      .rdd.map { r =>
        val toks = r.getString(0).split(" ", -1).toSeq
        (featurize(toks, nb), r.getDouble(1), 1.0)
      }
  }

  /** Train the logistic quality filter on heuristic weak labels.
    * `coord_descent` keeps the fit order-deterministic (golden-hash
    * reproducible); shotgun is fine when bit-reproducibility across runs
    * is not required. */
  def trainFilter(docs: DataFrame, textCol: String = "text",
      numBuckets: Int = 256, minQuality: Double = 0.55,
      minEnRatio: Double = 0.05,
      params: LinearParams = LinearParams(objective = "binary:logistic",
        numRounds = 20, eta = 0.5, lambda = 1.0, updater = "coord_descent")): LinearModel = {
    require(params.objective == "binary:logistic",
      s"quality filter is a binary classifier, got ${params.objective}")
    new GBLinearTrainer(params)
      .fit(trainingRows(docs, textCol, numBuckets, minQuality, minEnRatio))
  }

  /** Score documents with a trained filter: adds `quality_margin` =
    * w·bow + b (exact doubles — pure +/× over integer-exact features when
    * `sublinearTf = false`, so it hash-matches a SQL oracle) and
    * `quality_prob` = sigmoid(margin). The weight vector rides into the
    * plan as a literal array through the codegen [[VectorDot]] kernel —
    * scoring is a map-only projection (the "model broadcast" is the
    * literal). */
  def scoreDocs(docs: DataFrame, model: LinearModel, textCol: String = "text",
      numBuckets: Int = 256, sublinearTf: Boolean = true): DataFrame = {
    require(model.numFeatures == numBuckets,
      s"model has ${model.numFeatures} buckets, featurizer $numBuckets")
    val nb = numBuckets
    import org.apache.spark.sql.types._
    val withFeat = {
      val schema = docs.schema.add(StructField("graft_bow", ArrayType(DoubleType, false)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      val idx = docs.schema.fieldIndex(textCol)
      docs.map { r =>
        val toks = Option(r.getString(idx)).getOrElse("").split(" ", -1).toSeq
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ featurize(toks, nb, sublinearTf).toSeq)
      }(enc)
    }
    val w = array(model.weights.map(lit): _*)
    val margin = Similarity.dot(col("graft_bow"), w) +
      lit(model.bias + model.baseScore)
    withFeat
      .withColumn("quality_margin", margin)
      .withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-col("quality_margin"))))
      .drop("graft_bow")
  }
}
