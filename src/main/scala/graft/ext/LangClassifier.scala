package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.linear.{GBLinearTrainer, LinearParams, MultiLinearModel}

/** Learned language identifier, trained WITH THE ENGINE ITSELF — the
  * fastText lang-id shape (Joulin et al. 2016: hashed character-n-gram
  * bag into a linear softmax) over the engine's multiclass gblinear.
  * Character n-grams INCLUDING spaces carry the word-boundary signal
  * that word-level hashing loses; the hashing trick keeps the feature
  * space a fixed `numBuckets` regardless of corpus or alphabet.
  *
  * Scale design (100 TB): featurization is map-only (per-row char-gram
  * hashing into a dense bounded vector — no vocabulary, no shuffle);
  * training is the engine's distributed coordinate-descent gblinear
  * (one treeAggregate per update, K gradient lanes); scoring broadcasts
  * the K weight vectors as literal arrays into codegen dot products and
  * takes a first-occurrence argmax — a map-only projection.
  *
  * Determinism: [[QualityClassifier.hash60]] is bit-identical to the
  * SQL `hash60`; integer gram counts are exact doubles; coord_descent
  * is order-deterministic (digest row `t_hash_lang_clf`); the argmax
  * tiebreak is lowest-class-index in both the JVM
  * (`MultiLinearModel.predictClass` strict `>`) and the SQL oracle
  * (`array_position` first match). */
object LangClassifier {

  /** Character n-grams of the lowercased text (positions 1..len−n+1). */
  def charNgrams(text: String, n: Int): Seq[String] = {
    val s = text.toLowerCase
    if (s.length < n) Seq.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n))
  }

  /** Dense hashed char-bigram counts (integer-exact doubles — the
    * SQL-oracle-portable convention of [[QualityClassifier.featurize]]). */
  def featurize(text: String, numBuckets: Int, n: Int = 2): Array[Double] = {
    val out = new Array[Double](numBuckets)
    charNgrams(text, n).foreach { g =>
      out((QualityClassifier.hash60(g) % numBuckets).toInt) += 1.0
    }
    out
  }

  /** (features, class-index label, weight) rows for [[GBLinearTrainer]];
    * `classes` must be the sorted distinct label values. */
  def trainingRows(docs: DataFrame, textCol: String, langCol: String,
      classes: Seq[String], numBuckets: Int): RDD[(Array[Double], Double, Double)] = {
    val idx = classes.zipWithIndex.toMap
    val nb = numBuckets
    docs.select(col(textCol).cast("string"), col(langCol).cast("string"))
      .rdd.map { r =>
        (featurize(r.getString(0), nb), idx(r.getString(1)).toDouble, 1.0)
      }
  }

  /** Train the softmax lang-id on labeled documents. Returns the model
    * plus the sorted class list (index ↔ class contract for scoring). */
  def train(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", numBuckets: Int = 64,
      params: LinearParams = LinearParams(objective = "multi:softmax",
        numRounds = 20, eta = 0.5, lambda = 1.0, updater = "coord_descent"))
      : (MultiLinearModel, Seq[String]) = {
    val classes = docs.select(col(langCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val model = new GBLinearTrainer(params)
      .fitMulti(trainingRows(docs, textCol, langCol, classes, numBuckets),
        classes.length)
    (model, classes)
  }

  /** Score documents: adds `lang_pred` (argmax class, lowest index on
    * ties) and `lang_margin` (the winning margin). Weight matrix rides
    * the plan as literal arrays through the codegen dot kernel. */
  def scoreDocs(docs: DataFrame, model: MultiLinearModel,
      classes: Seq[String], textCol: String = "text",
      numBuckets: Int = 64): DataFrame = {
    require(model.numClass == classes.length,
      s"model has ${model.numClass} classes, got ${classes.length} names")
    require(model.numFeatures == numBuckets,
      s"model has ${model.numFeatures} buckets, featurizer $numBuckets")
    val nb = numBuckets
    import org.apache.spark.sql.types._
    val withFeat = {
      val schema = docs.schema.add(StructField("graft_cbow", ArrayType(DoubleType, false)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      val idx = docs.schema.fieldIndex(textCol)
      docs.map { r =>
        val t = Option(r.getString(idx)).getOrElse("")
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ featurize(t, nb).toSeq)
      }(enc)
    }
    val margins = array(classes.indices.map { k =>
      Similarity.dot(col("graft_cbow"), array(model.weights(k).map(lit): _*)) +
        lit(model.bias(k) + model.baseScore(k))
    }: _*)
    val classArr = array(classes.map(lit): _*)
    withFeat
      .withColumn("_m", margins)
      .withColumn("lang_margin", array_max(col("_m")))
      // array_position returns the FIRST index of the max → lowest-class
      // tiebreak, matching MultiLinearModel.predictClass's strict >
      .withColumn("lang_pred",
        element_at(classArr, array_position(col("_m"), col("lang_margin")).cast("int")))
      .drop("graft_cbow", "_m")
  }
}
