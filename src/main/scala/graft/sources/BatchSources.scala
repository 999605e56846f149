package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.HistogramCuts
import graft.tree.BInst

/** Batch-composition sources: the reference's iterator/callback DMatrix
  * construction and page-append operations re-expressed as DataFrame
  * unions. */
object BatchSources {

  /** Iterator/callback source (ref `XGDMatrixCreateFromCallback`,
    * `src/data/adapter.h:569-657`): a user-supplied batch iterator is
    * folded into ONE logical dataset. Spark unions are metadata-only —
    * no copy, each batch keeps its own partitions — so this IS the
    * streaming QuantileDMatrix construction: the sketch/binning pass that
    * follows consumes batches exactly once, partition by partition. */
  def fromBatches(batches: Iterator[DataFrame]): DataFrame = {
    require(batches.hasNext, "at least one batch required")
    batches.reduce(append)
  }

  /** Batch append (ref `MetaInfo::Extend` + `SparsePage::Push`,
    * `include/xgboost/data.h:189,417`): `unionByName` with the
    * column-consistency check the reference performs. */
  def append(a: DataFrame, b: DataFrame): DataFrame = {
    val ca = a.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val cb = b.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(ca.toSet == cb.toSet,
      s"batch schema mismatch: ${ca.diff(cb) ++ cb.diff(ca)}")
    a.unionByName(b)
  }

  /** Column-count unification (ref max(num_col) allreduce,
    * `include/xgboost/data.h:191`): the global max feature-array length,
    * one aggregation. */
  def unifiedFeatureCount(df: DataFrame, featuresCol: String = "features"): Int =
    df.agg(max(size(col(featuresCol)))).head().getInt(0)

  /** Pad every row's feature array to the unified length with NaN
    * (missing) so ragged batches bin consistently. */
  def unifyColumns(df: DataFrame, featuresCol: String = "features"): DataFrame = {
    val n = unifiedFeatureCount(df, featuresCol)
    val f = col(featuresCol)
    df.withColumn(featuresCol,
      when(size(f) < n,
        concat(f, transform(sequence(size(f), lit(n - 1)), _ => lit(Double.NaN))))
        .otherwise(f))
  }
}

/** Binned-table cache (ref binary DMatrix save/load:
  * `src/data/sparse_page_raw_format.cc`, `gradient_index_format.cc`, the
  * `#cache` URI suffix): the quantized rows and their cut points persist
  * as parquet + JSON, so repeated training runs skip the sketch + binning
  * passes entirely. Parquet IS the columnar page format — partitioned,
  * scan-pushdown-capable, and splittable on read. */
object BinnedCache {

  def save(spark: SparkSession, binned: RDD[BInst], cuts: HistogramCuts,
      path: String): Unit = {
    import spark.implicits._
    binned.map(r => (r.bins, r.label, r.weight, r.rowId, r.label2, r.qid,
        Option(r.idx)))
      .toDF("bins", "label", "weight", "row_id", "label2", "qid", "idx")
      .write.mode("overwrite").parquet(s"$path/rows")
    val cutsJson = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.compact(JsonMethods.render(
        JArray(cuts.cuts.map(f => JArray(f.map(JDouble(_)).toList)).toList)))
    }
    val p = new org.apache.hadoop.fs.Path(s"$path/cuts.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(cutsJson.getBytes("UTF-8")) finally out.close()
  }

  def load(spark: SparkSession, path: String): (RDD[BInst], HistogramCuts) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/rows")
      .as[(Array[Int], Double, Double, Long, Double, Long, Option[Array[Int]])]
      .rdd.map { case (bins, y, w, id, l2, qid, idx) =>
        BInst(bins, y, w, id, l2, qid, idx.orNull)
      }
    val p = new org.apache.hadoop.fs.Path(s"$path/cuts.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val cuts = HistogramCuts(JsonMethods.parse(json)
      .extract[List[List[Double]]].map(_.toArray).toArray)
    (rows, cuts)
  }
}
