package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URI data loading — the reference's `DMatrix::Load(uri)`
  * (`src/data/data.cc:915-1020`): `path[?format=libsvm|csv|parquet][#cache]`.
  * The dmlc text parsers map onto Spark's built-in partitioned file
  * sources (`src/data/file_iterator.h:35-71` row iterator with
  * part_idx/n_parts ≙ Spark's file-split scan), so ingestion is already
  * distributed, pushdown-capable, and needs no custom reader.
  *
  * Output schema is normalized to `(label double, features array<double>)`
  * — the adapter contract every trainer entry point takes. The `#cache`
  * suffix is accepted and ignored (Spark's own caching replaces the
  * external-memory page cache).
  */
object DataLoader {

  final case class ParsedUri(path: String, format: String,
      options: Map[String, String] = Map.empty)

  def parseUri(uri: String): ParsedUri = {
    val noCache = uri.split('#')(0)
    val parts = noCache.split('?')
    val opts: Map[String, String] =
      if (parts.length > 1)
        parts(1).split('&').flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _           => None
          }
        }.toMap
      else Map.empty
    val fmt = opts.getOrElse("format", {
      val p = parts(0)
      if (p.endsWith(".csv")) "csv"
      else if (p.endsWith(".parquet")) "parquet"
      else if (p.endsWith(".jsonl") || p.endsWith(".json")) "jsonl"
      else if (p.endsWith(".orc")) "orc"
      else "libsvm"
    })
    ParsedUri(parts(0), fmt, opts)
  }

  /** Load to `(label, features)`. libsvm: 1-based sparse text → dense
    * array (missing stays 0, matching the reference's sparse semantics).
    * csv: label in the first column, features after (dmlc default
    * `label_column=0`). parquet: expects a `label` column; every other
    * numeric column becomes a feature in schema order. */
  def load(spark: SparkSession, uri: String): DataFrame = {
    val ParsedUri(path, fmt, opts) = parseUri(uri)
    fmt match {
      case "libsvm" =>
        // numFeatures, when given (`?numFeatures=N`, ≙ dmlc URI args),
        // skips the extra inference pass over the whole input
        val reader = opts.get("numFeatures")
          .foldLeft(spark.read.format("libsvm"))((r, n) => r.option("numFeatures", n))
        val raw = reader.load(path)
        raw.select(col("label").cast("double"),
          org.apache.spark.ml.functions.vector_to_array(col("features")).as("features"))
      case "csv" =>
        val raw = spark.read.option("inferSchema", "true").csv(path)
        val cols = raw.columns
        raw.select(col(cols.head).cast("double").as("label"),
          array(cols.tail.map(c => col(c).cast("double")): _*).as("features"))
      case "parquet" | "orc" =>
        // both columnar formats share the schema contract: a `label`
        // column, every other numeric column a feature in schema order
        val raw = if (fmt == "orc") spark.read.orc(path) else spark.read.parquet(path)
        val feats = raw.schema.fields.filter { f =>
          f.name != "label" && f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        }.map(_.name)
        raw.select(col("label").cast("double"),
          array(feats.map(c => col(c).cast("double")): _*).as("features"))
      case "jsonl" =>
        // JSON-lines {"label": y, "features": [..]} — the corpus
        // interchange format; Spark's json source is split-distributed
        // like the text sources, one object per line
        val raw = spark.read.json(path)
        raw.select(col("label").cast("double"),
          col("features").cast("array<double>").as("features"))
      case other => throw new IllegalArgumentException(
        s"unknown format in URI '$uri': $other (libsvm, csv, parquet, jsonl)")
    }
  }
}
