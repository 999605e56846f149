package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordinal category dictionary + recode — the reference's categorical
  * container and ordinal re-coder (`src/data/cat_container.cc`,
  * `src/encoder/ordinal.h:9-31` `Recode`): train-time builds a per-column
  * dictionary value → dense code; prediction-time data is recoded through
  * the SAME dictionary so codes always mean the same category.
  *
  * Distributed build: ONE aggregation computes every column's category set
  * (`collect_set` partial+final merge — the Spark analog of the
  * reference's `AllreduceCategories`, `src/common/quantile.h:936`: each
  * partition contributes its local set, the merge is the global union).
  * Codes are assigned by sorted value order, making the mapping
  * deterministic and SQL-reproducible (`dense_rank() OVER (ORDER BY v)`).
  *
  * Recode is a broadcast map lookup (`typedlit(Map)` + `element_at`) —
  * codegen-friendly, no shuffle, no join; dictionaries are bounded by
  * `max_cat_threshold`-scale cardinality, so a literal map is the right
  * plan even at 100 TB (the map rides the plan, not the data). Unseen
  * categories at prediction time become null → missing, the sparsity-aware
  * default direction handles them (reference recode raises; we follow the
  * more useful Spark convention of `StringIndexer.handleInvalid=keep`).
  */
final case class CategoryDictionary(mapping: Map[String, Map[String, Int]])
    extends Serializable {

  def numCategories(col: String): Int = mapping(col).size

  /** Replace each dictionary column with its `<col>_code` int column. */
  def transform(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (c, m)) =>
      d.withColumn(s"${c}_code", element_at(typedlit(m), col(c)))
    }

  /** Recode expression for one column (null = unseen ⇒ missing). */
  def code(c: String): Column = element_at(typedlit(mapping(c)), col(c))

  def toJson: String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JObject(mapping.toList.sortBy(_._1).map { case (c, m) =>
      c -> JObject(m.toList.sortBy(_._2).map { case (v, i) => v -> JInt(BigInt(i)) })
    })
    JsonMethods.compact(JsonMethods.render(root))
  }
}

object CategoryDictionary {
  def fromJson(s: String): CategoryDictionary = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    CategoryDictionary(JsonMethods.parse(s).extract[Map[String, Map[String, Int]]]
      .map { case (c, m) => c -> m.map { case (v, i) => v -> i } })
  }
}

object CategoryEncoder {

  /** Build dictionaries for `cols` in one distributed pass. */
  def fit(df: DataFrame, cols: Seq[String]): CategoryDictionary = {
    val sets = df.select(cols.map(c => collect_set(col(c)).as(c)): _*).head()
    CategoryDictionary(cols.zipWithIndex.map { case (c, i) =>
      val vs = sets.getSeq[String](i).sorted
      c -> vs.zipWithIndex.toMap
    }.toMap)
  }
}
