package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merges + subword encode
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units") — upgrading the pipeline's token accounting from the
  * BPE-ish regex in [[TextOps]] to a real trained subword vocabulary.
  *
  * Scale design (100 TB): BPE training operates on WORD COUNTS, not the
  * corpus — the classic formulation (and every production trainer) first
  * collapses the corpus to (word, count) pairs. Here that is one
  * map-side-combined groupBy; the merge loop then runs driver-side over
  * the TOP-`topWords` words (deterministic count-desc/word-asc order) —
  * a bounded collect like the IVF quantizer sample, standard practice
  * because the count-weighted tail below rank ~10⁵ cannot influence the
  * first thousands of merges on any natural-language distribution.
  * Encoding broadcasts the merge ranks (numMerges entries) and is pure
  * map-side work — no shuffle touches the corpus.
  *
  * Determinism contract: ties in pair frequency break by (count desc,
  * left asc, right asc), so the merge list — and therefore every
  * encoding — is reproducible across cluster layouts; the golden-digest
  * row `t_hash_bpe` pins it.
  */
object Bpe {

  /** Trained tokenizer: ordered merge list (rank = index). */
  final case class Model(merges: Vector[(String, String)]) {
    /** rank lookup used by the encoder */
    @transient lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap

    /** Encode one word: start from characters, repeatedly apply the
      * LOWEST-RANK merge present among adjacent symbol pairs (the standard
      * BPE inference rule — training-order, not greedy-longest). */
    def encodeWord(word: String): Vector[String] = {
      if (word.isEmpty) return Vector.empty
      var syms = word.toCharArray.map(_.toString).toVector
      var continue = syms.length > 1
      while (continue) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < syms.length - 1) {
          rank.get((syms(i), syms(i + 1))).foreach { r =>
            if (r < bestRank) { bestRank = r; bestIdx = i }
          }
          i += 1
        }
        if (bestIdx < 0) continue = false
        else {
          syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
            syms.drop(bestIdx + 2)
          continue = syms.length > 1
        }
      }
      syms
    }

    /** Encode whitespace-tokenized text to subword pieces. */
    def encode(text: String): Vector[String] =
      text.split(" ").iterator.filter(_.nonEmpty).flatMap(encodeWord).toVector
  }

  /** Classic BPE merge loop over (symbol-sequence, count) pairs. Exposed
    * for tests; [[trainFromCorpus]] feeds it the distributed word counts. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Model = {
    // words as mutable symbol buffers, weighted by corpus count
    val seqs: Array[(mutable.ArrayBuffer[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (mutable.ArrayBuffer(w.toCharArray.map(_.toString): _*), c) }
      .toArray
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then (left, right) asc
        val best = pairCounts.iterator.reduce { (a, b) =>
          val cmp = java.lang.Long.compare(a._2, b._2)
          if (cmp > 0) a
          else if (cmp < 0) b
          else {
            val l = a._1._1.compareTo(b._1._1)
            if (l < 0 || (l == 0 && a._1._2.compareTo(b._1._2) <= 0)) a else b
          }
        }._1
        merges += best
        val joined = best._1 + best._2
        seqs.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms.update(i, joined); syms.remove(i + 1)
              // recheck position i: the merged symbol may pair with the
              // previous one only on a later merge, but with the NEXT one
              // in this same pass (aaaa → aa aa, not aa a a)
            } else i += 1
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }

  /** Distributed word counts → top-`topWords` (count desc, word asc) →
    * driver merge loop. The groupBy is map-side combined; the collect is
    * bounded by `topWords` regardless of corpus size. */
  def trainFromCorpus(docs: DataFrame, textCol: String,
      numMerges: Int, topWords: Int = 100000): Model = {
    val wc = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(wc, numMerges)
  }

  /** Per-document subword encode: broadcast the merges, map-only pass.
    * Emits (id, pieces array, piece count). */
  def encodeDocs(docs: DataFrame, textCol: String, idCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value // rank map built once per partition (lazy val)
        it.map { case (id, text) =>
          val pieces = m.encode(if (text == null) "" else text)
          (id, pieces, pieces.length)
        }
      }
      .toDF(idCol, "pieces", "n_pieces")
  }
}
