package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.CorpusFilters

class CorpusFiltersSpec extends AnyFunSuite {
  import TestSpark._

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a totally clean document about spark and scala here"), // clean
      (2L, "he saw the quick brown fox jumps far away today"),     // 1 shared 5-gram... check
      (3L, "quick brown fox jumps over the lazy dog again now")    // several shared
    ).toDF("doc_id", "text")
    val out = CorpusFilters.decontaminate(docs, bench, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L) == ((1L, 0L, 0L)))
    // doc 2 shares "the quick brown fox jumps"
    assert(byId(2L)._2 == 1L && byId(2L)._3 == 1L)
    // doc 3 shares 4 of the benchmark's 5-grams (all but the one needing "dog" 9th)
    assert(byId(3L)._2 == 4L && byId(3L)._3 == 1L)
  }

  test("gopherQuality: each rule trips on its designed offender") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => "the story of and truly wonderful example" + (i % 9))
      .mkString(" ") // 350 words incl. stopwords, mean length ~4.9
    val good = fifty
    val docs = Seq(
      (1L, good),                                              // passes all
      (2L, "too few words here."),                             // n_words < 50
      (3L, (1 to 60).map(_ => "x").mkString(" ")),             // mean len 1 < 3
      (4L, good + " " + (1 to 60).map(_ => "####").mkString(" ")), // symbols
      (5L, (1 to 60).map(_ => "12345").mkString(" ")),         // no alpha
      (6L, (1 to 60).map(_ => "zebra quilt").mkString(" "))    // no stopwords
    ).toDF("doc_id", "text")
    val byId = CorpusFilters.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("quality_keep") == 1)
    assert(byId(2L).getAs[Int]("quality_keep") == 0)
    assert(byId(3L).getAs[Int]("quality_keep") == 0)
    assert(byId(4L).getAs[Int]("quality_keep") == 0 &&
      byId(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(byId(5L).getAs[Int]("quality_keep") == 0 &&
      byId(5L).getAs[Double]("alpha_frac") == 0.0)
    assert(byId(6L).getAs[Int]("quality_keep") == 0 &&
      byId(6L).getAs[Long]("stop_hits") == 0L)
  }

  test("ccnetBuckets: fluent docs land in head, rare-token docs in tail, per lang") {
    import spark.implicits._
    // 'common' appears everywhere (low NLL); 'rareN' tokens are unique
    // (high NLL). 6 docs per lang -> terciles of 2.
    val docs = (0 until 12).map { i =>
      val lang = if (i < 6) "aa" else "bb"
      val text = i % 3 match {
        case 0 => "common common common common"            // fluent
        case 1 => s"common common rare$i common"           // middling
        case _ => s"rare${i}x rare${i}y rare${i}z rare${i}w" // perplexing
      }
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = CorpusFilters.ccnetBuckets(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("tier")).toMap
    assert(out(0L) == "head" && out(3L) == "head")
    assert(out(1L) == "middle" && out(4L) == "middle")
    assert(out(2L) == "tail" && out(5L) == "tail")
    assert(out(6L) == "head" && out(8L) == "tail")
  }

  test("gopherQuality counts the U+2026 ellipsis like the three-dot form (r13 review)") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 6).map(_ => s"$base…").mkString("\n")),   // every line ends in …
      (2L, (1 to 6).map(_ => base).mkString("\n"))          // clean twin
    ).toDF("doc_id", "text")
    val m = graft.ext.CorpusFilters.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("ellipsis_frac") == 1.0,
      "U+2026-terminated lines must count as ellipsis lines")
    assert(m(1L).getAs[Double]("symbol_ratio") > 0.0,
      "U+2026 marks must count into the symbol ratio")
    assert(m(1L).getAs[Int]("quality_keep") == 0 &&
      m(2L).getAs[Double]("ellipsis_frac") == 0.0)
  }

  test("repetitionStats: hand-computed fractions and keep decision") {
    import spark.implicits._
    // doc 1: "a b a b a b" — bigram "a b" x3 of 5 bigrams, top frac = 6/6 -> capped 1.0;
    //   trigrams "a b a" x2, "b a b" x2 -> dup3 = 12 tokens -> capped 1.0 -> reject
    // doc 2: 12 all-distinct tokens -> top bigram count 1 -> frac 2/12 =
    //   0.16667 <= 0.20, dup3 = 0 -> keep
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 ta tb")
    ).toDF("doc_id", "text")
    val out = CorpusFilters.repetitionStats(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 6L, 1.0, 1.0, 0L)))
    assert(out(1) == ((2L, 12L, 0.16667, 0.0, 1L)))
  }

  test("unigramNll: rarer vocabulary means higher per-token NLL") {
    import spark.implicits._
    // corpus: "w" appears 8 times, "rare" twice; N = 10
    val docs = Seq(
      (1L, "w w w w"),
      (2L, "w w w w"),
      (3L, "rare rare")
    ).toDF("doc_id", "text")
    val out = CorpusFilters.unigramNll(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // per-token micro-nats: ln(10/8)*1e6 ~ 223144, ln(10/2)*1e6 ~ 1609438
    assert(out(0) == ((1L, 4L, 4L * 223144L)))
    assert(out(1)._3 == out(0)._3)
    assert(out(2) == ((3L, 2L, 2L * 1609438L)))
    // mean NLL orders docs by rarity
    assert(out(2)._3 / out(2)._2 > out(0)._3 / out(0)._2)
  }

  test("bigramNll: hand-computed interpolated probabilities") {
    import spark.implicits._
    // corpus bigrams: "a b" x2 (docs 1,2), "b a" x1 (doc 2), "c c" x1 (doc 3)
    // contexts: c(a·)=2, c(b·)=1, c(c·)=1; unigrams: a=3 b=2 c=2 solo=1, N=8
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b a"),
      (3L, "c c"),
      (4L, "solo") // 1 token -> no bigrams -> drops out
    ).toDF("doc_id", "text")
    val out = CorpusFilters.bigramNll(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def micro(p: Double) = math.rint(-math.log(p) * 1e6).toLong
    val pAB = 0.9 * 2.0 / 2.0 + (1.0 - 0.9) * 2.0 / 8.0 // p(b|a)
    val pBA = 0.9 * 1.0 / 1.0 + (1.0 - 0.9) * 3.0 / 8.0 // p(a|b)
    val pCC = 0.9 * 1.0 / 1.0 + (1.0 - 0.9) * 2.0 / 8.0 // p(c|c)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0) == ((1L, 1L, micro(pAB))))
    assert(out(1) == ((2L, 2L, micro(pAB) + micro(pBA))))
    assert(out(2) == ((3L, 1L, micro(pCC))))
    // interpolation keeps every observed bigram strictly positive
    assert(out.forall(_._3 > 0L))
  }

  test("curate applies dedup, repetition, and contamination gates in order") {
    import spark.implicits._
    val clean = "w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf wg"
    val docs = Seq(
      (1L, clean, "en"),                                     // survives
      (2L, clean, "en"),                                     // exact dup of 1 -> dropped
      (3L, "x y x y x y x y x y x y x y x y", "en"),         // repetitive -> dropped
      (4L, "b1 b2 b3 b4 b5 extra tail words here now ok fin", "en") // contaminated
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((9L, "b1 b2 b3 b4 b5")).toDF("doc_id", "text")
    // rate 1.0 = sampling keeps everything: isolates the three gates
    val out = CorpusFilters.curate(docs, bench, "lang", Map.empty, 1.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.sameElements(Array(1L)))
    // rate 0.0 drops everything deterministically
    assert(CorpusFilters.curate(docs, bench, "lang", Map.empty, 0.0).count() == 0L)
  }

  test("n-gram stages keep tokens materialized as an attribute (no split() re-inlining)") {
    import spark.implicits._
    // Guard for the O(tokens²) hazard: if the split() tokenizer subtree is
    // ever re-inlined into the shingle/ngram transform lambdas (one copy
    // per element_at), the executed-plan string sprouts a split() per
    // n-gram position — dozens per scan. Materialized as an attribute,
    // each scan of the docs table evaluates split() exactly once, so the
    // total count stays at the number of distinct text scans in the plan.
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    def splits(df: org.apache.spark.sql.DataFrame): Int =
      "split\\(".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val rep = splits(CorpusFilters.repetitionStats(docs))
    val dec = splits(CorpusFilters.decontaminate(docs, bench))
    val big = splits(CorpusFilters.bigramNll(docs))
    assert(rep <= 3, s"repetitionStats re-inlines split(): $rep occurrences")
    assert(dec <= 3, s"decontaminate re-inlines split(): $dec occurrences")
    assert(big <= 4, s"bigramNll re-inlines split(): $big occurrences")
  }

  test("dsirLogWeight: target-vocabulary docs score above corpus-average docs") {
    import spark.implicits._
    val target = (0 until 50).map(i => (i.toLong, "en", "alpha beta gamma delta"))
    val other = (50 until 100).map(i => (i.toLong, "de", "eins zwei drei vier"))
    val docs = (target ++ other).toDF("doc_id", "lang", "text")
    val rows = CorpusFilters.dsirLogWeight(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val (tgtW, rawW) = (rows.filter(_._1 < 50).map(_._2), rows.filter(_._1 >= 50).map(_._2))
    assert(tgtW.distinct.length == 1 && rawW.distinct.length == 1,
      "identical docs must get identical integer weights")
    assert(tgtW.head > 0L, s"target-like docs should have positive log-weight, got ${tgtW.head}")
    assert(rawW.head < 0L, s"off-target docs should have negative log-weight, got ${rawW.head}")
  }
}
