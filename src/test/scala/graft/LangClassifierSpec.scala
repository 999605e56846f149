package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.LangClassifier

class LangClassifierSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus = {
    import spark.implicits._
    val alphabets = Map("aa" -> "abcdefg", "bb" -> "hijklmn", "cc" -> "opqrstu")
    (0 until 600).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val ab = alphabets(lang)
      val rng = new java.util.Random(i * 7919L + 3L)
      val text = Seq.fill(10)(
        Seq.fill(3 + rng.nextInt(4))(ab(rng.nextInt(ab.length))).mkString).mkString(" ")
      (i.toLong, text, lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("trained lang-id separates disjoint-alphabet languages") {
    val docs = corpus
    val (model, classes) = LangClassifier.train(docs, numBuckets = 64,
      params = graft.linear.LinearParams(objective = "multi:softmax",
        numRounds = 10, eta = 0.5, lambda = 1.0, updater = "coord_descent", seed = 1))
    assert(classes == Seq("aa", "bb", "cc"))
    val scored = LangClassifier.scoreDocs(docs, model, classes, numBuckets = 64)
    val acc = scored.where(col("lang_pred") === col("lang")).count().toDouble /
      scored.count()
    assert(acc > 0.95, s"training accuracy $acc")
  }

  test("scoreDocs argmax matches the model's JVM predictClass") {
    val docs = corpus.limit(50)
    val (model, classes) = LangClassifier.train(docs, numBuckets = 64,
      params = graft.linear.LinearParams(objective = "multi:softmax",
        numRounds = 5, eta = 0.5, lambda = 1.0, updater = "coord_descent", seed = 2))
    val rows = LangClassifier.scoreDocs(docs, model, classes, numBuckets = 64)
      .select("text", "lang_pred").collect()
    rows.foreach { r =>
      val jvm = classes(model.predictClass(
        LangClassifier.featurize(r.getString(0), 64)))
      assert(jvm == r.getString(1))
    }
  }

  test("featurize: char bigrams include spaces; short text yields empty grams") {
    assert(LangClassifier.charNgrams("ab c", 2) == Seq("ab", "b ", " c"))
    assert(LangClassifier.charNgrams("x", 2).isEmpty)
    assert(LangClassifier.featurize("x", 64).forall(_ == 0.0))
  }
}
