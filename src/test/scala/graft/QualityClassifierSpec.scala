package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{QualityClassifier, TextOps}

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkDocs(n: Int, seed: Long) = {
    import spark.implicits._
    val good = Array("the", "a", "of", "and", "to", "in", "is", "it",
      "fox", "river", "story", "plain", "words", "fine", "clear", "day")
    val bad = Array("zxq", "qqj9", "x#!", "%%%", "kkkk", "vvv2", "jjj",
      "zz@", "???", "&&&", "mm9m", "qq~")
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val vocab = if (i % 2 == 0) good else bad
      val len = 8 + rng.nextInt(40)
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("JVM hash60 is bit-identical to the SQL spelling") {
    import spark.implicits._
    val words = Seq("the", "fox", "zxq", "", "a b", "%%%", "Ünïcödé")
    val sqlSide = words.toDF("w")
      .select(TextOps.hash60(col("w")).as("h")).as[Long].collect()
    val jvmSide = words.map(QualityClassifier.hash60)
    assert(sqlSide.toSeq == jvmSide)
    assert(jvmSide.forall(_ >= 0L))
  }

  test("featurize buckets counts and applies sublinear tf") {
    val toks = Seq("x", "x", "y", "x")
    val f = QualityClassifier.featurize(toks, 16)
    val bx = (QualityClassifier.hash60("x") % 16).toInt
    val by = (QualityClassifier.hash60("y") % 16).toInt
    assert(math.abs(f(bx) - math.log1p(if (bx == by) 4.0 else 3.0)) < 1e-15)
    assert(f.count(_ != 0.0) == (if (bx == by) 1 else 2))
    val raw = QualityClassifier.featurize(toks, 16, sublinearTf = false)
    assert(raw(bx) == (if (bx == by) 4.0 else 3.0))
  }

  test("learned filter separates good from junk docs and generalizes") {
    val train = mkDocs(1200, seed = 5)
    val model = QualityClassifier.trainFilter(train, numBuckets = 64)
    // held-out docs from a DIFFERENT seed: same vocabularies, new draws
    val test = mkDocs(400, seed = 99)
    import spark.implicits._
    val scored = QualityClassifier.scoreDocs(test, model, numBuckets = 64)
      .select("doc_id", "quality_prob").as[(Long, Double)].collect()
    val (goodP, badP) = scored.partition(_._1 % 2 == 0)
    val acc = (goodP.count(_._2 > 0.5) + badP.count(_._2 <= 0.5)).toDouble / scored.length
    assert(acc > 0.95, s"held-out accuracy $acc")
    assert(goodP.map(_._2).min > badP.map(_._2).max - 0.2,
      "score distributions must be nearly separated")
  }

  test("training is bit-deterministic with coord_descent on a pinned partitioning") {
    // single partition pins the treeAggregate fold order — the same
    // contract as the t_hash_* golden fixtures (multi-partition merges
    // are last-ulp order-dependent by design; see the minTrainPartitions
    // note in README)
    val docs = mkDocs(300, seed = 11).coalesce(1)
    val a = QualityClassifier.trainFilter(docs, numBuckets = 32)
    val b = QualityClassifier.trainFilter(docs, numBuckets = 32)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
  }

  test("scoreDocs margin equals the in-JVM linear model margin") {
    val docs = mkDocs(50, seed = 3)
    val model = QualityClassifier.trainFilter(docs, numBuckets = 32,
      params = graft.linear.LinearParams(objective = "binary:logistic",
        numRounds = 5, updater = "coord_descent"))
    import spark.implicits._
    val got = QualityClassifier.scoreDocs(docs, model, numBuckets = 32)
      .select("doc_id", "quality_margin").as[(Long, Double)].collect().toMap
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val f = QualityClassifier.featurize(text.split(" ", -1).toSeq, 32)
        assert(math.abs(got(id) - model.margin(f)) < 1e-12)
    }
  }
}
