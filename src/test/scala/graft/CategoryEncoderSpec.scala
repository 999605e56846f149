package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.{CategoryDictionary, CategoryEncoder}
import graft.tree.{GBTTrainer, TrainParams}

class CategoryEncoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dictionary codes follow sorted value order and recode applies") {
    val df = Seq(("b", 1.0), ("a", 2.0), ("c", 3.0), ("a", 4.0)).toDF("k", "v")
    val dict = CategoryEncoder.fit(df, Seq("k"))
    assert(dict.mapping("k") == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val out = dict.transform(df).select("k", "k_code").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("unseen categories recode to null (missing), not an error") {
    val train = Seq("a", "b").toDF("k")
    val dict = CategoryEncoder.fit(train, Seq("k"))
    val scored = dict.transform(Seq("a", "z").toDF("k"))
      .select("k_code").collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(scored.toSet == Set(0, -1))
  }

  test("JSON roundtrip preserves the mapping") {
    val df = Seq(("x", "p"), ("y", "q"), ("z", "p")).toDF("c1", "c2")
    val dict = CategoryEncoder.fit(df, Seq("c1", "c2"))
    val back = CategoryDictionary.fromJson(dict.toJson)
    assert(back.mapping == dict.mapping)
  }

  test("recoded string column trains a categorical split end-to-end") {
    val rng = new scala.util.Random(5)
    val cats = Array("red", "green", "blue", "gold")
    val means = Map("red" -> 0.0, "green" -> 5.0, "blue" -> 5.0, "gold" -> 0.0)
    val rows = (0 until 2000).map { _ =>
      val c = cats(rng.nextInt(4))
      (c, means(c) + 0.1 * rng.nextGaussian())
    }
    val df = rows.toDF("color", "y")
    val dict = CategoryEncoder.fit(df, Seq("color"))
    val data = dict.transform(df).select("color_code", "y").as[(Int, Double)]
      .rdd.map { case (c, y) => (Array(c.toDouble), y, 1.0) }
    val model = new GBTTrainer(TrainParams(numRounds = 10, eta = 0.5,
      maxDepth = 3, catFeatures = Set(0), maxCatToOnehot = 2, seed = 1)).fit(data)
    // prediction per category should track the category means
    cats.foreach { c =>
      val code = dict.mapping("color")(c).toDouble
      val p = model.margin(Array(code))(0)
      assert(math.abs(p - means(c)) < 0.5, s"$c: pred $p vs mean ${means(c)}")
    }
  }
}
