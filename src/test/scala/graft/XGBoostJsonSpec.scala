package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BoosterModel, XGBoostJson}
import graft.tree.{GBTTrainer, TrainParams}

/** Interop with the reference's native JSON model schema: import routing
  * semantics (strict-less vs our less-or-equal), base_score link handling,
  * dart weights, export/import roundtrip identity, and scope errors. */
class XGBoostJsonSpec extends AnyFunSuite {
  private lazy val sc = TestSpark.spark.sparkContext

  /** Handwritten reference-format model: one depth-1 tree splitting
    * f0 < 10 (left leaf −1, right leaf +2), binary:logistic, base 0.5. */
  private val refJson =
    """{"version":[3,0,0],"learner":{
      |"learner_model_param":{"base_score":"5E-1","num_feature":"2","num_class":"0","num_target":"1"},
      |"gradient_booster":{"name":"gbtree","model":{
      |  "gbtree_model_param":{"num_trees":"1","num_parallel_tree":"1"},
      |  "trees":[{"tree_param":{"num_nodes":"3","num_feature":"2","size_leaf_vector":"1"},
      |    "id":0,
      |    "loss_changes":[7.5,0.0,0.0],"sum_hessian":[10.0,6.0,4.0],
      |    "base_weights":[0.1,-1.0,2.0],
      |    "left_children":[1,-1,-1],"right_children":[2,-1,-1],"parents":[-1,0,0],
      |    "split_indices":[0,0,0],"split_conditions":[10.0,-1.0,2.0],
      |    "default_left":[1,0,0],
      |    "split_type":[0,0,0],"categories":[],"categories_nodes":[],
      |    "categories_segments":[],"categories_sizes":[]}],
      |  "tree_info":[0],"iteration_indptr":[0,1]}},
      |"objective":{"name":"binary:logistic"},
      |"attributes":{},"feature_names":[],"feature_types":[]}}""".stripMargin

  test("import: strict-less routing, leaf values, base_score link") {
    val m = XGBoostJson.fromXGBoostJson(refJson)
    assert(m.numFeatures == 2 && m.numGroups == 1 && m.objective == "binary:logistic")
    // base_score 0.5 through the logistic link ⇒ margin 0
    assert(math.abs(m.baseScore(0)) < 1e-12)
    // v < 10 goes left (−1); v == 10 goes RIGHT (reference strict less)
    assert(math.abs(m.margin(Array(9.99, 0.0))(0) - (-1.0)) < 1e-12)
    assert(math.abs(m.margin(Array(10.0, 0.0))(0) - 2.0) < 1e-12)
    // missing follows default_left = true at the root
    assert(math.abs(m.margin(Array(Double.NaN, 0.0))(0) - (-1.0)) < 1e-12)
    // importance survives (gain recorded on the split node)
    assert(m.featureImportance("gain")(0) == 7.5)
  }

  test("import: dart weight_drop becomes tree weights") {
    val dart = refJson
      .replace(""""gradient_booster":{"name":"gbtree","model":{""",
        """"gradient_booster":{"name":"dart","gbtree":{"model":{""")
      .replace(""""tree_info":[0],"iteration_indptr":[0,1]}},""",
        """"tree_info":[0],"iteration_indptr":[0,1],"weight_drop":[0.25]}}},""")
    val m = XGBoostJson.fromXGBoostJson(dart)
    assert(m.treeWeights.toSeq == Seq(0.25))
    assert(math.abs(m.margin(Array(10.0, 0.0))(0) - 0.5) < 1e-12) // 2.0 × 0.25
  }

  test("export/import roundtrip preserves predictions (regression)") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 2000).map { _ =>
      val x = Array(rng.nextDouble() * 50, rng.nextGaussian())
      (x, 3.0 * x(0) + x(1), 1.0)
    }
    val m = new GBTTrainer(TrainParams(numRounds = 4, maxDepth = 3, maxBin = 32, seed = 2))
      .fit(sc.parallelize(rows, 3))
    val rt = XGBoostJson.fromXGBoostJson(XGBoostJson.toXGBoostJson(m))
    assert(rt.trees.length == m.trees.length)
    rows.take(50).foreach { case (x, _, _) =>
      assert(math.abs(rt.margin(x)(0) - m.margin(x)(0)) < 1e-9,
        s"roundtrip drift at ${x.toSeq}")
    }
  }

  test("export/import roundtrip preserves multiclass argmax and tree_info") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 1500).map { _ =>
      val c = rng.nextInt(3)
      (Array(c * 3.0 + rng.nextGaussian(), rng.nextGaussian()), c.toDouble, 1.0)
    }
    val m = new GBTTrainer(TrainParams(objective = "multi:softprob", numClass = 3,
      numRounds = 3, maxDepth = 3, maxBin = 32, seed = 4)).fit(sc.parallelize(rows, 3))
    val rt = XGBoostJson.fromXGBoostJson(XGBoostJson.toXGBoostJson(m))
    assert(rt.numGroups == 3 && rt.treeGroup.toSeq == m.treeGroup.toSeq)
    rows.take(50).foreach { case (x, _, _) =>
      val a = m.margin(x); val b = rt.margin(x)
      assert(a.indices.maxBy(a) == b.indices.maxBy(b))
      a.indices.foreach(k => assert(math.abs(a(k) - b(k)) < 1e-9))
    }
  }

  test("gblinear roundtrip preserves weights, bias, and base margin") {
    val lm = graft.linear.LinearModel(Array(0.5, -1.25), bias = 0.75,
      baseScore = 0.2, objective = "reg:squarederror", numFeatures = 2)
    val rt = XGBoostJson.linearFromXGBoostJson(XGBoostJson.toXGBoostJson(lm))
    assert(rt.weights.toSeq == lm.weights.toSeq && rt.bias == lm.bias)
    assert(math.abs(rt.margin(Array(2.0, 1.0)) - lm.margin(Array(2.0, 1.0))) < 1e-12)
    // logistic link roundtrips through output space
    val lml = lm.copy(objective = "binary:logistic", baseScore = 0.4)
    val rtl = XGBoostJson.linearFromXGBoostJson(XGBoostJson.toXGBoostJson(lml))
    assert(math.abs(rtl.baseScore - 0.4) < 1e-12)
  }

  test("scope errors are descriptive") {
    val multiTarget = refJson.replace(""""num_target":"1"""", """"num_target":"3"""")
    val e1 = intercept[IllegalArgumentException](XGBoostJson.fromXGBoostJson(multiTarget))
    assert(e1.getMessage.contains("multi-target"))
    val gblinear = refJson.replace(""""name":"gbtree"""", """"name":"gblinear"""")
    val e2 = intercept[IllegalArgumentException](XGBoostJson.fromXGBoostJson(gblinear))
    assert(e2.getMessage.contains("gblinear"))
    val cat = refJson.replace(""""categories_nodes":[]""", """"categories_nodes":[0]""")
    val e3 = intercept[IllegalArgumentException](XGBoostJson.fromXGBoostJson(cat))
    assert(e3.getMessage.contains("categorical"))
  }
}
