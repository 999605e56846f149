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

  test("feature_names/feature_types: reference fixture imports with names, " +
      "roundtrip through JSON and UBJSON keeps them, trees_to_dataframe uses them") {
    // reference-generated fixture with populated name fields (learner.cc:694)
    val named = refJson.replace(
      """"feature_names":[],"feature_types":[]""",
      """"feature_names":["age","income"],"feature_types":["q","q"]""")
    val m = XGBoostJson.fromXGBoostJson(named)
    assert(m.featureNames.toSeq == Seq("age", "income"))
    assert(m.featureTypes.toSeq == Seq("q", "q"))

    // export → import keeps the names (text carrier)
    val rt = XGBoostJson.fromXGBoostJson(XGBoostJson.toXGBoostJson(m))
    assert(rt.featureNames.toSeq == Seq("age", "income"))
    assert(rt.featureTypes.toSeq == Seq("q", "q"))

    // binary carrier (same document)
    val ubj = graft.model.Ubjson.fromXGBoostUbj(graft.model.Ubjson.toXGBoostUbj(m))
    assert(ubj.featureNames.toSeq == Seq("age", "income"))

    // graft-native JSON carries them too (pre-r7 models decode to empty)
    val native = BoosterModel.fromJson(m.toJson)
    assert(native.featureNames.toSeq == Seq("age", "income"))
    assert(native.featureTypes.toSeq == Seq("q", "q"))

    // inspection shows real names instead of f0-style ids
    val feats = m.treesToDataFrame(TestSpark.spark)
      .select("feature").collect().map(_.getString(0)).toSet
    assert(feats.contains("age") && !feats.exists(_.startsWith("f0")), feats)
  }

  test("multi-target (vector-leaf) models roundtrip through the MultiTargetTree layout") {
    // train a real two-target model, export in the reference layout,
    // reimport, and compare margins exactly (JSON carrier is double-exact)
    val rng = new scala.util.Random(71)
    val data = sc.parallelize((0 until 2000).map { _ =>
      val x = Array(rng.nextGaussian(), rng.nextGaussian())
      (x, Array(2.0 * x(0) - x(1), x(1) * 0.5), 1.0)
    }, 2)
    val m = graft.api.XGBoost.trainMulti(data,
      graft.tree.TrainParams(numRounds = 3, maxDepth = 3, maxBin = 32, seed = 5,
        minTrainPartitions = 0), numTargets = 2)
    val json = m.toXGBoostJson
    // the reference layout markers
    assert(json.contains("\"num_target\":\"2\""), "learner num_target")
    assert(json.contains("\"leaf_weights\""), "MultiTargetTree leaf_weights array")
    assert(json.contains("\"size_leaf_vector\":\"2\""))
    val back = XGBoostJson.fromXGBoostJson(json)
    assert(back.numGroups == 2)
    val probes = Seq(Array(0.5, -1.2), Array(-2.0, 0.3), Array(0.0, 0.0))
    probes.foreach { x =>
      val a = m.margin(x); val b = back.margin(x)
      assert(math.abs(a(0) - b(0)) < 1e-12 && math.abs(a(1) - b(1)) < 1e-12,
        s"margin drift: ${a.toSeq} vs ${b.toSeq}")
    }
    // binary carrier stores f32 (the reference's typed arrays) — compare
    // with float tolerance
    val ubj = graft.model.Ubjson.fromXGBoostUbj(graft.model.Ubjson.toXGBoostUbj(m))
    probes.foreach { x =>
      val a = m.margin(x); val b = ubj.margin(x)
      assert(math.abs(a(0) - b(0)) < 1e-5 && math.abs(a(1) - b(1)) < 1e-5,
        s"ubj margin drift: ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("categorical splits roundtrip through reference JSON and UBJSON") {
    import graft.model.{Node, Tree}
    // root: categorical f0 with {2, 5} routed RIGHT; right child numeric
    val tree = Tree(Array(
      Node(feature = 0, threshold = 0.0, defaultLeft = true, left = 1, right = 2,
        leaf = Array.empty, gain = 3.0, sumHess = 10.0, categoriesRight = Array(2, 5)),
      Node.makeLeaf(Array(-1.0), 6.0),
      Node(feature = 1, threshold = 7.5, defaultLeft = false, left = 3, right = 4,
        leaf = Array.empty, gain = 1.0, sumHess = 4.0, categoriesRight = Array.empty),
      Node.makeLeaf(Array(0.5), 2.0),
      Node.makeLeaf(Array(2.0), 2.0)))
    val m = BoosterModel(Array(tree), Array(1.0), Array(0), Array(0.0),
      "reg:squarederror", 1, 2)
    val json = XGBoostJson.toXGBoostJson(m)
    // side arrays present in the emitted document
    assert(json.contains("\"categories_nodes\":[0]"), json)
    assert(json.contains("\"categories\":[2,5]"), json)
    val back = XGBoostJson.fromXGBoostJson(json)
    val root = back.trees(0).nodes(0)
    assert(root.isCategorical && root.categoriesRight.toSeq == Seq(2, 5))
    // routing: category 5 goes RIGHT (then numeric path), 3 goes LEFT
    assert(back.margin(Array(5.0, 3.0))(0) == m.margin(Array(5.0, 3.0))(0))
    assert(back.margin(Array(3.0, 0.0))(0) == m.margin(Array(3.0, 0.0))(0))
    assert(back.margin(Array(5.0, 9.0))(0) == m.margin(Array(5.0, 9.0))(0))
    // binary carrier: typed side arrays survive both directions
    val ubj = graft.model.Ubjson.fromXGBoostUbj(graft.model.Ubjson.toXGBoostUbj(m))
    assert(ubj.trees(0).nodes(0).categoriesRight.toSeq == Seq(2, 5))
    assert(ubj.margin(Array(2.0, 9.0))(0) == m.margin(Array(2.0, 9.0))(0))
  }

  test("import: post-3.1 ParamArray base_score form parses (trees + gblinear)") {
    // since ref 3.1 base_score is a ParamArray serialized as a bracketed
    // array string (src/common/param_array.cc WriteStream), e.g. "[5E-1]"
    val arr = refJson.replace(""""base_score":"5E-1"""", """"base_score":"[5E-1]"""")
    val m = XGBoostJson.fromXGBoostJson(arr)
    assert(math.abs(m.baseScore(0)) < 1e-12) // 0.5 through the logistic link
    assert(XGBoostJson.parseBaseScore("[2.5E-1,5E-1]") == 0.25)
    assert(XGBoostJson.parseBaseScore(" [1E0] ") == 1.0)
    assert(XGBoostJson.parseBaseScore("5E-1") == 0.5) // pre-3.1 scalar still ok
    val lm = graft.linear.LinearModel(Array(1.0), bias = 0.0, baseScore = 0.2,
      objective = "reg:squarederror", numFeatures = 1)
    val linArr = XGBoostJson.toXGBoostJson(lm)
      .replace(""""base_score":"0.2"""", """"base_score":"[2E-1]"""")
    assert(linArr.contains("[2E-1]"), "fixture replace must hit")
    assert(math.abs(XGBoostJson.linearFromXGBoostJson(linArr).baseScore - 0.2) < 1e-12)
  }

  test("export thresholds survive the reference's float32 parse") {
    // the reference parses split_condition into FLOAT32 (tree_model.cc
    // LoadModelImpl), so a double-space nextUp(T) rounds straight back to T
    // and rows with feature == T flip from LEFT (graft) to RIGHT (reference)
    assert(Math.nextUp(10.0).toFloat == 10.0f) // the naive emit collapses
    val c = XGBoostJson.float32Successor(10.0)
    assert(c.toFloat > 10.0f, "emitted condition must stay above T in float32")
    // graft routes v=10 LEFT (v <= T); reference must agree: v < (float)cond
    assert(10.0f < c.toFloat)
    // non-float-representable threshold: smallest float strictly above it
    assert(0.3f.toDouble > 0.3 && XGBoostJson.float32Successor(0.3) == 0.3f.toDouble)
    // a trained model's exported conditions all clear their threshold in f32
    val rng = new scala.util.Random(9)
    val rows = (0 until 800).map { _ =>
      val x = Array(rng.nextInt(50).toDouble, rng.nextGaussian())
      (x, x(0) * 2.0 + x(1), 1.0)
    }
    val m = new GBTTrainer(TrainParams(numRounds = 3, maxDepth = 3, maxBin = 16, seed = 6))
      .fit(sc.parallelize(rows, 2))
    val rt = XGBoostJson.fromXGBoostJson(XGBoostJson.toXGBoostJson(m))
    m.trees.zip(rt.trees).foreach { case (a, b) =>
      a.nodes.zip(b.nodes).foreach { case (na, nb) =>
        if (!na.isLeaf) assert(na.threshold.toFloat < nb.threshold.toFloat ||
          na.threshold < nb.threshold, s"threshold ${na.threshold} not below f32 cond")
      }
    }
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
    // num_target > 1 with scalar-layout trees is malformed, not importable
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
