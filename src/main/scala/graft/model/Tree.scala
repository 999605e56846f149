package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Decision-tree node with xgboost split semantics.
  *
  * Mirrors the reference node layout (`include/xgboost/tree_model.h:80-241`):
  * a split node holds (feature, threshold, default direction, children); a
  * leaf holds a weight vector (length 1 for single-target, >1 for
  * multi-target — `src/tree/multi_target_tree_model.cc`). Categorical
  * partition splits (`src/tree/hist/evaluate_splits.h:122-204`) carry the set
  * of category codes routed RIGHT.
  *
  * Numeric routing: `value <= threshold` goes left; missing (NaN) follows
  * `defaultLeft` (the reference's sparsity-aware default direction,
  * `tree_model.h:115`). Categorical routing: category in `categoriesRight`
  * goes right.
  */
final case class Node(
    feature: Int,                  // -1 ⇒ leaf
    threshold: Double,             // numeric split condition
    defaultLeft: Boolean,
    left: Int,
    right: Int,
    leaf: Array[Double],           // leaf weights (unscaled; eta lives in BoosterModel.treeWeights)
    gain: Double,
    sumHess: Double,
    categoriesRight: Array[Int]    // non-empty ⇒ categorical split
) {
  def isLeaf: Boolean = feature < 0
  def isCategorical: Boolean = categoriesRight.nonEmpty
}

object Node {
  def makeLeaf(weight: Array[Double], sumHess: Double): Node =
    Node(-1, 0.0, defaultLeft = true, -1, -1, weight, 0.0, sumHess, Array.empty)
}

/** A single regression tree: array layout for cheap broadcast + traversal
  * (analog of the reference's array-tree hot path,
  * `src/predictor/cpu_predictor.cc:175`). */
final case class Tree(nodes: Array[Node]) {

  /** Index of the leaf this (dense, NaN=missing) feature row lands in.
    * Rows shorter than the trained width treat trailing features as
    * missing (ragged-batch semantics, `include/xgboost/data.h:191`). */
  def leafIndex(features: Array[Double]): Int = {
    var i = 0
    while (!nodes(i).isLeaf) {
      val n = nodes(i)
      val v = if (n.feature < features.length) features(n.feature) else Double.NaN
      i = if (java.lang.Double.isNaN(v)) {
        if (n.defaultLeft) n.left else n.right
      } else if (n.isCategorical) {
        if (java.util.Arrays.binarySearch(n.categoriesRight, v.toInt) >= 0) n.right else n.left
      } else {
        if (v <= n.threshold) n.left else n.right
      }
    }
    i
  }

  def predict(features: Array[Double]): Array[Double] = nodes(leafIndex(features)).leaf

  def numLeaves: Int = nodes.count(_.isLeaf)
  def maxDepth: Int = {
    def depth(i: Int): Int =
      if (nodes(i).isLeaf) 0 else 1 + math.max(depth(nodes(i).left), depth(nodes(i).right))
    depth(0)
  }
}

/** Trained ensemble (the reference's gbtree model: trees + per-tree weights
  * for DART + base score — `src/gbm/gbtree.h`). `treeGroup(t)` is the output
  * group (class) tree `t` contributes to, for multi:softmax-style
  * one-tree-per-class boosting (`src/gbm/gbtree.cc:182-276`). */
final case class BoosterModel(
    trees: Array[Tree],
    treeWeights: Array[Double],
    treeGroup: Array[Int],
    baseScore: Array[Double],
    objective: String,
    numGroups: Int,
    numFeatures: Int,
    /** Optional per-feature names/types (ref `learner.cc:694-696`
      * feature_names/feature_types): carried through native JSON/UBJSON
      * IO and used by [[treesToDataFrame]]; empty = unnamed (`f3`-style
      * ids). */
    featureNames: Array[String] = Array.empty,
    featureTypes: Array[String] = Array.empty
) {

  /** Raw margin per output group. */
  def margin(features: Array[Double]): Array[Double] = {
    val out = baseScore.clone()
    var t = 0
    while (t < trees.length) {
      val leaf = trees(t).predict(features)
      val g = treeGroup(t)
      if (leaf.length == 1) out(g) += treeWeights(t) * leaf(0)
      else { // multi-target tree: vector leaf maps 1:1 onto groups
        var k = 0
        while (k < leaf.length) { out(k) += treeWeights(t) * leaf(k); k += 1 }
      }
      t += 1
    }
    out
  }

  def leafIndices(features: Array[Double]): Array[Int] = trees.map(_.leafIndex(features))

  /** Model slice: subrange of boosting layers (ref `Booster.Slice`,
    * `src/learner.cc:1066`). */
  def slice(begin: Int, end: Int): BoosterModel =
    copy(
      trees = trees.slice(begin, end),
      treeWeights = treeWeights.slice(begin, end),
      treeGroup = treeGroup.slice(begin, end))

  /** Feature importance over trees (ref `src/gbm/gbtree.h:280-306`):
    * weight / gain / cover / total_gain / total_cover. */
  def featureImportance(kind: String): Map[Int, Double] = {
    val splits = trees.iterator.flatMap(_.nodes.iterator.filterNot(_.isLeaf)).toSeq
    val grouped = splits.groupBy(_.feature)
    kind match {
      case "weight"     => grouped.map { case (f, ns) => f -> ns.size.toDouble }
      case "total_gain" => grouped.map { case (f, ns) => f -> ns.map(_.gain).sum }
      case "gain"       => grouped.map { case (f, ns) => f -> ns.map(_.gain).sum / ns.size }
      case "total_cover" => grouped.map { case (f, ns) => f -> ns.map(_.sumHess).sum }
      case "cover"      => grouped.map { case (f, ns) => f -> ns.map(_.sumHess).sum / ns.size }
      case other => throw new IllegalArgumentException(s"unknown importance: $other")
    }
  }

  def toJson: String = BoosterModel.toJson(this)

  /** Export in the reference's native JSON model schema ([[XGBoostJson]]). */
  def toXGBoostJson: String = XGBoostJson.toXGBoostJson(this)

  /** The reference's `Booster.trees_to_dataframe`
    * (`python-package/xgboost/core.py:3103`): one row per REACHABLE node
    * (depth-first from each root, so pruned-orphan slots are skipped),
    * with the reference's conventions — leaves put their output value in
    * `gain` and null out split/children; vector leaves emit one row per
    * target; categorical splits carry the category set and a null
    * threshold with yes=right. Leaf values and gains are reported with
    * the tree weight (eta/DART) folded in, i.e. the contribution a row
    * actually receives — matching the reference, whose stored leaves are
    * already learning-rate-scaled. */
  def treesToDataFrame(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = collection.mutable.ArrayBuffer
      .empty[(Int, Option[Int], Int, String, String, Option[Double], Seq[Int],
        Option[String], Option[String], Option[String], Double, Double)]
    trees.indices.foreach { t =>
      val tree = trees(t)
      val w = treeWeights(t)
      val grp = treeGroup(t)
      val isVector = tree.nodes.exists(n => n.isLeaf && n.leaf.length > 1)
      val stack = collection.mutable.Stack(0)
      while (stack.nonEmpty) {
        val nid = stack.pop()
        val n = tree.nodes(nid)
        def id(x: Int) = s"$t-$x"
        if (n.isLeaf) {
          val targets = if (n.leaf.length > 1) n.leaf.indices else Seq(grp)
          targets.foreach { tg =>
            rows += ((t, Some(tg), nid, id(nid), "Leaf", None, null,
              None, None, None, w * n.leaf(if (n.leaf.length > 1) tg else 0), n.sumHess))
          }
        } else {
          stack.push(n.left); stack.push(n.right)
          val miss = if (n.defaultLeft) n.left else n.right
          val (yes, no, split, cats) =
            if (n.isCategorical) (n.right, n.left, None, n.categoriesRight.toSeq)
            else (n.left, n.right, Some(n.threshold), null: Seq[Int])
          // real feature names when the model carries them (ref
          // trees_to_dataframe uses feature_names the same way)
          val fname =
            if (n.feature < featureNames.length) featureNames(n.feature)
            else s"f${n.feature}"
          rows += ((t, if (isVector) None else Some(grp),
            nid, id(nid), fname, split, cats,
            Some(id(yes)), Some(id(no)), Some(id(miss)), n.gain, n.sumHess))
        }
      }
    }
    rows.toSeq.toDF("tree", "target", "node", "id", "feature", "split",
      "categories", "yes", "no", "missing", "gain", "cover")
  }

  /** The reference's `Booster.get_split_value_histogram`
    * (`core.py:3327`): numpy-histogram the numeric split thresholds used
    * for one feature across all trees — equal-width bins over
    * [min, max], rightmost bin inclusive, bin count = min(#unique,
    * requested). Returns (binUpperEdge, count) pairs. */
  def splitValueHistogram(feature: Int, bins: Option[Int] = None): Array[(Double, Long)] = {
    val values = trees.flatMap(_.nodes.iterator
      .filter(n => !n.isLeaf && !n.isCategorical && n.feature == feature)
      .map(_.threshold))
    if (values.isEmpty) return Array.empty
    val nUnique = values.distinct.length
    val nBins = math.max(bins.fold(nUnique)(b => math.min(nUnique, b)), 1)
    var lo = values.min; var hi = values.max
    if (lo == hi) { lo -= 0.5; hi += 0.5 } // np.histogram's degenerate-range rule
    val width = (hi - lo) / nBins
    val counts = new Array[Long](nBins)
    values.foreach { v =>
      val b = math.min(((v - lo) / width).toInt, nBins - 1) // right edge inclusive
      counts(b) += 1
    }
    Array.tabulate(nBins)(i => (lo + width * (i + 1), counts(i)))
  }
}

/** JSON model IO (schema inspired by the reference's JSON model,
  * `tree_model.h:272`, but flattened for clarity; versioned). */
object BoosterModel {
  private implicit val fmt: Formats = DefaultFormats

  /** Load a model saved by the reference runtime ([[XGBoostJson]]). */
  def fromXGBoostJson(s: String): BoosterModel = XGBoostJson.fromXGBoostJson(s)

  def toJson(m: BoosterModel): String = {
    val trees = m.trees.map { t =>
      JObject(
        "nodes" -> JArray(t.nodes.map { n =>
          JObject(
            "feature" -> JInt(n.feature),
            "threshold" -> JDouble(n.threshold),
            "default_left" -> JBool(n.defaultLeft),
            "left" -> JInt(n.left),
            "right" -> JInt(n.right),
            "leaf" -> JArray(n.leaf.map(JDouble(_)).toList),
            "gain" -> JDouble(n.gain),
            "sum_hess" -> JDouble(n.sumHess),
            "categories_right" -> JArray(n.categoriesRight.map(c => JInt(BigInt(c))).toList))
        }.toList))
    }
    val root = JObject(
      "graft_version" -> JInt(1),
      "objective" -> JString(m.objective),
      "num_groups" -> JInt(m.numGroups),
      "num_features" -> JInt(m.numFeatures),
      "base_score" -> JArray(m.baseScore.map(JDouble(_)).toList),
      "tree_weights" -> JArray(m.treeWeights.map(JDouble(_)).toList),
      "tree_group" -> JArray(m.treeGroup.map(g => JInt(BigInt(g))).toList),
      "feature_names" -> JArray(m.featureNames.map(JString(_)).toList),
      "feature_types" -> JArray(m.featureTypes.map(JString(_)).toList),
      "trees" -> JArray(trees.toList))
    JsonMethods.compact(JsonMethods.render(root))
  }

  def fromJson(s: String): BoosterModel = {
    val j = JsonMethods.parse(s)
    def arrD(v: JValue): Array[Double] = v.extract[List[Double]].toArray
    def arrI(v: JValue): Array[Int] = v.extract[List[Int]].toArray
    val trees = (j \ "trees").extract[List[JValue]].map { tj =>
      val nodes = (tj \ "nodes").extract[List[JValue]].map { nj =>
        Node(
          (nj \ "feature").extract[Int],
          (nj \ "threshold").extract[Double],
          (nj \ "default_left").extract[Boolean],
          (nj \ "left").extract[Int],
          (nj \ "right").extract[Int],
          arrD(nj \ "leaf"),
          (nj \ "gain").extract[Double],
          (nj \ "sum_hess").extract[Double],
          arrI(nj \ "categories_right"))
      }
      Tree(nodes.toArray)
    }
    def arrS(v: JValue): Array[String] = v match {
      case JArray(xs) => xs.collect { case JString(x) => x }.toArray
      case _ => Array.empty // pre-r7 models carry no name fields
    }
    BoosterModel(
      trees.toArray,
      arrD(j \ "tree_weights"),
      arrI(j \ "tree_group"),
      arrD(j \ "base_score"),
      (j \ "objective").extract[String],
      (j \ "num_groups").extract[Int],
      (j \ "num_features").extract[Int],
      featureNames = arrS(j \ "feature_names"),
      featureTypes = arrS(j \ "feature_types"))
  }

  /** Text dump, the reference's human-readable format
    * (`src/tree/tree_model.cc:225` `DumpRegTree` text): depth-indented
    * `nid:[fX<thr] yes=,no=,missing=` splits and `nid:leaf=` leaves, with
    * stats when `withStats`. */
  def toText(t: Tree, withStats: Boolean = false): String = {
    val sb = new StringBuilder
    def go(i: Int, depth: Int): Unit = {
      val n = t.nodes(i)
      sb.append("\t" * depth).append(i).append(':')
      if (n.isLeaf) {
        sb.append("leaf=").append(n.leaf.mkString(","))
        if (withStats) sb.append(",cover=").append(n.sumHess)
        sb.append('\n')
      } else {
        val cond =
          if (n.isCategorical) s"f${n.feature}:{${n.categoriesRight.mkString(",")}}"
          else s"f${n.feature}<${n.threshold}"
        val miss = if (n.defaultLeft) n.left else n.right
        sb.append(s"[$cond] yes=${n.left},no=${n.right},missing=$miss")
        if (withStats) sb.append(s",gain=${n.gain},cover=${n.sumHess}")
        sb.append('\n')
        go(n.left, depth + 1)
        go(n.right, depth + 1)
      }
    }
    go(0, 0)
    sb.toString
  }

  /** Nested JSON dump per tree (ref `tree_model.cc:333` `DumpRegTree`
    * json: nodeid/split/split_condition/yes/no/missing/children). */
  def toDumpJson(t: Tree, withStats: Boolean = false): String = {
    import org.json4s.JsonDSL._
    def go(i: Int): JObject = {
      val n = t.nodes(i)
      if (n.isLeaf) {
        val base: JObject = ("nodeid" -> i) ~ ("leaf" -> n.leaf(0))
        if (withStats) base ~ ("cover" -> n.sumHess) else base
      } else {
        val miss = if (n.defaultLeft) n.left else n.right
        val base: JObject = ("nodeid" -> i) ~ ("split" -> s"f${n.feature}") ~
          ("split_condition" -> n.threshold) ~ ("yes" -> n.left) ~
          ("no" -> n.right) ~ ("missing" -> miss) ~
          ("children" -> List(go(n.left), go(n.right)))
        if (withStats) base ~ ("gain" -> n.gain) ~ ("cover" -> n.sumHess) else base
      }
    }
    JsonMethods.compact(JsonMethods.render(go(0)))
  }

  /** Graphviz dot dump (ref `src/tree/tree_model.cc:494`). */
  def toDot(t: Tree): String = {
    val sb = new StringBuilder("digraph tree {\n")
    t.nodes.zipWithIndex.foreach { case (n, i) =>
      if (n.isLeaf)
        sb.append(s"""  $i [label="leaf=${n.leaf.mkString(",")}" shape=box];\n""")
      else {
        sb.append(s"""  $i [label="f${n.feature}<=${n.threshold}"];\n""")
        sb.append(s"""  $i -> ${n.left} [label="yes${if (n.defaultLeft) ",missing" else ""}"];\n""")
        sb.append(s"""  $i -> ${n.right} [label="no${if (!n.defaultLeft) ",missing" else ""}"];\n""")
      }
    }
    sb.append("}\n").toString
  }
}
