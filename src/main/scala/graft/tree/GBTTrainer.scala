package graft.tree

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

import graft.data.{Binning, HistogramCuts}
import graft.model.{BoosterModel, Node, Tree}
import graft.objective.{CoxGradients, LambdaRankGradients, LambdaRankObjective, Objective, SoftmaxObjective}

import scala.collection.mutable.ArrayBuffer

/** Training hyper-parameters (the reference's `TrainParam`,
  * `src/tree/param.h:82-205`, plus learner/booster params). */
final case class TrainParams(
    objective: String = "reg:squarederror",
    numRounds: Int = 10,
    eta: Double = 0.3,
    maxDepth: Int = 6,
    minChildWeight: Double = 1.0,
    lambda: Double = 1.0, // L2 on leaf weights
    alpha: Double = 0.0, // L1 on leaf weights
    gamma: Double = 0.0, // min_split_loss
    maxBin: Int = 256,
    subsample: Double = 1.0,
    samplingMethod: String = "uniform", // | "gradient_based"
    colsampleBytree: Double = 1.0,
    colsampleBylevel: Double = 1.0,
    colsampleBynode: Double = 1.0,
    maxDeltaStep: Double = 0.0,
    seed: Long = 0L,
    growPolicy: String = "depthwise", // | "lossguide"
    maxLeaves: Int = 0, // 0 = unlimited (subject to maxDepth)
    numClass: Int = 1,
    baseScore: Option[Double] = None,
    monotoneConstraints: Array[Int] = Array.empty, // per-feature −1/0/+1
    interactionConstraints: Seq[Set[Int]] = Nil,
    catFeatures: Set[Int] = Set.empty,
    maxCatToOnehot: Int = 4,
    maxCatThreshold: Int = 64,
    treeMethod: String = "hist", // | "approx"
    quantileAlpha: Double = 0.5,
    quantileAlphas: Array[Double] = Array.empty, // ≥2 entries ⇒ multi-quantile (one output lane per alpha)
    tweedieVariancePower: Double = 1.5,
    pseudoHuberSlope: Double = 1.0,
    aftDistribution: String = "normal", // | "logistic" | "extreme"
    aftScale: Double = 1.0,
    ndcgExpGain: Boolean = true, // rank:ndcg gain 2^rel−1 vs linear
    lambdarankTopK: Int = 0, // >0 selects pair_method=topk with this k
    lambdarankPairMethod: String = "mean", // | "topk" | "all" (ranking_utils.h:73)
    lambdarankNumPair: Int = 8, // sampled pairs per doc (pair_method=mean)
    lambdarankUnbiased: Boolean = false, // position debiasing (Unbiased LambdaMART)
    lambdarankBiasNorm: Double = 1.0, // t± update regularizer 1/(1+norm) (ranking_utils.h:82)
    lambdarankNormalization: Boolean = true, // group λ rescale (ranking_utils.h:81, default true)
    lambdarankScoreNormalization: Boolean = true, // Δ/(|score gap|+0.01) (ranking_utils.h:82, default true)
    evalMetric: Option[String] = None, // per-iteration watch metric (default: objective's)
    evalMetrics: Seq[String] = Nil, // MULTIPLE watch metrics (ref eval_metric list,
    // `python-package/xgboost/training.py` params with repeated eval_metric: every
    // watch is evaluated under every metric; the LAST metric drives early stopping).
    // Takes precedence over evalMetric when non-empty.
    earlyStoppingRounds: Int = 0, // 0 = off; else stop after this many non-improving rounds
    scalePosWeight: Double = 1.0, // positive-class gradient rebalance (RegLoss family)
    featureWeights: Array[Double] = Array.empty, // weighted column sampling (random.h:40-68)
    numParallelTree: Int = 1, // boosted-random-forest layer width (gbtree.cc:282)
    // DART (`src/gbm/gbtree.h:88-120`)
    booster: String = "gbtree", // | "dart"
    rateDrop: Double = 0.0,
    skipDrop: Double = 0.0,
    oneDrop: Boolean = false,
    sampleType: String = "uniform", // | "weighted" (drop prob ∝ tree weight)
    normalizeType: String = "tree", // | "forest"
    checkpointInterval: Int = 15,
    // deferred prediction-cache updates: plain gbtree fits accumulate up to
    // this many freshly-grown trees as on-the-fly margin adjustments (the
    // same per-row tree-walk machinery DART dropout uses) before
    // materializing a new margin RDD — one cache-advance Spark job per
    // FLUSH instead of one per iteration. 1 = advance every iteration.
    marginFlushInterval: Int = 8,
    // training parallelism floor: −1 = auto (repartition up to
    // defaultParallelism when the input arrives under-partitioned, e.g. a
    // single parquet file); 0 = never repartition (pins partition contents;
    // NOTE full bit-reproducibility across runs additionally requires a
    // single input partition — multi-partition float sums merge in task-
    // completion order, which near-tie split gains can amplify into
    // different-but-equally-valid trees; see TrainQueries' golden rows);
    // >0 = explicit floor
    minTrainPartitions: Int = -1
)

/** Bin-space tree shape, broadcast to executors for row routing — numeric
  * condition is on BIN index (`bin <= splitBin` goes left), the analog of
  * the reference's `FindSplitConditions`/`UpdatePosition`
  * (`src/tree/common_row_partitioner.h:57,97-130`): rows are never
  * physically repartitioned, position is recomputed from the broadcast
  * shape. */
final case class TreeShape(
    feature: Array[Int], // -1 ⇒ leaf
    splitBin: Array[Int],
    defaultLeft: Array[Boolean],
    left: Array[Int],
    right: Array[Int],
    catRight: Array[Array[Int]], // sorted cat-bin ids routed right; null ⇒ numeric
    leaf: Array[Array[Double]],
    sumHess: Array[Double],
    gain: Array[Double]
) extends Serializable {
  def position(r: BInst): Int = {
    var i = 0
    while (feature(i) >= 0) {
      val b = r.binOf(feature(i))
      i =
        if (b < 0) { if (defaultLeft(i)) left(i) else right(i) }
        else if (catRight(i) != null) {
          if (java.util.Arrays.binarySearch(catRight(i), b) >= 0) right(i) else left(i)
        } else if (b <= splitBin(i)) left(i)
        else right(i)
    }
    i
  }
  def predictLeaf(r: BInst): Array[Double] = leaf(position(r))
}

/** One training instance after quantization: local bin id per feature
  * (−1 = missing), label, weight, and a stable row id (for deterministic
  * per-iteration subsampling, ref `seed_per_iteration`
  * `src/learner.cc:1119-1123`). `label2` is the censoring upper bound for
  * interval objectives (survival:aft; NaN elsewhere). `qid` is the ranking
  * query group (rank:* objectives; −1 elsewhere).
  *
  * Sparse rows (ref CSR adapter `src/data/adapter.h:216-308`): `idx` holds
  * the SORTED present feature ids and `bins` is parallel to `idx` (length
  * nnz, not numFeatures); absent features are missing. `idx == null` ⇒
  * dense. Storage per row is O(nnz) — wide one-hot/text data stays
  * tractable. */
/** rowId is a UNIQUE id (zipWithUniqueId — no extra partition-count job),
  * not a contiguous index: it only seeds the per-row subsample hash. */
final case class BInst(bins: Array[Int], label: Double, weight: Double, rowId: Long,
    label2: Double = Double.NaN, qid: Long = -1L, idx: Array[Int] = null) {
  /** bin of feature f (−1 = missing), for either representation. */
  @inline def binOf(f: Int): Int =
    if (idx == null) bins(f)
    else {
      val p = java.util.Arrays.binarySearch(idx, f)
      if (p >= 0) bins(p) else -1
    }
}

private final class BuildNode(
    var g: Double, var h: Double, // totals INCLUDING missing mass
    var depth: Int,
    var lowerBound: Double = Double.NegativeInfinity, // monotone-constraint weight bounds
    var upperBound: Double = Double.PositiveInfinity,
    var allowed: Option[Set[Int]] = None // interaction-constraint feature set
) {
  var feature: Int = -1
  var splitBin: Int = -1
  var defaultLeft: Boolean = false
  var left: Int = -1
  var right: Int = -1
  var gain: Double = 0.0
  var catRight: Array[Int] = null
  var weight: Double = 0.0 // leaf weight (pre-eta)
  var childG: (Double, Double) = null // (GL, GR) set when split chosen
  var childH: (Double, Double) = null
}

private[tree] final case class SplitCandidate(
    feature: Int, splitBin: Int, defaultLeft: Boolean, gain: Double,
    gl: Double, hl: Double, gr: Double, hr: Double, wl: Double, wr: Double,
    catRight: Array[Int])

/** Distributed gradient-boosted-tree trainer: the reference's learner loop
  * (`src/learner.cc:1114` UpdateOneIter) + hist updater
  * (`src/tree/updater_quantile_hist.cc:96-180`) re-expressed as a
  * driver-coordinated loop of Spark `treeAggregate`s. Each histogram
  * allreduce (`src/tree/hist/histogram.h:177-202`) becomes one
  * partial+final aggregation; the collective/tracker/barrier machinery of
  * the reference is replaced by Spark's shuffle (SURVEY §3.1).
  *
  * Scale design: the quantized matrix (`Array[Int]` bins, the
  * `GHistIndexMatrix` analog `src/data/gradient_index.h`) is cached once;
  * per level ONE pass builds histograms for ALL frontier nodes; the
  * subtraction trick (`histogram.h:203-213`) halves that work; margins are
  * a cached sibling RDD updated per iteration (prediction cache,
  * `src/gbm/gbtree.cc:631-660`) with periodic localCheckpoint to bound
  * lineage. Nothing driver-side scales with rows — only with
  * nodes × features × bins.
  */
final class GBTTrainer(params: TrainParams) extends Serializable {

  private val isMulti = params.numClass > 1
  private val numGroups = math.max(params.numClass, 1)

  // ---- driver-side training hooks (ref callback.py:51-640, custom
  // objective `objective.py` / custom feval `training.py:53`) ----
  @transient private var callbacks: Seq[TrainingCallback] = Nil
  private var customObj: Option[Objective] = None
  private var customMetric: Option[CustomEvalMetric] = None
  /** Per-iteration callbacks (monitoring, checkpointing, custom stop). */
  def withCallbacks(cbs: Seq[TrainingCallback]): this.type = { callbacks = cbs; this }
  /** User objective: any [[Objective]] implementation replaces the
    * registry lookup for `params.objective` (single-output only). */
  def withCustomObjective(o: Objective): this.type = { customObj = Some(o); this }
  /** User eval metric for the watch/early-stopping loop. */
  def withCustomMetric(m: CustomEvalMetric): this.type = { customMetric = Some(m); this }

  /** Defend against under-partitioned inputs (a single parquet file → 1-3
    * partitions → 1-3 training tasks regardless of cluster size): lift to
    * the parallelism floor before the multi-pass training loop. One shuffle,
    * amortized over every boosting round via shuffle-file reuse. */
  private def ensurePar[T: scala.reflect.ClassTag](data: RDD[T]): RDD[T] = {
    val target = params.minTrainPartitions match {
      case -1 => data.sparkContext.defaultParallelism
      case 0 => 0
      case n => n
    }
    if (target > data.getNumPartitions) data.repartition(target) else data
  }

  /** data: (dense features with NaN=missing, label, weight). */
  def fit(dataIn: RDD[(Array[Double], Double, Double)]): BoosterModel = {
    val data = ensurePar(dataIn)
    params.treeMethod match {
    case "hist" =>
      // column count is unified inside the sketch pass (ref
      // MetaInfo::SynchronizeNumberOfColumns, include/xgboost/data.h:191)
      val cuts = findCuts(data)
      val numFeatures = cuts.numFeatures
      val binned = data.zipWithUniqueId().map { case ((f, y, w), id) =>
        BInst(cuts.binRow(f), y, w, id)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      binned.count()

      val model = fitBinned(binned, cuts, numFeatures)
      binned.unpersist(blocking = false)
      model
    case "approx" => fitApprox(data)
    case "exact" =>
      // grow_colmaker semantics via distinct-value cuts: with every
      // distinct value its own bin, bin-space enumeration IS the exact
      // greedy scan over sorted columns (Binning.findCutsExact doc)
      val cuts = Binning.findCutsExact(data.map(r => (r._1, r._3)), 0)
      val numFeatures = cuts.numFeatures
      val binned = data.zipWithUniqueId().map { case ((f, y, w), id) =>
        BInst(cuts.binRow(f), y, w, id)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      binned.count()
      val model = fitBinned(binned, cuts, numFeatures)
      binned.unpersist(blocking = false)
      model
    case other => throw new IllegalArgumentException(
      s"unknown tree_method: $other (supported: exact, hist, approx)")
    }
  }

  /** hist fit with an eval WATCH set (ref watches + EvalOneIter,
    * `src/learner.cc:1164`; early stopping `python-package/xgboost/
    * callback.py:311`): the eval set is binned with the TRAIN cuts, its
    * margin cache advances with every committed tree, and
    * `earlyStoppingRounds` stops training when the watch metric stops
    * improving — the returned model is truncated to the best iteration. */
  def fit(dataIn: RDD[(Array[Double], Double, Double)],
      evalSetIn: RDD[(Array[Double], Double, Double)]): BoosterModel =
    fitWatches(dataIn, Seq("eval" -> evalSetIn))

  /** Named watchlist fit (ref `xgb.train(evals=[(dtrain,'train'),...])`,
    * `learner.cc` EvalOneIter): every watch set is binned with the TRAIN
    * cuts and evaluated each round; the LAST entry drives early stopping.
    * Full per-watch log via [[evalHistoryFull]]. */
  def fitWatches(dataIn: RDD[(Array[Double], Double, Double)],
      watchesIn: Seq[(String, RDD[(Array[Double], Double, Double)])]): BoosterModel = {
    val data = ensurePar(dataIn)
    require(params.treeMethod == "hist", "eval watches support tree_method=hist only")
    val cuts = findCuts(data)
    val numFeatures = cuts.numFeatures
    def toBinned(d: RDD[(Array[Double], Double, Double)]) =
      d.zipWithUniqueId().map { case ((f, y, w), id) => BInst(cuts.binRow(f), y, w, id) }
        .persist(StorageLevel.MEMORY_AND_DISK)
    val binned = toBinned(data); binned.count()
    val watches = watchesIn.map { case (n, d) =>
      val b = toBinned(ensurePar(d)); b.count(); (n, b)
    }
    val model = fitBinned(binned, cuts, numFeatures, watches)
    binned.unpersist(blocking = false)
    watches.foreach(_._2.unpersist(blocking = false))
    model
  }

  /** Per-row base-margin fit (ref `base_margin_` in MetaInfo,
    * `include/xgboost/data.h:77`; margins replace base_score as the
    * boosting start point): rows are (features, label, weight, baseMargin).
    * The returned model's baseScore is 0 — at predict time the caller adds
    * its own margins, exactly like the reference's inplace-predict with
    * base_margin. Single-output hist only. */
  def fitWithBaseMargin(dataIn: RDD[(Array[Double], Double, Double, Double)]): BoosterModel = {
    val data = ensurePar(dataIn)
    require(params.treeMethod == "hist", "base margins support tree_method=hist only")
    require(!isMulti, "per-row base margins support single-output objectives only")
    val cuts = findCuts(data.map(r => (r._1, r._2, r._3)))
    val numFeatures = cuts.numFeatures
    val binned = data.zipWithUniqueId().map { case ((f, y, w, _), id) =>
      BInst(cuts.binRow(f), y, w, id)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()
    val margins = data.map(r => Array(r._4))
    val model = fitBinned(binned, cuts, numFeatures,
      initMargins = Some(margins), baseOverride = Some(Array(0.0)))
    binned.unpersist(blocking = false)
    model
  }

  /** Continue boosting from an existing model (the reference's `xgb_model`
    * continuation, `python-package/xgboost/training.py:40-46` /
    * `Learner::Configure` resuming BoostedRounds): numRounds NEW trees are
    * appended, with margins seeded from the previous model's predictions.
    * gbtree + hist only (dart dropout would have to rescale prior trees). */
  def fitContinue(dataIn: RDD[(Array[Double], Double, Double)], prev: BoosterModel): BoosterModel = {
    val data = ensurePar(dataIn)
    require(params.treeMethod == "hist", "continuation supports tree_method=hist only")
    require(params.booster != "dart", "continuation supports the gbtree booster only")
    require(prev.numGroups == numGroups,
      s"previous model has ${prev.numGroups} output groups, params give $numGroups")
    val cuts = findCuts(data)
    val numFeatures = math.max(cuts.numFeatures, prev.numFeatures)
    val binned = data.zipWithUniqueId().map { case ((f, y, w), id) =>
      BInst(cuts.binRow(f), y, w, id)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()
    val bPrev = binned.sparkContext.broadcast(prev)
    val margins = data.map(r => bPrev.value.margin(r._1))
    val cont = fitBinned(binned, cuts, numFeatures,
      initMargins = Some(margins), baseOverride = Some(prev.baseScore.clone()))
    binned.unpersist(blocking = false)
    bPrev.destroy()
    BoosterModel(prev.trees ++ cont.trees, prev.treeWeights ++ cont.treeWeights,
      prev.treeGroup ++ cont.treeGroup, prev.baseScore, params.objective,
      numGroups, numFeatures)
  }

  /** (iteration, watch-metric value) per evaluated round of the last fit. */
  def evalHistory: Seq[(Int, Double)] = lastHistory.toSeq

  /** Per-iteration eval log over EVERY watch set, keyed "<name>-<metric>"
    * (bare metric name for the implicit train watch) — the reference's
    * `evals_result` surface. */
  def evalHistoryFull: Seq[(Int, Map[String, Double])] = lastFullHistory.toSeq
  /** best (lowest/highest) watch-metric iteration of the last fit. */
  def bestIteration: Int = lastBestIteration
  private val lastHistory = new ArrayBuffer[(Int, Double)]
  private val lastFullHistory = new ArrayBuffer[(Int, Map[String, Double])]

  /** Fitted t⁺/t⁻ position-bias ratios after an unbiased LambdaRank fit
    * (the reference exposes them as objective config "ti+"/"tj-"). */
  def positionBias: Option[(Array[Double], Array[Double])] = lastPositionBias
  private var lastPositionBias: Option[(Array[Double], Array[Double])] = None
  private var lastBestIteration: Int = -1

  /** grow_histmaker / approx (`src/tree/updater_approx.cc:46-100`): the
    * quantile sketch is REBUILT every iteration with the current hessians
    * as sketch weights (`BatchParam.hess` regen), concentrating bins where
    * the loss curvature is — then one tree is grown on the fresh binning.
    * Costs one sketch + re-bin pass per iteration on top of hist.
    * Single-output per-row objectives only (the reference gates approx the
    * same way for risk-set objectives). */
  private def fitApprox(data: RDD[(Array[Double], Double, Double)]): BoosterModel = {
    require(!isMulti, "tree_method=approx supports single-output objectives only")
    require(params.booster != "dart", "tree_method=approx supports the gbtree booster only")
    require(params.numParallelTree <= 1, "num_parallel_tree requires tree_method=hist")
    val obj = Objective(params.objective,
      maxDeltaStep = if (params.maxDeltaStep > 0) params.maxDeltaStep else 0.7,
      alpha = params.quantileAlpha, rho = params.tweedieVariancePower,
      delta = params.pseudoHuberSlope, scalePosWeight = params.scalePosWeight)
    require(!obj.needsGlobalGradients && !obj.usesIntervalLabels,
      s"tree_method=approx does not support ${params.objective}")
    val sc = data.sparkContext
    // derived copy so we never clash with a caller-chosen storage level
    val cached = data.map(identity).persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()

    val badLabels = graft.Agg.aggregate(cached)(0L)((c, r) => if (!obj.validLabel(r._2)) c + 1 else c, _ + _)
    if (badLabels > 0) throw new IllegalArgumentException(
      s"$badLabels label(s) violate the ${params.objective} label constraints")
    val badWeights = graft.Agg.aggregate(cached)(0L)((c, r) => if (r._3 < 0 || r._3.isNaN) c + 1 else c, _ + _)
    if (badWeights > 0) throw new IllegalArgumentException(
      s"$badWeights instance weight(s) are negative or NaN")

    // base-score stats + unified column count, one pass (ref
    // MetaInfo::SynchronizeNumberOfColumns, include/xgboost/data.h:191)
    val (sumWy, sumW, numFeatures) = graft.Agg.aggregate(cached)((0.0, 0.0, 0))(
      (a, r) => (a._1 + r._3 * r._2, a._2 + r._3, math.max(a._3, r._1.length)),
      (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3)))
    val labelMean = if (sumW > 0) sumWy / sumW else 0.0
    val base = Array(params.baseScore.map(obj.probToMargin).getOrElse(obj.baseScore(labelMean)))

    // margins packed with the RAW rows (re-binned every iteration, so the
    // persistent pair carries features, not bins); the per-iteration
    // binned twin is derived 1:1 from this cache and written back through
    // a same-iteration positional zip of parent and direct child — never
    // a zip across persisted generations
    var cacheRaw: RDD[((Array[Double], Double, Double), Array[Double])] =
      cached.map(r => (r, base.clone())).persist(StorageLevel.MEMORY_AND_DISK)
    cacheRaw.count()
    cached.unpersist(blocking = false)

    val colSampler = new ColumnSampler(numFeatures, params.seed, params.featureWeights)
    val treesBuf = new ArrayBuffer[Tree]
    var iter = 0
    while (iter < params.numRounds) {
      if (obj.needsScale) {
        val (s1, s2) = graft.Agg.aggregate(cacheRaw)((0.0, 0.0))(
          { case ((a1, a2), (r, m)) =>
            val res = math.abs(r._2 - m(0))
            (a1 + r._3 * math.sqrt(res), a2 + r._3)
          }, (a, b) => (a._1 + b._1, a._2 + b._2))
        obj.setScale(s1, s2)
      }
      // hessian-weighted re-sketch (updater_approx.cc:46-53)
      val cuts = Binning.findCuts(cacheRaw.map { case ((f, y, w), m) =>
        val o = new Array[Double](2)
        obj.gradient(m(0), y, o)
        (f, math.max(o(1) * w, 1e-16))
      }, numFeatures, params.maxBin)
      val binned = cacheRaw.zipWithUniqueId().map { case (((f, y, w), m), id) =>
        (BInst(cuts.binRow(f), y, w, id), m)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      binned.count()

      val shape = growTree(binned, None, cuts, numFeatures, obj, null, 0,
        iter, colSampler, Array.empty)
      treesBuf += shapeToTree(shape, cuts)

      val bShape = sc.broadcast(shape)
      val old = cacheRaw
      cacheRaw = binned.zip(old).map { case ((r, m), (row, _)) =>
        val o = m.clone(); o(0) += params.eta * bShape.value.predictLeaf(r)(0); (row, o)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      if ((iter + 1) % params.checkpointInterval == 0) cacheRaw.localCheckpoint()
      cacheRaw.count()
      old.unpersist(blocking = false)
      binned.unpersist(blocking = false)
      iter += 1
    }
    cacheRaw.unpersist(blocking = false)
    val n = treesBuf.length
    BoosterModel(treesBuf.toArray, Array.fill(n)(params.eta), Array.fill(n)(0), base,
      params.objective, 1, numFeatures)
  }

  /** survival:aft entry: (features, lowerBound, upperBound, weight) with
    * upperBound = NaN or +Inf for right-censored rows (ref interval labels
    * `labels_lower_bound_`/`labels_upper_bound_`, `include/xgboost/
    * data.h:77`). */
  def fitSurvival(dataIn: RDD[(Array[Double], Double, Double, Double)]): BoosterModel = {
    val data = ensurePar(dataIn)
    require(params.treeMethod == "hist", "survival objectives support tree_method=hist only")
    val cuts = findCuts(data.map(r => (r._1, r._2, r._4)))
    val numFeatures = cuts.numFeatures
    val binned = data.zipWithUniqueId().map { case ((f, lo, hi, w), id) =>
      BInst(cuts.binRow(f), lo, w, id, label2 = hi)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()

    val model = fitBinned(binned, cuts, numFeatures)
    binned.unpersist(blocking = false)
    model
  }

  /** Sparse entry (ref CSR adapter `src/data/adapter.h:216-308`): rows are
    * (sorted feature indices, parallel values, label, weight); absent
    * features are missing (same routing as NaN). Identical cuts, histograms
    * and trees as the equivalent NaN-dense encoding, at O(nnz) row cost. */
  def fitSparse(dataIn: RDD[(Array[Int], Array[Double], Double, Double)],
      numFeatures: Int): BoosterModel = {
    require(params.treeMethod == "hist", "sparse input supports tree_method=hist only")
    val data = ensurePar(dataIn)
    val cuts = Binning.findCutsSparse(data.map(r => (r._1, r._2, r._4)), numFeatures, params.maxBin)
    val binned = data.zipWithUniqueId().map { case ((idx, vs, y, w), id) =>
      BInst(cuts.binRowSparse(idx, vs), y, w, id, idx = idx)
    }.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()
    val model = fitBinned(binned, cuts, numFeatures)
    binned.unpersist(blocking = false)
    model
  }

  /** rank:* entry: (features, relevance label, weight, qid). Co-partitions
    * by qid ONCE (hash partition + in-partition sort, the reference Spark
    * layer's `sortPartitionIfNeeded`, `XGBoostEstimator.scala:142-144`) so
    * every per-iteration λ-gradient pass is a shuffle-free partition walk
    * over contiguous groups. */
  def fitRanking(dataIn: RDD[(Array[Double], Double, Double, Long)]): BoosterModel = {
    // no ensurePar here: the qid partitionBy below IS the spreading shuffle;
    // only its partition COUNT needs the parallelism floor. The shuffle runs
    // FIRST so every subsequent pass (sketch included — a single parquet
    // file would otherwise sketch on 1-3 tasks) is spread across the cluster.
    val data = dataIn
    require(params.treeMethod == "hist", "rank objectives support tree_method=hist only")
    val nParts = params.minTrainPartitions match {
      case -1 => math.max(data.getNumPartitions, data.sparkContext.defaultParallelism)
      case 0 => math.max(data.getNumPartitions, 1)
      case n => math.max(n, 1)
    }
    // The qid co-partitioning shuffle runs once; BOTH passes below re-read
    // its shuffle files (no intermediate persist — caching the pre-binned
    // tuple rows was measured pure heap pressure). The sketch pass needs no
    // qid order, so the in-partition sort happens once, fused into the
    // binned-cache build.
    val parts = data.map { case (f, y, w, q) => (q, (f, y, w)) }
      .partitionBy(new org.apache.spark.HashPartitioner(nParts))
    val cuts = findCuts(parts.map { case (_, (f, y, w)) => (f, y, w) })
    val numFeatures = cuts.numFeatures
    val binned = parts
      .mapPartitions(it => it.toArray.sortBy(_._1).iterator, preservesPartitioning = true)
      .zipWithUniqueId().map { case ((q, (f, y, w)), id) =>
        BInst(cuts.binRow(f), y, w, id, qid = q)
      }.persist(StorageLevel.MEMORY_AND_DISK)
    binned.count()
    val model = fitBinned(binned, cuts, numFeatures)
    binned.unpersist(blocking = false)
    model
  }

  private def findCuts(data: RDD[(Array[Double], Double, Double)]): HistogramCuts = {
    val base = Binning.findCuts(data.map(r => (r._1, r._3)), 0, params.maxBin)
    if (params.catFeatures.isEmpty) base
    else HistogramCuts(base.cuts.zipWithIndex.map { case (c, f) =>
      if (!params.catFeatures.contains(f)) c
      else {
        // categorical: identity binning over integer codes 0..maxCode
        val maxCode = math.max(0, c.last.toInt)
        Array.tabulate(maxCode + 1)(_.toDouble)
      }
    })
  }

  def fitBinned(binnedIn: RDD[BInst], cuts: HistogramCuts, numFeatures: Int,
      watchSets: Seq[(String, RDD[BInst])] = Nil,
      initMargins: Option[RDD[Array[Double]]] = None,
      baseOverride: Option[Array[Double]] = None): BoosterModel = {
    val sc = binnedIn.sparkContext
    val softmax = if (isMulti) new SoftmaxObjective(params.numClass, params.objective == "multi:softprob") else null
    val obj: Objective =
      if (isMulti) null
      else customObj.getOrElse(Objective(params.objective,
        maxDeltaStep = if (params.maxDeltaStep > 0) params.maxDeltaStep else 0.7,
        alpha = params.quantileAlpha, rho = params.tweedieVariancePower,
        delta = params.pseudoHuberSlope,
        aftDistribution = params.aftDistribution, aftScale = params.aftScale,
        rankExpGain = params.ndcgExpGain, rankTopK = params.lambdarankTopK,
        rankPairMethod = params.lambdarankPairMethod, rankNumPair = params.lambdarankNumPair,
        rankUnbiased = params.lambdarankUnbiased, rankBiasNorm = params.lambdarankBiasNorm,
        rankNormalization = params.lambdarankNormalization,
        rankScoreNormalization = params.lambdarankScoreNormalization,
        scalePosWeight = params.scalePosWeight))
    val needsGlobalGrads = !isMulti && obj.needsGlobalGradients
    if (needsGlobalGrads && params.booster == "dart")
      throw new IllegalArgumentException(
        s"${params.objective} does not compose with dart dropout (risk-set gradients need the full-ensemble margin)")

    // ---- fail-fast label/weight validation (ref CheckLabel per objective +
    // MetaInfo::Validate, include/xgboost/data.h:127): one cheap pass, with
    // the violation count in the error like the reference's CHECK messages ----
    // one fused pass: row count, label violations, weight violations, and
    // the weighted label stats the base score needs
    val kMulti = params.numClass
    val intervalLabels = !isMulti && obj.usesIntervalLabels
    val (numRows, badLabels, badWeights, sumWy, sumW) =
      graft.Agg.aggregate(binnedIn)((0L, 0L, 0L, 0.0, 0.0))(
        { case ((n, bl, bw, wy, w), r) =>
          val labelOk =
            if (isMulti) r.label >= 0 && r.label < kMulti && r.label == math.floor(r.label)
            else if (intervalLabels) obj.validInterval(r.label, r.label2)
            else obj.validLabel(r.label)
          val weightOk = r.weight >= 0 && !r.weight.isNaN
          (n + 1, if (labelOk) bl else bl + 1, if (weightOk) bw else bw + 1,
            wy + r.weight * r.label, w + r.weight)
        },
        { case ((a0, a1, a2, a3, a4), (b0, b1, b2, b3, b4)) =>
          (a0 + b0, a1 + b1, a2 + b2, a3 + b3, a4 + b4) })
    if (numRows == 0)
      throw new IllegalArgumentException("cannot train on an empty dataset (0 rows)")
    if (badLabels > 0)
      throw new IllegalArgumentException(
        s"$badLabels label(s) violate the ${params.objective} label constraints")
    if (badWeights > 0)
      throw new IllegalArgumentException(s"$badWeights instance weight(s) are negative or NaN")

    // survival:cox needs |label|-sorted data for its risk-set scans; the
    // order is fixed across iterations, so sort ONCE per fit (range
    // partitioning keeps it distributed) and run every pass on the sorted
    // copy. rank:* objectives instead require qid-contiguous partitions,
    // which fitRanking establishes before binning — no re-sort here.
    val needsCoxSort = needsGlobalGrads && !obj.isInstanceOf[LambdaRankObjective]
    val binned =
      if (needsCoxSort) {
        val sorted = binnedIn.sortBy(r => math.abs(r.label))
          .persist(StorageLevel.MEMORY_AND_DISK)
        sorted.count()
        sorted
      } else binnedIn

    // ---- base score (ref FitStump / InitEstimation, fit_stump.cc:50-82) ----
    require(initMargins.isEmpty || !needsCoxSort,
      "per-row initial margins do not compose with risk-set objectives (binned rows are re-sorted)")
    val base: Array[Double] = baseOverride.getOrElse {
      // sumWy/sumW come from the fused validation pass above
      val labelMean = if (sumW > 0) sumWy / sumW else 0.0
      if (isMulti) Array.fill(numGroups)(0.0)
      else Array(params.baseScore.map(obj.probToMargin).getOrElse(obj.baseScore(labelMean)))
    }

    // The prediction cache is PACKED into the row: one RDD[(BInst,
    // margins)] instead of a second RDD zip-aligned to `binned` — no
    // cross-generation zip to mis-align, and one cached block per
    // partition instead of two. The one construction-time zip (caller-
    // supplied initMargins for continuation / base_margin) pairs two maps
    // of the same parent `data` — positional by construction. The all-base
    // initial cache is a constant-per-row map over the already-persisted
    // binned rows: leaving it lazy skips one persist+count job and its
    // storage; the first advance/flush persists its successor.
    var cache: RDD[(BInst, Array[Double])] = initMargins match {
      case Some(m) =>
        val p = binned.zip(m).persist(StorageLevel.MEMORY_AND_DISK); p.count(); p
      case None => binned.map(r => (r, base.clone()))
    }
    var watchCaches: Array[RDD[(BInst, Array[Double])]] = watchSets.map { case (_, eb) =>
      val em = eb.map(r => (r, base.clone())).persist(StorageLevel.MEMORY_AND_DISK)
      em.count(); em
    }.toArray

    val shapes = new ArrayBuffer[TreeShape]
    val treeGroupBuf = new ArrayBuffer[Int]
    val treeWeightsBuf = new ArrayBuffer[Double]
    val rng = new java.util.Random(params.seed)
    val colSampler = new ColumnSampler(numFeatures, params.seed, params.featureWeights)

    // watch / early-stopping state (ref EvalOneIter + EarlyStopping)
    val watching = params.earlyStoppingRounds > 0 || params.evalMetric.isDefined ||
      params.evalMetrics.nonEmpty ||
      customMetric.isDefined || callbacks.nonEmpty
    lastHistory.clear()
    lastFullHistory.clear()
    lastBestIteration = -1
    var bestValue = Double.NaN
    var roundsSinceBest = 0
    var stop = false
    var stopFromCallback = false // callback stop keeps all trees (no truncation)

    // ---- deferred prediction-cache updates ----
    // A freshly-committed tree does not need to be baked into the margin RDD
    // before the next iteration: `gradOf` already adjusts cached margins by
    // a tree list (DART dropout subtracts w·leaf — a pending tree with
    // weight −w ADDS its contribution). So plain fits keep new trees in a
    // pending list and only materialize a new margin RDD every
    // `marginFlushInterval` trees: one cache-advance job per flush instead
    // of one per iteration, at the cost of ≤interval extra depth-d tree
    // walks per row inside the gradient passes. Addition order of tree
    // contributions is unchanged, so the trained model is bit-identical.
    // Gated off whenever something reads `margins` directly mid-loop
    // without pending-aware adjustment: DART (owns the dropped list),
    // watch/early-stop metrics, eval caches, per-iteration scale stats.
    // Risk-set/ranking global-gradient objectives participate: their
    // computers take the pending list and adjust margins on the fly.
    val deferMargins = params.marginFlushInterval > 1 &&
      params.booster == "gbtree" && !watching && watchSets.isEmpty &&
      (isMulti || !obj.needsScale)
    val pending = new ArrayBuffer[(TreeShape, Double, Int)]
    var flushCount = 0

    // ---- Unbiased LambdaMART position-bias state (driver-side: 4 arrays
    // of maxPositions ≤ 32 doubles; ref lambdarank_obj.cc li_full_/
    // lj_full_/ti_plus_/tj_minus_). t± start at 1 (no bias assumed) and
    // are re-fit from the accumulated eq.30/31 numerators each iteration.
    val unbiasedLR: Option[LambdaRankObjective] = obj match {
      case lr: LambdaRankObjective if lr.unbiased => Some(lr)
      case _ => None
    }
    val biasK = unbiasedLR.map(_.maxPositions).getOrElse(0)
    val tPlus = Array.fill(biasK)(1.0)
    val tMinus = Array.fill(biasK)(1.0)
    val liTotal = new Array[Double](biasK)
    val ljTotal = new Array[Double](biasK)

    // ---- ranking group-weight normalizer (RankingCache,
    // ranking_utils.cc:37-44): w_norm = n_groups / Σ_g weight(g), the
    // group weight read from each group's FIRST row (the reference's
    // one-weight-per-query contract; unit weights ⇒ 1.0, so unweighted
    // fits are unchanged). Every λ-pair is scaled `· w · w_norm`
    // (lambdarank_obj.cc:247-250) — uniformly rescaled group weights
    // leave the trained model identical. One pass, computed once per fit
    // (weights never change across iterations).
    val rankWeightNorm: Double = obj match {
      case _: LambdaRankObjective =>
        val (nGroups, sumGW) = cache.mapPartitions { it =>
          var n = 0L; var s = 0.0; var last = 0L; var first = true
          it.foreach { case (r, _) =>
            if (first || r.qid != last) { n += 1; s += r.weight; last = r.qid; first = false }
          }
          Iterator.single((n, s))
        }.treeReduce((a, b) => (a._1 + b._1, a._2 + b._2),
          depth = graft.Agg.depth(cache.getNumPartitions))
        if (sumGW > 0) nGroups.toDouble / sumGW else 1.0
      case _ => 1.0
    }
    def flushPending(): Unit = if (pending.nonEmpty) {
      val bP = sc.broadcast(pending.toArray)
      val next = cache.map { case (r, m) =>
        val out = m.clone()
        val p = bP.value
        var i = 0
        while (i < p.length) {
          val (sh, w, g) = p(i)
          out(g) += w * sh.predictLeaf(r)(0)
          i += 1
        }
        (r, out)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      flushCount += 1
      // lineage grows one map per flush; truncate on the same cadence (in
      // iterations) as the non-deferred path's checkpointInterval
      if (flushCount % math.max(1, params.checkpointInterval / params.marginFlushInterval) == 0)
        next.localCheckpoint()
      next.count()
      cache.unpersist(blocking = false)
      cache = next
      pending.clear()
    }

    var iter = 0
    while (iter < params.numRounds && !stop) {
      callbacks.foreach(_.beforeIteration(iter))
      // per-iteration objective scale stats (absoluteerror / quantile)
      if (!isMulti && obj.needsScale) {
        val (s1, s2) = graft.Agg.aggregate(cache)((0.0, 0.0))(
          { case ((a1, a2), (r, m)) =>
            val res = math.abs(r.label - m(0))
            (a1 + r.weight * math.sqrt(res), a2 + r.weight)
          },
          (a, b) => (a._1 + b._1, a._2 + b._2))
        obj.setScale(s1, s2)
      }

      // per-round learning rate: a LearningRateScheduler callback overrides
      // params.eta for this round's tree weight (eta lives in tree weights,
      // so the schedule lands in the committed model and the margin cache)
      val iterEta = callbacks.collectFirst {
        case s: LearningRateScheduler => s.etaFor(iter)
      }.getOrElse(params.eta)
      // DART: choose dropped trees for this iteration
      val (droppedIdx, newTreeWeight, dropFactor) = dartDrop(treeWeightsBuf, rng, iterEta)
      val dartDroppedShapes = droppedIdx.map(i => (shapes(i), treeWeightsBuf(i), treeGroupBuf(i)))
      // pending (deferred-cache) trees ride the same adjustment list with
      // negated weights: adjustedMargin's `out -= (−w)·leaf` ≡ `out += w·leaf`
      val droppedShapes =
        if (pending.isEmpty) dartDroppedShapes
        else dartDroppedShapes ++ pending.map { case (sh, w, g) => (sh, -w, g) }

      // risk-set objectives (survival:cox): per-row (g,h) precomputed once
      // per iteration from global order statistics, cached for reuse by
      // every tree level's histogram pass
      val globalGrads: Option[RDD[Array[Double]]] =
        if (needsGlobalGrads) {
          val pendingArr = pending.toArray
          val raw = obj match {
            case lr: LambdaRankObjective =>
              LambdaRankGradients.compute(cache, lr, pendingArr,
                if (lr.unbiased) tPlus else null, if (lr.unbiased) tMinus else null,
                rankWeightNorm)
            case _ => CoxGradients.compute(cache, pendingArr)
          }
          val g = raw.persist(StorageLevel.MEMORY_AND_DISK)
          g.count()
          // position-bias update (UpdatePositionBias, lambdarank_obj.cc:103):
          // accumulate this iteration's per-position numerators into the
          // running totals, then re-fit t±(i) = (l(i)/l(0))^regularizer
          unbiasedLR.foreach { lr =>
            val (li, lj) = LambdaRankGradients.positionBias(
              cache, lr, pendingArr, tPlus, tMinus)
            var i = 0
            while (i < biasK) { liTotal(i) += li(i); ljTotal(i) += lj(i); i += 1 }
            val reg = lr.regularizer
            i = 0
            while (i < biasK) {
              if (liTotal(0) >= 1e-16) tPlus(i) = math.pow(liTotal(i) / liTotal(0), reg)
              if (ljTotal(0) >= 1e-16) tMinus(i) = math.pow(ljTotal(i) / ljTotal(0), reg)
              i += 1
            }
          }
          Some(g)
        } else None

      // gradient-based sampling: one pass for this iteration's mean
      // regularized gradient magnitude (ref CalcSamplingInfo,
      // sampler.cc:39-77); the aggregations then sample ∝ u/ū with 1/p
      // rescaling
      if (gradBased) {
        require(!isMulti, "sampling_method=gradient_based supports single-output objectives")
        val (uSum, n) = withGrads(cache, globalGrads).mapPartitions { it =>
          val out = new Array[Double](2)
          val scratch = new Array[Double](2 * numGroups)
          var s = 0.0; var c = 0L
          it.foreach { case (r, m, pre) =>
            gradOf(r, m, pre, obj, softmax, 0, droppedShapes, out, scratch)
            s += math.sqrt(out(0) * out(0) + params.lambda * out(1) * out(1))
            c += 1
          }
          Iterator.single((s, c))
        }.treeReduce((a, b) => (a._1 + b._1, a._2 + b._2), depth = graft.Agg.depth(cache.getNumPartitions))
        gbMeanU = if (n > 0) uSum / n else 1.0
      }

      // num_parallel_tree (ref InitNewTrees loop `src/gbm/gbtree.cc:282`):
      // K trees per group per round, all from the SAME gradients but with
      // per-tree sampling streams (virtual iteration salt), each committed
      // at weight/K so the complete layer uses the full weight — a bagged
      // forest layer (gbtree.cc:539).
      val kPar = math.max(params.numParallelTree, 1)
      val newShapes = new Array[TreeShape](numGroups * kPar)
      val newGroups = new Array[Int](numGroups * kPar)
      var k = 0
      while (k < numGroups * kPar) {
        val grp = k / kPar
        val saltIter = if (kPar == 1) iter else iter * kPar + (k % kPar)
        newShapes(k) = growTree(cache, globalGrads, cuts, numFeatures, obj, softmax, grp, saltIter, colSampler, droppedShapes)
        newGroups(k) = grp
        k += 1
      }

      // commit: eta lives in the TREE WEIGHT, not the leaf, so DART
      // renormalization (ref NormalizeTrees, `src/gbm/gbtree.h:370`)
      // composes: dropped trees scaled by k/(k+eta), new tree eta/(k+eta).
      val kDrop = droppedIdx.length
      val weightDeltas: Array[(Int, Double)] =
        if (params.booster == "dart" && kDrop > 0) {
          droppedIdx.map { i =>
            val old = treeWeightsBuf(i)
            treeWeightsBuf(i) = old * dropFactor
            (i, treeWeightsBuf(i) - old)
          }
        } else Array.empty
      val newW = newTreeWeight / kPar
      newShapes.zipWithIndex.foreach { case (s, i) =>
        shapes += s; treeGroupBuf += newGroups(i); treeWeightsBuf += newW
      }

      // ---- margin update (prediction cache, gbtree.cc:631-660) ----
      // deferred path: queue the new layer and only materialize every
      // `marginFlushInterval` trees (margins is never read after the loop,
      // so the final partial batch needs no flush at all)
      if (deferMargins) {
        var p = 0
        while (p < newShapes.length) {
          pending += ((newShapes(p), newW, newGroups(p)))
          p += 1
        }
        if (pending.length >= params.marginFlushInterval) flushPending()
      } else {
      // applied identically to the train AND eval margin caches
      val bNew = sc.broadcast(newShapes.zip(newGroups))
      val bAdjust = sc.broadcast(weightDeltas.map { case (i, d) => (shapes(i), treeGroupBuf(i), d) })
      def advance(c: RDD[(BInst, Array[Double])]): RDD[(BInst, Array[Double])] = {
        val next = c.map { case (r, m) =>
          val out = m.clone()
          var g = 0
          while (g < bNew.value.length) {
            val (sh, grp) = bNew.value(g)
            out(grp) += newW * sh.predictLeaf(r)(0)
            g += 1
          }
          var d = 0
          while (d < bAdjust.value.length) {
            val (sh, grp, delta) = bAdjust.value(d)
            out(grp) += delta * sh.predictLeaf(r)(0)
            d += 1
          }
          (r, out)
        }.persist(StorageLevel.MEMORY_AND_DISK)
        if ((iter + 1) % params.checkpointInterval == 0) next.localCheckpoint()
        next.count()
        c.unpersist(blocking = false)
        next
      }
      cache = advance(cache)
      watchCaches = watchCaches.map(advance)
      } // end margin-update branch
      globalGrads.foreach(_.unpersist(blocking = false))

      // ---- watch metrics + early stopping (learner.cc:1164 EvalOneIter,
      // callback.py:311) ---- every watch set is evaluated each round; the
      // LAST entry drives early stopping (reference watchlist semantics:
      // "the last entry in evals will be used for early stopping"). With
      // no explicit watches the training set itself is the implicit watch
      // and log keys stay the bare metric name; named watches log as
      // "<name>-<metric>" like the reference's printed eval lines.
      if (watching) {
        val watchList: Seq[(String, RDD[(BInst, Array[Double])])] =
          if (watchSets.nonEmpty)
            watchSets.map(_._1).zip(watchCaches)
          else Seq(("", cache))
        def maximizeOf(n: String): Boolean =
          n.startsWith("auc") || n.startsWith("ndcg") ||
            n.startsWith("map") || n.startsWith("precision") ||
            n.startsWith("pre@") || n.startsWith("ams@") ||
            n == "interval-regression-accuracy"
        // every metric in the list is evaluated per watch; the LAST one of
        // the LAST watch drives early stopping (reference semantics for a
        // repeated eval_metric param)
        val metricNames: Seq[String] =
          if (params.evalMetrics.nonEmpty) params.evalMetrics
          else Seq(params.evalMetric.getOrElse(
            if (isMulti) "mlogloss" else obj.defaultMetric))
        def evalAll(c: RDD[(BInst, Array[Double])]): Seq[(String, Double, Boolean)] =
          customMetric match {
            case Some(cm) => // user feval: distributed (num, den) sums
              val (num, den) = graft.Agg.aggregate(c)((0.0, 0.0))(
                { case ((a, b), (r, m)) =>
                  val (n2, d2) = cm.contribution(m(0), r.label, r.weight)
                  (a + n2, b + d2)
                },
                (a, b) => (a._1 + b._1, a._2 + b._2))
              Seq((cm.name, cm.finish(num, den), cm.maximize))
            case None =>
              metricNames.map(n => (n, evalMetricValue(n, c, obj), maximizeOf(n)))
          }
        val evals = watchList.flatMap { case (wName, c) =>
          evalAll(c).map { case (mName, v, maximize) =>
            (if (wName.isEmpty) mName else s"$wName-$mName", v, maximize)
          }
        }
        val (_, v, maximize) = evals.last
        lastHistory += ((iter, v))
        lastFullHistory += ((iter, evals.map { case (k, value, _) => (k, value) }.toMap))
        val improved = bestValue.isNaN || (if (maximize) v > bestValue else v < bestValue)
        if (improved) { bestValue = v; lastBestIteration = iter; roundsSinceBest = 0 }
        else {
          roundsSinceBest += 1
          if (params.earlyStoppingRounds > 0 && roundsSinceBest >= params.earlyStoppingRounds)
            stop = true
        }
        if (callbacks.exists(_.afterIteration(iter,
            evals.map { case (k, value, _) => (k, value) }.toMap))) {
          stop = true; stopFromCallback = true
        }
      } else if (callbacks.exists(_.afterIteration(iter, Map.empty))) {
        stop = true; stopFromCallback = true
      }
      if (callbacks.nonEmpty) {
        // lazy model-as-of-this-round builder (checkpoint callbacks);
        // committed trees only — costs nothing unless a callback calls it
        val snap = () => BoosterModel(shapes.toArray.map(shapeToTree(_, cuts)),
          treeWeightsBuf.toArray, treeGroupBuf.toArray, base,
          params.objective, numGroups, numFeatures)
        callbacks.foreach(_.afterIterationSnapshot(iter, snap))
      }
      iter += 1
    }
    callbacks.foreach(_.afterTraining(lastBestIteration))
    unbiasedLR.foreach(_ => lastPositionBias = Some((tPlus.clone(), tMinus.clone())))
    if (needsCoxSort) binned.unpersist(blocking = false)
    watchCaches.foreach(_.unpersist(blocking = false))
    cache.unpersist(blocking = false) // final prediction cache — don't leak blocks

    // early stop ⇒ truncate to the best iteration
    // (numGroups × num_parallel_tree trees per round = one layer)
    val layer = numGroups * math.max(params.numParallelTree, 1)
    val keep =
      if (stop && !stopFromCallback && lastBestIteration >= 0) (lastBestIteration + 1) * layer
      else shapes.length
    val trees = shapes.take(keep).toArray.map(shapeToTree(_, cuts))
    BoosterModel(trees, treeWeightsBuf.take(keep).toArray, treeGroupBuf.take(keep).toArray,
      base, params.objective, numGroups, numFeatures)
  }

  /** DART dropout selection + new-tree weight + dropped-tree rescale
    * factor (ref DropTrees `src/gbm/gbtree.cc:566-608` / NormalizeTrees
    * `:537-563`). Our leaves are unscaled with eta carried in treeWeights
    * (reference folds lr into leaves with weight_drop on top — same math):
    * no-drop rounds commit at weight eta, so rate_drop=0 dart boosts
    * identically to gbtree.
    *
    * sample_type=weighted: drop prob_i = rate_drop·N·w_i/Σw (weight ratios
    * are identical in both weight conventions, the lr factor cancels).
    * normalize_type=tree: new eta/(k+eta), dropped ×k/(k+eta);
    * normalize_type=forest: new eta/(1+eta), dropped ×1/(1+eta). */
  private def dartDrop(weights: scala.collection.Seq[Double],
      rng: java.util.Random, eta: Double): (Array[Int], Double, Double) = {
    if (params.booster != "dart") return (Array.empty, eta, 1.0)
    val numTrees = weights.length
    if (numTrees == 0) return (Array.empty, eta, 1.0)
    if (params.skipDrop > 0 && rng.nextDouble() < params.skipDrop)
      return (Array.empty, eta, 1.0)
    val weighted = params.sampleType == "weighted"
    val sumW = if (weighted) weights.sum else 0.0
    val dropped =
      if (weighted && sumW > 0)
        (0 until numTrees).filter(i =>
          rng.nextDouble() < params.rateDrop * numTrees * weights(i) / sumW).toArray
      else (0 until numTrees).filter(_ => rng.nextDouble() < params.rateDrop).toArray
    val finalDropped =
      if (dropped.nonEmpty || !params.oneDrop) dropped
      else if (weighted && sumW > 0) {
        // discrete draw ∝ weight (ref one_drop weighted branch)
        var u = rng.nextDouble() * sumW
        var i = 0
        while (i < numTrees - 1 && u >= weights(i)) { u -= weights(i); i += 1 }
        Array(i)
      } else Array(rng.nextInt(numTrees))
    val k = finalDropped.length
    if (k == 0) (finalDropped, eta, 1.0)
    else if (params.normalizeType == "forest")
      (finalDropped, eta / (1.0 + eta), 1.0 / (1.0 + eta))
    else (finalDropped, eta / (k + eta), k.toDouble / (k + eta))
  }

  /** Grow one tree for output group `grp`, dispatching on the expand
    * policy (ref `src/tree/driver.h:1-126`: depthwise BFS vs lossguide
    * best-first queue; `grow_policy` `src/tree/param.h:38,99-106`). */
  private def growTree(
      cache: RDD[(BInst, Array[Double])],
      globalGrads: Option[RDD[Array[Double]]], cuts: HistogramCuts,
      numFeatures: Int, obj: Objective, softmax: SoftmaxObjective, grp: Int,
      iter: Int, colSampler: ColumnSampler,
      droppedShapes: Array[(TreeShape, Double, Int)]): TreeShape = params.growPolicy match {
    case "depthwise" => growTreeDepthwise(cache, globalGrads, cuts,
      numFeatures, obj, softmax, grp, iter, colSampler, droppedShapes)
    case "lossguide" => growTreeLossguide(cache, globalGrads, cuts,
      numFeatures, obj, softmax, grp, iter, colSampler, droppedShapes)
    case other => throw new IllegalArgumentException(
      s"unknown grow_policy: $other (supported: depthwise, lossguide)")
  }

  /** Best-first (lossguide) growth: a driver-side priority queue expands
    * the highest-gain candidate anywhere in the tree until `maxLeaves`
    * (ref `src/tree/driver.h` lossguide ordering). Each split costs ONE
    * histogram aggregation (smaller child built, sibling by subtraction),
    * so a tree with L leaves costs L−1 aggregation rounds — the price of
    * unbalanced trees; depthwise batches a whole level per round. */
  private def growTreeLossguide(
      cache: RDD[(BInst, Array[Double])],
      globalGrads: Option[RDD[Array[Double]]], cuts: HistogramCuts,
      numFeatures: Int, obj: Objective, softmax: SoftmaxObjective, grp: Int,
      iter: Int, colSampler: ColumnSampler,
      droppedShapes: Array[(TreeShape, Double, Int)]): TreeShape = {

    val nodes = new ArrayBuffer[BuildNode]
    val treeCols = colSampler.sampleTree(iter, params.colsampleBytree)
    val (rootG, rootH) = aggregateTotals(cache, globalGrads, obj, softmax, grp, iter, droppedShapes)
    nodes += new BuildNode(rootG, rootH, 0)
    if (params.interactionConstraints.nonEmpty)
      nodes(0).allowed = Some((0 until numFeatures).toSet)

    val hists = collection.mutable.Map[Int, Array[Double]]()
    hists(0) = aggregateHistograms(cache, globalGrads, cuts, obj, softmax,
      grp, iter, Array(0), nodesShape(nodes), droppedShapes)(0)

    // max-queue by (gain, then smaller nid) for deterministic tie-breaks
    val queue = collection.mutable.PriorityQueue.empty[(Double, Int, SplitCandidate)](
      Ordering.by { case (gain, nid, _) => (gain, -nid) })
    def tryEnqueue(nid: Int): Unit = {
      val n = nodes(nid)
      if (params.maxDepth > 0 && n.depth >= params.maxDepth) return
      val nodeCols0 = colSampler.sampleNode(
        colSampler.sampleLevel(treeCols, iter, n.depth, params.colsampleBylevel),
        iter, n.depth, nid, params.colsampleBynode)
      val nodeCols = n.allowed match {
        case Some(a) => nodeCols0.filter(a.contains)
        case None => nodeCols0
      }
      SplitEnumerator.bestSplit(hists(nid), cuts, nodeCols, n.g, n.h, params,
        n.lowerBound, n.upperBound) match {
        case Some(c) if c.gain > 0 => queue.enqueue((c.gain, nid, c))
        case _ => ()
      }
    }
    tryEnqueue(0)

    var leaves = 1
    val maxLeaves = if (params.maxLeaves > 0) params.maxLeaves else Int.MaxValue
    while (queue.nonEmpty && leaves < maxLeaves) {
      val (_, nid, c) = queue.dequeue()
      applySplit(nodes, nid, c)
      leaves += 1
      val l = nodes(nid).left; val r = nodes(nid).right
      val (small, large) = if (nodes(l).h <= nodes(r).h) (l, r) else (r, l)
      val built = aggregateHistograms(cache, globalGrads, cuts, obj,
        softmax, grp, iter, Array(small), nodesShape(nodes), droppedShapes)(0)
      hists(small) = built
      val ph = hists(nid)
      val sib = new Array[Double](ph.length)
      var i = 0
      while (i < ph.length) { sib(i) = ph(i) - built(i); i += 1 }
      hists(large) = sib
      hists.remove(nid) // expanded nodes never need their histogram again
      tryEnqueue(l)
      tryEnqueue(r)
    }
    nodes.foreach { n =>
      // every node (internal too) gets its would-be leaf weight so the
      // prune updater can collapse splits exactly (ref CollapseToLeaf)
      n.weight = SplitEnumerator.calcWeight(n.g, n.h, params, n.lowerBound, n.upperBound)
    }
    finalizeShape(nodes)
  }

  /** Grow one tree level-synchronously (ref UpdateTree,
    * `updater_quantile_hist.cc:96-180`): ONE histogram aggregation per
    * level covers every frontier node. */
  private def growTreeDepthwise(
      cache: RDD[(BInst, Array[Double])],
      globalGrads: Option[RDD[Array[Double]]], cuts: HistogramCuts,
      numFeatures: Int, obj: Objective, softmax: SoftmaxObjective, grp: Int,
      iter: Int, colSampler: ColumnSampler,
      droppedShapes: Array[(TreeShape, Double, Int)]): TreeShape = {

    val sc = cache.sparkContext
    val nodes = new ArrayBuffer[BuildNode]
    val treeCols = colSampler.sampleTree(iter, params.colsampleBytree)

    // root totals
    val (rootG, rootH) = aggregateTotals(cache, globalGrads, obj, softmax, grp, iter, droppedShapes)
    nodes += new BuildNode(rootG, rootH, 0)
    if (params.interactionConstraints.nonEmpty)
      nodes(0).allowed = Some((0 until numFeatures).toSet)

    var frontier = Array(0)
    var parentHists = Map.empty[Int, Array[Double]] // node id → hist of that node
    var depth = 0
    var leaves = 1

    while (frontier.nonEmpty && depth < params.maxDepth &&
        (params.maxLeaves == 0 || leaves < params.maxLeaves)) {

      // subtraction trick (histogram.h:203-213,386-425): build smaller sibling
      val (buildSet, subtractSet) = planHistBuilds(frontier, parentHists, nodes)
      val built = aggregateHistograms(cache, globalGrads, cuts, obj, softmax, grp,
        iter, buildSet, nodesShape(nodes), droppedShapes)
      val hists = collection.mutable.Map[Int, Array[Double]](buildSet.zip(built).toSeq: _*)
      subtractSet.foreach { case (nid, parent, sibling) =>
        val ph = parentHists(parent)
        val sh = hists(sibling)
        val out = new Array[Double](ph.length)
        var i = 0
        while (i < ph.length) { out(i) = ph(i) - sh(i); i += 1 }
        hists(nid) = out
      }

      val levelCols = colSampler.sampleLevel(treeCols, iter, depth, params.colsampleBylevel)
      val nextFrontier = new ArrayBuffer[Int]
      frontier.foreach { nid =>
        val n = nodes(nid)
        val nodeCols0 = colSampler.sampleNode(levelCols, iter, depth, nid, params.colsampleBynode)
        val nodeCols = n.allowed match {
          case Some(a) => nodeCols0.filter(a.contains)
          case None => nodeCols0
        }
        val cand = SplitEnumerator.bestSplit(hists(nid), cuts, nodeCols, n.g, n.h,
          params, n.lowerBound, n.upperBound)
        cand match {
          case Some(c) if c.gain > 0 &&
              (params.maxLeaves == 0 || leaves + 1 <= math.max(params.maxLeaves, 2)) =>
            applySplit(nodes, nid, c)
            leaves += 1
            nextFrontier += nodes(nid).left
            nextFrontier += nodes(nid).right
          case _ =>
            n.weight = SplitEnumerator.calcWeight(n.g, n.h, params, n.lowerBound, n.upperBound)
        }
      }
      parentHists = hists.toMap
      frontier = nextFrontier.toArray
      depth += 1
    }
    // every node (internal too) gets its would-be leaf weight so the
    // prune updater can collapse splits exactly (ref CollapseToLeaf)
    nodes.foreach { n =>
      n.weight = SplitEnumerator.calcWeight(n.g, n.h, params, n.lowerBound, n.upperBound)
    }
    finalizeShape(nodes)
  }

  private def applySplit(nodes: ArrayBuffer[BuildNode], nid: Int, c: SplitCandidate): Unit = {
    val n = nodes(nid)
    n.feature = c.feature; n.splitBin = c.splitBin; n.defaultLeft = c.defaultLeft
    n.gain = c.gain; n.catRight = c.catRight
    val l = new BuildNode(c.gl, c.hl, n.depth + 1, n.lowerBound, n.upperBound)
    val r = new BuildNode(c.gr, c.hr, n.depth + 1, n.lowerBound, n.upperBound)
    // monotone constraints (ref split_evaluator.h:71-440): tighten bounds
    val mono = if (params.monotoneConstraints.isEmpty) 0 else params.monotoneConstraints(c.feature)
    if (mono != 0) {
      val mid = (c.wl + c.wr) * 0.5
      if (mono > 0) { l.upperBound = math.min(l.upperBound, mid); r.lowerBound = math.max(r.lowerBound, mid) }
      else { l.lowerBound = math.max(l.lowerBound, mid); r.upperBound = math.min(r.upperBound, mid) }
    }
    // interaction constraints (ref src/tree/constraints.cc)
    n.allowed.foreach { a =>
      val newAllowed = params.interactionConstraints
        .filter(_.contains(c.feature)).foldLeft(Set.empty[Int])(_ ++ _)
      val childAllowed = a.intersect(if (newAllowed.isEmpty) Set(c.feature) else newAllowed)
      l.allowed = Some(childAllowed); r.allowed = Some(childAllowed)
    }
    nodes += l
    n.left = nodes.length - 1
    nodes += r
    n.right = nodes.length - 1
  }

  /** Decide which child of each split pair gets a fresh histogram build
    * (smaller sumHess) vs parent-subtraction (ref BuildHistLeftRight,
    * histogram.h:386-425). Root or nodes whose parent hist is unavailable
    * are built directly. Returns (buildSet, subtract = (nid, parent, sibling)). */
  private def planHistBuilds(
      frontier: Array[Int], parentHists: Map[Int, Array[Double]],
      nodes: ArrayBuffer[BuildNode]): (Array[Int], Array[(Int, Int, Int)]) = {
    if (frontier.sameElements(Array(0))) return (Array(0), Array.empty)
    val build = new ArrayBuffer[Int]
    val subtract = new ArrayBuffer[(Int, Int, Int)]
    // frontier children come in (left, right) consecutive pairs per parent
    val byParent = frontier.groupBy { nid =>
      nodes.indexWhere(p => p.left == nid || p.right == nid)
    }
    byParent.foreach { case (parent, kids) =>
      if (parent < 0 || !parentHists.contains(parent) || kids.length != 2) {
        kids.foreach(build += _)
      } else {
        val Array(a, b) = kids
        val (small, large) = if (nodes(a).h <= nodes(b).h) (a, b) else (b, a)
        build += small
        subtract += ((large, parent, small))
      }
    }
    (build.toArray, subtract.toArray)
  }

  private def nodesShape(nodes: ArrayBuffer[BuildNode]): TreeShape = {
    val n = nodes.length
    TreeShape(
      Array.tabulate(n)(i => nodes(i).feature),
      Array.tabulate(n)(i => nodes(i).splitBin),
      Array.tabulate(n)(i => nodes(i).defaultLeft),
      Array.tabulate(n)(i => nodes(i).left),
      Array.tabulate(n)(i => nodes(i).right),
      Array.tabulate(n)(i => nodes(i).catRight),
      Array.tabulate(n)(i => Array(nodes(i).weight)),
      Array.tabulate(n)(i => nodes(i).h),
      Array.tabulate(n)(i => nodes(i).gain))
  }

  private def finalizeShape(nodes: ArrayBuffer[BuildNode]): TreeShape = nodesShape(nodes)

  private def shapeToTree(s: TreeShape, cuts: HistogramCuts): Tree = {
    val n = s.feature.length
    Tree(Array.tabulate(n) { i =>
      if (s.feature(i) < 0)
        Node.makeLeaf(s.leaf(i), s.sumHess(i))
      else {
        val f = s.feature(i)
        val thr =
          if (s.catRight(i) != null) 0.0
          else cuts.cuts(f)(s.splitBin(i))
        // internal nodes carry their would-be leaf weight (s.leaf) so the
        // prune updater can collapse them without re-aggregating data
        Node(f, thr, s.defaultLeft(i), s.left(i), s.right(i), s.leaf(i),
          s.gain(i), s.sumHess(i),
          if (s.catRight(i) != null) s.catRight(i) else Array.empty)
      }
    })
  }

  // ---- watch metric evaluation (RDD form of graft.metric.Metrics for the
  // training loop — one treeAggregate per evaluated iteration) -------------

  /** ONE metric-name registry for every facade (train/cv/estimators):
    * elementwise names run as fused treeAggregates; ranking names
    * (ndcg@k/map@k/pre@k, ranking auc) walk the qid-co-partitioned groups
    * in place (no shuffle); global-sweep names (auc/aucpr, multiclass OvR
    * auc, cox-nloglik) delegate to the oracle-verified DataFrame kernels in
    * [[graft.metric.Metrics]]. Mirrors the reference's metric registry
    * dispatch (`src/metric/metric.cc` Metric::Create). */
  private def evalMetricValue(name: String, c: RDD[(BInst, Array[Double])],
      obj: Objective): Double = {
    // bare "ndcg"/"map"/"pre" = whole-list k (the reference's default when
    // no @k suffix is given, rank_metric.cc topn=max)
    if (name.startsWith("ndcg@"))
      return evalNdcg(c, name.stripPrefix("ndcg@").toInt)
    if (name == "ndcg")
      return evalNdcg(c, Int.MaxValue)
    if (name.startsWith("map@"))
      return evalMapAt(c, name.stripPrefix("map@").toInt)
    if (name == "map")
      return evalMapAt(c, Int.MaxValue)
    if (name.startsWith("pre@"))
      return evalPrecAt(c, name.stripPrefix("pre@").toInt)
    if (name == "pre")
      return evalPrecAt(c, Int.MaxValue)
    if (name == "auc" && params.objective.startsWith("rank:"))
      return evalGroupAuc(c)
    if (name == "auc" || name == "aucpr" || name.startsWith("ams@"))
      return evalAucGlobal(name, c)
    if (name == "cox-nloglik")
      return evalCoxNloglik(c)
    if (name == "aft-nloglik" || name == "interval-regression-accuracy") {
      val aft = obj match {
        case a: graft.objective.AFT => a
        case _ => new graft.objective.AFT(params.aftDistribution, params.aftScale)
      }
      val (s, n) = graft.Agg.aggregate(c)((0.0, 0.0))(
        { case ((a, b), (r, m)) =>
          val v =
            if (name == "aft-nloglik") aft.nloglik(m(0), r.label, r.label2)
            else if (m(0) >= math.log(r.label) &&
              (r.label2.isNaN || r.label2.isInfinite || m(0) <= math.log(r.label2))) 1.0
            else 0.0
          (a + v, b + 1.0)
        },
        (a, b) => (a._1 + b._1, a._2 + b._2))
      return if (n > 0) s / n else 0.0
    }
    def ratio(f: (Double, Double, Double) => Double, pt: Double => Double = identity): Double = {
      val (s, w) = graft.Agg.aggregate(c)((0.0, 0.0))(
        { case ((a, b), (r, m)) => (a + r.weight * f(pt(m(0)), r.label, r.weight), b + r.weight) },
        (a, b) => (a._1 + b._1, a._2 + b._2))
      if (w > 0) s / w else 0.0
    }
    def ratioMulti(f: (Array[Double], Double) => Double): Double = {
      val (s, w) = graft.Agg.aggregate(c)((0.0, 0.0))(
        { case ((a, b), (r, m)) => (a + r.weight * f(m, r.label), b + r.weight) },
        (a, b) => (a._1 + b._1, a._2 + b._2))
      if (w > 0) s / w else 0.0
    }
    if (isMulti) {
      name match {
        case "merror" => ratioMulti((m, y) => if (argmaxOf(m) != y.toInt) 1.0 else 0.0)
        case "mlogloss" => ratioMulti((m, y) => {
          var mx = m(0); var k = 1
          while (k < numGroups) { if (m(k) > mx) mx = m(k); k += 1 }
          var se = 0.0; k = 0
          while (k < numGroups) { se += math.exp(m(k) - mx); k += 1 }
          -(m(y.toInt) - mx - math.log(se))
        })
        case other => throw new IllegalArgumentException(
          s"unsupported multiclass watch metric: $other (supported: merror, mlogloss)")
      }
    } else {
      val pt: Double => Double = obj.predTransform
      name match {
        case "rmse" => math.sqrt(ratio((p, y, _) => (p - y) * (p - y), pt))
        case "rmsle" => math.sqrt(ratio((p, y, _) => {
          val d = math.log1p(p) - math.log1p(y); d * d
        }, pt))
        case "mae" => ratio((p, y, _) => math.abs(p - y), pt)
        case "mape" => ratio((p, y, _) => math.abs((y - p) / y), pt)
        case "logloss" => ratio((p, y, _) => {
          val c = math.max(math.min(p, 1 - 1e-16), 1e-16)
          -(y * math.log(c) + (1 - y) * math.log(1 - c))
        }, pt)
        case "error" => ratio((p, y, _) => if ((p > 0.5) != (y > 0.5)) 1.0 else 0.0, pt)
        case "poisson-nloglik" => ratio((p, y, _) => {
          val c = math.max(p, 1e-16); c - y * math.log(c)
        }, pt)
        case "gamma-nloglik" => ratio((p, y, _) => {
          val c = math.max(p, 1e-16); y / c + math.log(c)
        }, pt)
        case "mphe" => ratio((p, y, _) => math.sqrt(1 + (p - y) * (p - y)) - 1, pt)
        case "gamma-deviance" => ratio((p, y, _) =>
          2.0 * (math.log((p + 1e-16) / (y + 1e-16)) + y / (p + 1e-16) - 1.0), pt)
        case q if q.startsWith("error@") =>
          val t = q.stripPrefix("error@").toDouble
          ratio((p, y, _) => if ((p > t) != (y > 0.5)) 1.0 else 0.0, pt)
        case q if q == "tweedie-nloglik" || q.startsWith("tweedie-nloglik@") =>
          val rho = if (q.contains('@')) q.stripPrefix("tweedie-nloglik@").toDouble
            else params.tweedieVariancePower
          ratio((p, y, _) => {
            val c = math.max(p, 1e-16)
            -(y * math.pow(c, 1.0 - rho) / (1.0 - rho) - math.pow(c, 2.0 - rho) / (2.0 - rho))
          }, pt)
        case q if q == "quantile" || q.startsWith("quantile@") =>
          val alpha = if (q.contains('@')) q.stripPrefix("quantile@").toDouble
            else params.quantileAlpha
          ratio((p, y, _) => {
            val d = y - p
            if (d >= 0) alpha * d else (alpha - 1.0) * d
          }, pt)
        case other => throw new IllegalArgumentException(
          s"unsupported watch metric: $other (supported: rmse, rmsle, mae, mape, " +
            "logloss, error[@t], poisson-nloglik, gamma-nloglik, gamma-deviance, " +
            "tweedie-nloglik[@rho], quantile[@alpha], mphe, auc, aucpr, cox-nloglik, " +
            "aft-nloglik, interval-regression-accuracy, ndcg@k, map[@k], pre@k)")
      }
    }
  }

  @inline private def argmaxOf(m: Array[Double]): Int = {
    var best = 0; var k = 1
    while (k < m.length) { if (m(k) > m(best)) best = k; k += 1 }
    best
  }

  /** mean NDCG@k over qid-contiguous groups (ranking fits only). */
  private def evalNdcg(c: RDD[(BInst, Array[Double])], k: Int): Double = {
    val expGain = params.ndcgExpGain
    val (s, n) = c.mapPartitions { it =>
      val base = it.buffered
      var sum = 0.0; var cnt = 0L
      val buf = new ArrayBuffer[(Double, Double)] // (label, margin)
      while (base.hasNext) {
        buf.clear()
        val q = base.head._1.qid
        while (base.hasNext && base.head._1.qid == q) {
          val (r, m) = base.next(); buf += ((r.label, m(0)))
        }
        def gain(l: Double) = if (expGain) math.pow(2.0, l) - 1.0 else l
        def disc(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
        val ranked = buf.indices.sortBy(i => (-buf(i)._2, i)).take(k)
        val dcg = ranked.zipWithIndex.map { case (i, r) => gain(buf(i)._1) * disc(r + 1) }.sum
        val idcg = buf.map(x => gain(x._1)).sortBy(-_).take(k).zipWithIndex
          .map { case (g, r) => g * disc(r + 1) }.sum
        sum += (if (idcg > 0) dcg / idcg else 0.0)
        cnt += 1
      }
      Iterator.single((sum, cnt))
    }.treeReduce((a, b) => (a._1 + b._1, a._2 + b._2), depth = graft.Agg.depth(c.getNumPartitions))
    if (n > 0) s / n else 0.0
  }

  /** Mean of a per-group statistic over qid-contiguous groups (ranking
    * fits co-partition+sort by qid, so each group is walked in memory with
    * no shuffle). `f` sees (margin, label) pairs in row order; None
    * excludes the group from the mean (the reference's invalid-group
    * handling, `auc.cc:206`). */
  private def groupMean(c: RDD[(BInst, Array[Double])])(
      f: ArrayBuffer[(Double, Double)] => Option[Double]): Double = {
    val (s, n) = c.mapPartitions { it =>
      val base = it.buffered
      var sum = 0.0; var cnt = 0L
      val buf = new ArrayBuffer[(Double, Double)]
      while (base.hasNext) {
        buf.clear()
        val q = base.head._1.qid
        while (base.hasNext && base.head._1.qid == q) {
          val (r, m) = base.next(); buf += ((m(0), r.label))
        }
        f(buf) match { case Some(v) => sum += v; cnt += 1; case None => }
      }
      Iterator.single((sum, cnt))
    }.treeReduce((a, b) => (a._1 + b._1, a._2 + b._2), depth = graft.Agg.depth(c.getNumPartitions))
    if (n > 0) s / n else 0.0
  }

  /** map@k (`rank_metric.cc:465`): binary relevance label>0.5. */
  private def evalMapAt(c: RDD[(BInst, Array[Double])], k: Int): Double =
    groupMean(c) { buf =>
      val order = buf.indices.sortBy(i => (-buf(i)._1, i)).take(k)
      var nrel = 0.0; var ap = 0.0; var rk = 0; var cum = 0.0
      order.foreach { i =>
        rk += 1
        if (buf(i)._2 > 0.5) { cum += 1; nrel += 1; ap += cum / rk }
      }
      Some(if (nrel > 0) ap / nrel else 0.0)
    }

  /** pre@k (`rank_metric.cc:461`). */
  private def evalPrecAt(c: RDD[(BInst, Array[Double])], k: Int): Double =
    groupMean(c) { buf =>
      // hits / min(k, |group|) — rank_metric.cc:315
      val n = math.min(k, buf.length)
      val top = buf.indices.sortBy(i => (-buf(i)._1, i)).take(n)
      Some(top.count(i => buf(i)._2 > 0.5).toDouble / n)
    }

  /** Per-group ranking ROC-AUC (`auc.cc:165` RankingAUC): tie-correct
    * trapezoid per group, groups lacking both classes excluded. */
  private def evalGroupAuc(c: RDD[(BInst, Array[Double])]): Double =
    groupMean(c) { buf =>
      val byScore = buf.groupBy(_._1).toSeq.sortBy(-_._1)
      var ctp = 0.0; var cfp = 0.0; var area = 0.0
      byScore.foreach { case (_, xs) =>
        var tp = 0.0; var fp = 0.0
        xs.foreach { case (_, y) => if (y > 0.5) tp += 1 else fp += 1 }
        area += fp * (ctp + (ctp + tp)) / 2.0
        ctp += tp; cfp += fp
      }
      if (ctp > 0 && cfp > 0) Some(area / (ctp * cfp)) else None
    }

  @inline private def softprobOf(m: Array[Double]): Array[Double] = {
    var mx = m(0); var k = 1
    while (k < m.length) { if (m(k) > mx) mx = m(k); k += 1 }
    val e = new Array[Double](m.length); var s = 0.0
    k = 0
    while (k < m.length) { e(k) = math.exp(m(k) - mx); s += e(k); k += 1 }
    k = 0
    while (k < m.length) { e(k) /= s; k += 1 }
    e
  }

  /** Global-sweep AUCs through the oracle-verified DataFrame kernels:
    * binary ROC/PR ([[graft.metric.Metrics.aucBinary]]/[[
    * graft.metric.Metrics.aucPR]] — AUC is invariant under the monotone
    * predTransform, so raw margins feed the sweep) and multiclass
    * one-vs-rest ROC ([[graft.metric.Metrics.aucMulticlass]] over
    * softprob). All ride DistributedCumsum — no single-task window. */
  private def evalAucGlobal(name: String,
      c: RDD[(BInst, Array[Double])]): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val out =
      if (isMulti) {
        require(name == "auc", s"$name is not defined for multiclass models")
        val df = c
          .map { case (r, m) => (r.label, r.weight, softprobOf(m).toSeq) }
          .toDF("label", "weight", "probs")
        graft.metric.Metrics.aucMulticlass(df, col("probs"), col("label"), col("weight"))
      } else {
        val df = c
          .map { case (r, m) => (r.label, r.weight, m(0)) }
          .toDF("label", "weight", "pred")
        if (name == "auc")
          graft.metric.Metrics.aucBinary(df, col("pred"), col("label"), col("weight"))
        else if (name.startsWith("ams@"))
          graft.metric.Metrics.amsAt(df, col("pred"), col("label"), col("weight"),
            name.stripPrefix("ams@").toDouble)
        else
          graft.metric.Metrics.aucPR(df, col("pred"), col("label"), col("weight"))
      }
    val r = out.head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** cox-nloglik (`rank_metric.cc:204` EvalCox) through the
    * DistributedCumsum risk-set kernel. */
  private def evalCoxNloglik(c: RDD[(BInst, Array[Double])]): Double = {
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = c.map { case (r, m) => (r.label, m(0)) }.toDF("y", "p")
    val r = graft.metric.Metrics.coxNloglik(df, col("p"), col("y")).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  // ---- distributed aggregations -------------------------------------------

  /** Deterministic per-(row, iteration) uniform in [0,1). */
  @inline private def rand01(rowId: Long, iter: Int): Double = {
    var z = rowId ^ (params.seed + 0x9E3779B97F4A7C15L * (iter + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  /** Per-iteration deterministic row subsample predicate
    * (ref `src/tree/hist/sampler.cc:204`; seeded per iteration). */
  @inline private def sampled(rowId: Long, iter: Int): Boolean =
    params.subsample >= 1.0 || rand01(rowId, iter) < params.subsample

  /** Gradient-based sampling (ref `CalcSamplingInfo`/`GradientBasedSampling`,
    * `src/tree/hist/sampler.cc:39-120`): keep probability
    * `p = min(1, subsample · u / ū)` with `u = √(g² + λ·h²)` the
    * regularized gradient magnitude, and kept gradients rescaled by `1/p`
    * (unbiased). `ū` (gbMeanU) comes from one aggregation per iteration;
    * the reference solves the exact threshold by search — the mean-scaled
    * form is the standard one-shot approximation. Returns 0 (drop row) or
    * the scale factor. */
  @inline private def gradientSampleScale(rowId: Long, iter: Int,
      g: Double, h: Double): Double = {
    val u = math.sqrt(g * g + params.lambda * h * h)
    val p = math.min(1.0, params.subsample * u / math.max(gbMeanU, 1e-300))
    if (rand01(rowId, iter) < p) 1.0 / p else 0.0
  }

  private val gradBased =
    params.samplingMethod == "gradient_based" && params.subsample < 1.0
  /** mean regularized gradient magnitude of the current iteration. */
  private var gbMeanU: Double = 1.0

  /** Adjusted margin for group g under DART dropout: cached full-ensemble
    * margin minus dropped trees' contributions (ref DropTrees,
    * `src/gbm/gbtree.h:369`). */
  @inline private def adjustedMargin(
      m: Array[Double], r: BInst, grp: Int,
      dropped: Array[(TreeShape, Double, Int)]): Double = {
    var out = m(grp)
    var i = 0
    while (i < dropped.length) {
      val (sh, w, g) = dropped(i)
      if (g == grp) out -= w * sh.predictLeaf(r)(0)
      i += 1
    }
    out
  }

  /** Attach the (optional) precomputed per-row gradients to the packed
    * (row, margin) cache. The gradients RDD is derived from `cache` by a
    * mapPartitions-style transform in the SAME iteration (never persisted
    * across margin generations), so the zip is positional, shuffle-free
    * and alignment-safe. `pre == null` ⇒ compute from the objective
    * kernel. */
  private def withGrads(
      cache: RDD[(BInst, Array[Double])],
      grads: Option[RDD[Array[Double]]]): RDD[(BInst, Array[Double], Array[Double])] =
    grads match {
      case Some(g) => cache.zip(g).map { case ((r, m), gh) => (r, m, gh) }
      case None => cache.map { case (r, m) => (r, m, null) }
    }

  private def gradOf(
      r: BInst, m: Array[Double], pre: Array[Double], obj: Objective,
      softmax: SoftmaxObjective,
      grp: Int, dropped: Array[(TreeShape, Double, Int)], out: Array[Double],
      scratch: Array[Double]): Unit = {
    if (pre != null) { // risk-set objectives: already weighted
      out(0) = pre(0); out(1) = pre(1)
    } else if (isMulti) {
      // softmax needs all group margins (dropout adjustment per group)
      if (dropped.isEmpty) softmax.gradient(m, r.label, scratch)
      else {
        val adj = new Array[Double](numGroups)
        var g = 0
        while (g < numGroups) { adj(g) = adjustedMargin(m, r, g, dropped); g += 1 }
        softmax.gradient(adj, r.label, scratch)
      }
      out(0) = scratch(2 * grp) * r.weight
      out(1) = scratch(2 * grp + 1) * r.weight
    } else {
      val margin = if (dropped.isEmpty) m(0) else adjustedMargin(m, r, 0, dropped)
      if (obj.usesIntervalLabels) obj.gradientInterval(margin, r.label, r.label2, out)
      else obj.gradient(margin, r.label, out)
      out(0) *= r.weight
      out(1) *= r.weight
    }
  }

  private def aggregateTotals(
      cache: RDD[(BInst, Array[Double])],
      globalGrads: Option[RDD[Array[Double]]], obj: Objective,
      softmax: SoftmaxObjective, grp: Int, iter: Int,
      dropped: Array[(TreeShape, Double, Int)]): (Double, Double) = {
    withGrads(cache, globalGrads).mapPartitions { it =>
      val out = new Array[Double](2)
      val scratch = new Array[Double](2 * numGroups)
      var g = 0.0; var h = 0.0
      it.foreach { case (r, m, pre) =>
        if (gradBased) {
          gradOf(r, m, pre, obj, softmax, grp, dropped, out, scratch)
          val s = gradientSampleScale(r.rowId, iter, out(0), out(1))
          if (s > 0) { g += s * out(0); h += s * out(1) }
        } else if (sampled(r.rowId, iter)) {
          gradOf(r, m, pre, obj, softmax, grp, dropped, out, scratch)
          g += out(0); h += out(1)
        }
      }
      Iterator.single((g, h))
    }.treeReduce((a, b) => (a._1 + b._1, a._2 + b._2), depth = graft.Agg.depth(cache.getNumPartitions))
  }

  /** ONE pass building histograms for every node in `buildSet` — the analog
    * of `HistogramBuilder::BuildHist` + allreduce (`histogram.h:44-202`):
    * per-partition dense accumulation (allocation-free inner loop), then a
    * tree-wise partial+final merge — Spark's map-side combine IS the
    * reference's histogram allreduce. Hist layout per node: g at 2·bin,
    * h at 2·bin+1 in global bin space. */
  private def aggregateHistograms(
      cache: RDD[(BInst, Array[Double])],
      globalGrads: Option[RDD[Array[Double]]], cuts: HistogramCuts,
      obj: Objective, softmax: SoftmaxObjective, grp: Int, iter: Int,
      buildSet: Array[Int], shape: TreeShape,
      dropped: Array[(TreeShape, Double, Int)]): Array[Array[Double]] = {

    val sc = cache.sparkContext
    val bShape = sc.broadcast(shape)
    val histLen = 2 * cuts.totalBins
    val nBuild = buildSet.length
    val offsets = cuts.featureOffset
    val numFeatures = cuts.numFeatures
    // dense position→slot map (node ids are small ints)
    val maxNid = if (buildSet.isEmpty) 0 else buildSet.max
    val slotOf = Array.fill(maxNid + 1)(-1)
    buildSet.zipWithIndex.foreach { case (nid, s) => slotOf(nid) = s }

    val partials = withGrads(cache, globalGrads).mapPartitions { it =>
      val hists = new Array[Array[Double]](nBuild)
      val out = new Array[Double](2)
      val scratch = new Array[Double](2 * numGroups)
      val sh = bShape.value
      it.foreach { case (r, m, pre) =>
        if (gradBased || sampled(r.rowId, iter)) {
          val pos = sh.position(r)
          val slot = if (pos <= maxNid) slotOf(pos) else -1
          if (slot >= 0) {
            var hist = hists(slot)
            if (hist == null) { hist = new Array[Double](histLen); hists(slot) = hist }
            gradOf(r, m, pre, obj, softmax, grp, dropped, out, scratch)
            val sampleScale =
              if (gradBased) gradientSampleScale(r.rowId, iter, out(0), out(1)) else 1.0
            val g = sampleScale * out(0); val h = sampleScale * out(1)
            if (sampleScale > 0) {
            if (r.idx == null) {
              var f = 0
              while (f < numFeatures) {
                val b = r.bins(f)
                if (b >= 0) {
                  val gb = 2 * (offsets(f) + b)
                  hist(gb) += g
                  hist(gb + 1) += h
                }
                f += 1
              }
            } else {
              // sparse row: O(nnz) accumulation over present features only;
              // absent mass reaches the split search as (total − Σ bins),
              // i.e. the same missing-direction machinery as NaN
              var k = 0
              while (k < r.idx.length) {
                val b = r.bins(k)
                if (b >= 0) {
                  val gb = 2 * (offsets(r.idx(k)) + b)
                  hist(gb) += g
                  hist(gb + 1) += h
                }
                k += 1
              }
            }
            }
          }
        }
      }
      Iterator.single(hists)
    }
    val result = graft.Agg.reduce(partials)((a, b) => {
      var s = 0
      while (s < nBuild) {
        if (a(s) == null) a(s) = b(s)
        else if (b(s) != null) {
          val x = a(s); val y = b(s)
          var i = 0
          while (i < histLen) { x(i) += y(i); i += 1 }
        }
        s += 1
      }
      a
    })
    bShape.destroy()
    result.map(h => if (h == null) new Array[Double](histLen) else h)
  }
}

/** Nested per-tree/level/node Bernoulli feature sampling (ref
  * `src/common/random.h:70-80` ColumnSampler) — deterministic from seed.
  * With non-empty `featureWeights`, sampling is weighted without
  * replacement via Efraimidis–Spirakis keys u^(1/w) (the reference's
  * `WeightedSamplingWithoutReplacement`, `src/common/random.h:40-68`). */
final class ColumnSampler(numFeatures: Int, seed: Long,
    featureWeights: Array[Double] = Array.empty) extends Serializable {
  require(featureWeights.isEmpty || featureWeights.length == numFeatures,
    s"feature_weights length ${featureWeights.length} != numFeatures $numFeatures")
  require(featureWeights.forall(_ >= 0), "feature_weights must be non-negative")

  private def sample(from: Array[Int], frac: Double, salt: Long): Array[Int] = {
    if (frac >= 1.0 || from.length <= 1) return from
    val n = math.max(1, (from.length * frac).round.toInt)
    val rng = new java.util.Random(seed ^ salt)
    if (featureWeights.nonEmpty) {
      // key = u^(1/w); top-n keys = weighted sample without replacement
      val keyed = from.map { f =>
        val w = featureWeights(f)
        val key = if (w <= 0) -1.0 else math.pow(rng.nextDouble(), 1.0 / w)
        (f, key)
      }
      val picked = keyed.sortBy(-_._2).take(n).map(_._1)
      java.util.Arrays.sort(picked)
      return picked
    }
    val shuffled = from.clone()
    var i = shuffled.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val t = shuffled(i); shuffled(i) = shuffled(j); shuffled(j) = t
      i -= 1
    }
    java.util.Arrays.sort(shuffled, 0, n)
    shuffled.take(n)
  }
  def sampleTree(iter: Int, frac: Double): Array[Int] =
    sample((0 until numFeatures).toArray, frac, 0x51ED2701L * (iter + 1))
  def sampleLevel(treeCols: Array[Int], iter: Int, depth: Int, frac: Double): Array[Int] =
    sample(treeCols, frac, 0x7F4A7C15L * (iter + 1) + 31L * depth)
  def sampleNode(levelCols: Array[Int], iter: Int, depth: Int, nid: Int, frac: Double): Array[Int] =
    sample(levelCols, frac, 0xC2B2AE35L * (iter + 1) + 131L * depth + 7919L * nid)
}
