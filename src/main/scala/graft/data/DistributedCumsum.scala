package graft.data

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Scalable global running sums — the replacement for an unpartitioned
  * `Window.orderBy(...)` (which forces every row through ONE task and is the
  * classic 100 TB scale-killer in cumulative metrics like AUC and Cox
  * partial likelihood).
  *
  * Shape: range-repartition on the order key (parallel range sort, the same
  * machinery as a global `orderBy`), sort within partitions, then the
  * classic two-pass prefix scan — pass 1 collects ONE partial-sum row per
  * partition to the driver (numPartitions × numCols doubles, independent of
  * data size), pass 2 re-walks each partition adding its broadcast prefix
  * offset. Work and memory stay fully distributed; the driver holds only
  * per-partition scalars. Both passes share one shuffle (same lineage =
  * same shuffle files; the range bounds are sampled once per plan).
  *
  * The reference's equivalents are the sequential risk-set scans of
  * `src/objective/regression_obj.cu:604` and the sorted ROC sweep of
  * `src/metric/auc.cc:153`, which run single-node; this is their
  * partition-parallel form.
  *
  * Determinism: callers must pass an ordering key with UNIQUE values (e.g.
  * pre-aggregate to distinct keys first — which is also what gives
  * value-based RANGE semantics for ties). With duplicate keys the range
  * partitioner may split a tie group across partitions in sampling-
  * dependent order.
  */
object DistributedCumsum {

  /** Returns `df` with an extra inclusive running-sum column `cum_<c>` for
    * each c in `sumCols`, ordered by `orderCol` (unique values). */
  def cumsum(df: DataFrame, orderCol: String, descending: Boolean,
      sumCols: Seq[String]): DataFrame =
    cumsum(df, Seq(if (descending) col(orderCol).desc else col(orderCol).asc), sumCols)

  /** Composite-key variant: running sums under a lexicographic multi-column
    * order (each element carries its own asc/desc). Lets a per-group sweep
    * (e.g. per-class ROC) ride ONE global two-pass prefix scan — callers
    * recover within-group sums by subtracting the preceding groups' totals
    * — instead of one unpartitioned window per group. Key tuples must be
    * unique. */
  def cumsum(df: DataFrame, order: Seq[Column], sumCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    // The range exchange evaluates its child TWICE in one job: once for
    // the RangePartitioner's bound sampling (a reservoir pass over every
    // row) and once for the map-side shuffle write. When the input is the
    // tail of an expensive DAG (e.g. the full curation pipeline feeding
    // packSequences), that doubles the whole pipeline's cost — so the
    // input (projected to order + sum columns by the caller, hence small)
    // is persisted across those two reads and dropped right after pass 1.
    // The SORTED side stays unpersisted on purpose: the passes share the
    // range-exchange's shuffle files, so pass 2 re-reads the
    // (distinct-key-sized) shuffle output, not the upstream plan. Caching
    // the converted Row objects instead was measured strictly slower than
    // the shuffle re-read at every tested size.
    val prepared = df.withColumns(
      sumCols.map(c => c -> col(c).cast("double")).toMap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = prepared.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val idxs = sumCols.map(schema.fieldIndex).toArray
    val k = idxs.length
    val rdd = sorted.rdd
    val nParts = rdd.getNumPartitions

    // pass 1: per-partition totals (tiny collect: nParts × k doubles).
    // unpersist in finally: a failed pass-1 job must not leave the cache
    // entry registered for the session's lifetime (cumsum is called per
    // metric evaluation). On success, the shuffle files exist by now and
    // pass 2 reads those, never `prepared`.
    val totals = new Array[Array[Double]](nParts)
    try {
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val s = new Array[Double](k)
        it.foreach { r =>
          var i = 0
          while (i < k) { if (!r.isNullAt(idxs(i))) s(i) += r.getDouble(idxs(i)); i += 1 }
        }
        Iterator.single((pid, s))
      }.collect().foreach { case (pid, s) => totals(pid) = s }
    } finally prepared.unpersist(blocking = false)

    // exclusive prefix offsets per partition
    val offsets = new Array[Array[Double]](nParts)
    val run = new Array[Double](k)
    var p = 0
    while (p < nParts) {
      offsets(p) = run.clone()
      var i = 0
      while (i < k) { run(i) += totals(p)(i); i += 1 }
      p += 1
    }
    val bOff = spark.sparkContext.broadcast(offsets)

    // pass 2: emit rows with running sums (offset + within-partition scan)
    val outSchema = StructType(schema.fields ++
      sumCols.map(c => StructField(s"cum_$c", DoubleType, nullable = false)))
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bOff.value(pid).clone()
      it.map { r =>
        var i = 0
        while (i < k) { if (!r.isNullAt(idxs(i))) acc(i) += r.getDouble(idxs(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
