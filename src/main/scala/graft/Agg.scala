package graft

import org.apache.spark.rdd.RDD

import scala.reflect.ClassTag

/** Adaptive aggregation: the reference's histogram allreduce is a binomial
  * tree over workers (`src/collective/allreduce.h:27`); Spark's
  * `treeAggregate(depth=2)` is the same shape but costs an EXTRA shuffle
  * stage per call. That stage only pays for itself when there are enough
  * partials that a single reducer would fan in too much data (thousands of
  * executors × multi-MB histograms). Under the cutoff the partials go
  * straight to the driver in one stage — at 32 partitions × ~100 KB that is
  * noise, and the per-iteration boosting loop calls this dozens of times, so
  * the saved stages dominate. Above it, the 2-level tree caps driver fan-in
  * at √P merges, which is the 1000-executor design point.
  */
object Agg {
  /** Partition-count cutoff below which partials reduce directly at the
    * driver. 64 × the largest per-level payload (~a few MB) is well under
    * driver capacity; beyond that the tree level starts paying. */
  val directCutoff = 64

  def depth(numPartitions: Int): Int = if (numPartitions <= directCutoff) 1 else 2

  def aggregate[T, U: ClassTag](rdd: RDD[T])(zero: U)(
      seqOp: (U, T) => U, combOp: (U, U) => U): U =
    rdd.treeAggregate(zero)(seqOp, combOp, depth(rdd.getNumPartitions))

  def reduce[T: ClassTag](rdd: RDD[T])(f: (T, T) => T): T =
    rdd.treeReduce(f, depth(rdd.getNumPartitions))
}
