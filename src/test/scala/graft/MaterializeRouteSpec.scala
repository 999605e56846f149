package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Route selection of [[graft.ext.Dedup.materializeOnce]] (r20, verdict #8):
  * the default localCheckpoint route truncates lineage, so a lost executor
  * block fails the query — hazardous exactly where executors are lost as a
  * matter of course (dynamic allocation). Pins the conf-derived default
  * through the pure [[graft.ext.Dedup.materializeRoute]] seam (Spark 4
  * forbids runtime modification of the core dynamic-allocation conf, so the
  * profile input cannot be toggled on a live session), and pins the two
  * storage behaviors through the runtime-settable explicit knob. */
class MaterializeRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("route default: static resources -> localCheckpoint; dynamicAllocation -> persist; explicit always wins") {
    assert(Dedup.materializeRoute(None, dynamicAllocation = false)
      == "localCheckpoint")
    assert(Dedup.materializeRoute(None, dynamicAllocation = true)
      == "persist")
    assert(Dedup.materializeRoute(Some("localCheckpoint"),
      dynamicAllocation = true) == "localCheckpoint")
    assert(Dedup.materializeRoute(Some("persist"),
      dynamicAllocation = false) == "persist")
  }

  test("persist route registers MEMORY_AND_DISK; localCheckpoint route truncates lineage with no cache entry") {
    import spark.implicits._
    def materialized(): org.apache.spark.sql.DataFrame =
      Dedup.materializeOnce(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val key = "spark.graft.routeMaterialize"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "persist")
      val p = materialized()
      assert(p.storageLevel == StorageLevel.MEMORY_AND_DISK)
      assert(p.count() == 2)
      p.unpersist(blocking = true)
      spark.conf.set(key, "localCheckpoint")
      val c = materialized()
      assert(c.storageLevel == StorageLevel.NONE) // no CacheManager entry
      assert(c.count() == 2)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
