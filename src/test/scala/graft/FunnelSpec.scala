package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

class FunnelSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel: strictly-after ordering, dropouts null, min per stage") {
    import spark.implicits._
    val e = Seq(
      // user 1 completes in order: a@10, b@20, c@30
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2: b BEFORE a -> the b@5 does not count; b@25 does; no c
      (2L, 5L, "b"), (2L, 15L, "a"), (2L, 25L, "b"),
      // user 3: a only
      (3L, 7L, "a"),
      // user 4: never does a -> not in the funnel at all
      (4L, 1L, "b"), (4L, 2L, "c"),
      // user 5: a@10, c@20 but b missing -> stage 3 must NOT fire
      (5L, 10L, "a"), (5L, 20L, "c"),
      // user 6: same-ts a and b -> strict > excludes the b; later b@40 counts
      (6L, 30L, "a"), (6L, 30L, "b"), (6L, 40L, "b"), (6L, 50L, "c")
    ).toDF("user_id", "ts", "event_type")
    val f = graft.queries.EventQueries.funnel(e, "user_id", "ts", "event_type",
      Seq("a", "b", "c")).orderBy("user_id").collect()
    val byId = f.map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 5L, 6L))
    assert(byId(1L).getLong(1) == 10L && byId(1L).getLong(2) == 20L &&
      byId(1L).getLong(3) == 30L)
    assert(byId(2L).getLong(2) == 25L && byId(2L).isNullAt(3))
    assert(byId(3L).isNullAt(2) && byId(3L).isNullAt(3))
    assert(byId(5L).isNullAt(2) && byId(5L).isNullAt(3), "c without b must not count")
    assert(byId(6L).getLong(2) == 40L && byId(6L).getLong(3) == 50L)
  }

  test("funnel: one 10^6-event bot user folds in O(K) state (no per-user buffer)") {
    // the r12 sorted-iterator fold must not materialize the user's event
    // list; this passes trivially post-fix and OOM-shapes under the old
    // per-user collect_list at cluster-scale event counts
    val bot = spark.range(1000000L).select(
      lit(7L).as("user_id"),
      (col("id") * 1000L).as("ts"),
      element_at(
        array(lit("a"), lit("b"), lit("c"), lit("x")),
        (col("id") % 4 + 1).cast("int")).as("event_type"))
    val f = graft.queries.EventQueries.funnel(bot, "user_id", "ts",
      "event_type", Seq("a", "b", "c")).collect()
    // id 0 -> a@0, id 1 -> b@1000, id 2 -> c@2000: greedy min times
    assert(f.length == 1)
    assert(f.head.getLong(0) == 7L && f.head.getLong(1) == 0L &&
      f.head.getLong(2) == 1000L && f.head.getLong(3) == 2000L)
  }

  test("funnel: null timestamps are dropped, not NPEs (ADVICE r12)") {
    import spark.implicits._
    val e = Seq(
      (1L, Some(10L), "a"), (1L, None, "b"), (1L, Some(20L), "b"),
      (2L, None, "a") // user 2's ONLY stage event has a null ts
    ).toDF("user_id", "ts", "event_type")
    val f = graft.queries.EventQueries.funnel(e, "user_id", "ts",
      "event_type", Seq("a", "b")).collect()
    assert(f.length == 1, s"null-ts-only user must drop out: ${f.toSeq}")
    assert(f.head.getLong(0) == 1L && f.head.getLong(1) == 10L &&
      f.head.getLong(2) == 20L)
  }

  test("funnel: non-scalar user key is rejected up front (ADVICE r12)") {
    import spark.implicits._
    val e = Seq((Array[Byte](1), 10L, "a"))
      .toDF("user_id", "ts", "event_type")
    val ex = intercept[IllegalArgumentException] {
      graft.queries.EventQueries.funnel(e, "user_id", "ts", "event_type",
        Seq("a"))
    }
    assert(ex.getMessage.contains("scalar"))
  }

  test("funnel: fractional user keys are rejected (IEEE ±0.0/NaN group boundaries are ill-defined)") {
    import spark.implicits._
    // a NaN-keyed user would emit one output row per EVENT (boxed NaN
    // compares unequal to itself in the fold) while Spark's own grouping
    // treats NaN as one key — reject rather than silently diverge
    val e = Seq((1.5d, 10L, "a")).toDF("user_id", "ts", "event_type")
    val ex = intercept[IllegalArgumentException] {
      graft.queries.EventQueries.funnel(e, "user_id", "ts", "event_type",
        Seq("a"))
    }
    assert(ex.getMessage.contains("discrete"), ex.getMessage)
    // discrete scalars still pass: string and decimal keys work
    val es = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 5L, "a"))
      .toDF("user_id", "ts", "event_type")
    val fs = graft.queries.EventQueries.funnel(es, "user_id", "ts",
      "event_type", Seq("a", "b")).collect()
    assert(fs.length == 2, fs.toSeq)
    val ed = es.withColumn("user_id", col("user_id").substr(2, 1).cast("decimal(10,0)"))
    val fd = graft.queries.EventQueries.funnel(ed, "user_id", "ts",
      "event_type", Seq("a", "b")).collect()
    assert(fd.length == 2, fd.toSeq)
  }

  /** In-memory reference: t1 = min stage-1 ts; t_i = min stage-i ts > t_{i-1}. */
  private def refFunnel(events: Seq[(Long, Long, String)],
      stages: Seq[String]): Map[Long, Seq[Option[Long]]] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = stages.foldLeft(Seq.empty[Option[Long]]) { (acc, stage) =>
        val prev = acc.lastOption.flatten
        val cand = evs.filter(e => e._3 == stage &&
          (acc.isEmpty || (prev.nonEmpty && e._2 > prev.get))).map(_._2)
        acc :+ (if ((acc.isEmpty || prev.nonEmpty) && cand.nonEmpty)
          Some(cand.min) else None)
      }
      if (ts.head.nonEmpty) Some(u -> ts) else None
    }

  test("funnel matches the min-after reference on seeded random event multisets") {
    import spark.implicits._
    val stages = Seq("a", "b", "c")
    for (seed <- Seq(1, 7, 42)) {
      val rng = new scala.util.Random(seed)
      val events = (0 until 600).map { _ =>
        (rng.nextInt(25).toLong,                  // user
          rng.nextInt(40).toLong,                 // ts (collisions likely)
          Seq("a", "b", "c", "x")(rng.nextInt(4))) // stage or noise
      }
      val got = graft.queries.EventQueries.funnel(
          events.toDF("user_id", "ts", "event_type"), "user_id", "ts",
          "event_type", stages)
        .collect().map { r =>
          r.getLong(0) -> (1 to 3).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i)))
        }.toMap
      val want = refFunnel(events, stages)
      assert(got == want,
        s"seed $seed: ${got.toSeq.sortBy(_._1).take(5)} vs ${want.toSeq.sortBy(_._1).take(5)}")
    }
  }
}
