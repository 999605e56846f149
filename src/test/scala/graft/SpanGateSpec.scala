package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** The repeated-SPAN gate tier: inline boilerplate (share bars, cookie
  * sentences) recurring across days inside otherwise-novel paragraphs —
  * invisible to the document-granularity tiers and to the paragraph
  * tier (which needs an exact '\n'-span match). spanKeys projects the
  * snapshot's hot n-grams to md5 keys under the standard
  * stamp/retain/bucket lifecycle; stripSeenSpans cuts every batch
  * occurrence (the canonical copies shipped with the snapshot's days). */
class SpanGateSpec extends AnyFunSuite {
  import TestSpark._

  private val bar = "share this page on social media"

  test("stripSeenSpans cuts snapshot-hot spans, keeps novel text; retention re-admits") {
    import spark.implicits._
    val day1 = Seq(
      (1L, s"alpha beta gamma $bar"),
      (2L, s"delta epsilon zeta $bar"),
      (3L, s"eta theta iota $bar")).toDF("doc_id", "text")
    val keys = Dedup.spanKeys(day1, n = 3, minDocs = 3)
    assert(keys.columns.toSeq == Seq("_key"))
    // the share bar has 4 hot 3-grams (6 tokens); doc bodies are unique;
    // +1 for the n-marker sentinel row (the n-mismatch guard)
    assert(keys.count() == 5L)
    assert(keys.where(col("_key") === Dedup.spanSentinelKey(3)).count() == 1L)
    val day2 = Seq(
      (10L, s"totally novel words here $bar"),
      (11L, "no boilerplate at all present")).toDF("doc_id", "text")
    val out = Dedup.stripSeenSpans(day2, keys, n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 10: the 6 bar tokens are covered (every bar 3-gram is hot);
    // the seam 3-grams ("here share this" etc.) are not in the snapshot
    assert(out(0) == ((10L, 10, 6, "totally novel words here")), out(0).toString)
    assert(out(1) == ((11L, 5, 0, "no boilerplate at all present")), out(1).toString)
    // one-knob retention: aged-out span keys stop cutting
    val aged = Dedup.stripSeenSpans(day2,
        Dedup.retainGenerations(Dedup.stampGeneration(keys, 0L), 1L), n = 3)
      .agg(sum("n_removed")).as[Long].collect().head
    assert(aged == 0L)
    // shape guard
    intercept[IllegalArgumentException] {
      Dedup.stripSeenSpans(day2, day1)
    }
    // n-mismatch loud-reject: a snapshot built at n=3 consumed at n=4
    // (or a pre-sentinel bare-key table) throws instead of silently
    // cutting nothing; an EMPTY snapshot (aged-out/day-0) stays legal
    intercept[IllegalArgumentException] {
      Dedup.stripSeenSpans(day2, keys, n = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.stripSeenSpans(day2,
        keys.where(col("_key") =!= Dedup.spanSentinelKey(3)), n = 3)
    }
    assert(Dedup.stripSeenSpans(day2, keys.where(lit(false)), n = 4)
      .count() == 2L)
    // n = 1 rejected (r19): a single-token marker is itself forgeable
    // by a document containing the literal sentinel token, so the
    // tier requires n >= 2 where the exactly-n-minus-one-spaces
    // argument makes the sentinel airtight
    intercept[IllegalArgumentException] { Dedup.spanKeys(day1, n = 1) }
    intercept[IllegalArgumentException] {
      Dedup.stripSeenSpans(day2, keys, n = 1)
    }
  }

  test("stripSeenSpans plan is window-free (no per-ngram sort task)") {
    import spark.implicits._
    val day1 = Seq((1L, s"a b c $bar"), (2L, s"d e f $bar"),
      (3L, s"g h i $bar")).toDF("doc_id", "text")
    val day2 = Seq((10L, s"x y z $bar")).toDF("doc_id", "text")
    val plan = Dedup.stripSeenSpans(day2, Dedup.spanKeys(day1, n = 3, minDocs = 3),
      n = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-key window leaked into the span strip:\n" + plan)
  }
}
