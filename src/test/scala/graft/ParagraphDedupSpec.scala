package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

class ParagraphDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("paragraphDedup removes every occurrence of corpus-duplicated paragraphs") {
    import spark.implicits._
    val boiler = "Subscribe to our newsletter!"
    val docs = Seq(
      (1L, Seq(boiler, "unique one", "tail one").mkString("\n")),
      (2L, Seq(boiler, "unique two", "tail two").mkString("\n")),
      (3L, Seq("solo paragraph", boiler, "solo tail").mkString("\n"))
    ).toDF("doc_id", "text")
    val byId = Dedup.paragraphDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_paras") == 3L)
    assert(byId(1L).getAs[Long]("n_dup_paras") == 1L)
    assert(byId(1L).getAs[String]("clean_text") == "unique one\ntail one")
    assert(byId(3L).getAs[String]("clean_text") == "solo paragraph\nsolo tail")
  }

  test("paragraphDedup: within-doc repeats count toward minCount; blanks always survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("echo", "", "echo", "keeper").mkString("\n")),
      (2L, Seq("", "", "alone").mkString("\n")) // blanks never dup-flagged
    ).toDF("doc_id", "text")
    val byId = Dedup.paragraphDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // "echo" occupies 2 slots in doc 1 -> duplicated -> both removed
    assert(byId(1L).getAs[Long]("n_dup_paras") == 2L)
    assert(byId(1L).getAs[String]("clean_text") == "\nkeeper")
    assert(byId(2L).getAs[Long]("n_dup_paras") == 0L)
    assert(byId(2L).getAs[String]("clean_text") == "\n\nalone")
  }

  test("paragraphDedup empties a doc made entirely of boilerplate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b1\nb2"), (2L, "b1\nb2")
    ).toDF("doc_id", "text")
    val byId = Dedup.paragraphDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("clean_text") == "")
    assert(byId(1L).getAs[Long]("n_dup_paras") == 2L)
  }

  test("paragraphDedup count pass shuffles hashes, not paragraph text") {
    import spark.implicits._
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = Dedup.paragraphDedup(docs, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    // the dup-set aggregate must ride on the 60-bit hash column only:
    // a partial_count over ph with no 'para' in the aggregate keys
    assert(plan.contains("ph"), plan)
  }
}
