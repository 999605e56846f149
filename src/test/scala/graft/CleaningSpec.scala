package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.Cleaning

class CleaningSpec extends AnyFunSuite {
  import TestSpark._

  private def page(lines: String*): String = lines.mkString("\n")

  test("c4Clean keeps only terminal-punctuated lines with >= 5 words and no javascript") {
    import spark.implicits._
    val docs = Seq(
      (1L, page(
        "This line has plenty of words and ends right.",
        "no terminal punctuation so this line is dropped",
        "Short line.",
        "Please enable JavaScript to continue browsing now.",
        "Another perfectly fine sentence sits right here!",
        "A third keeper closes out the healthy page?"))
    ).toDF("doc_id", "text")
    val r = Cleaning.c4Clean(docs).collect().head
    assert(r.getAs[Int]("n_lines") == 6)
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[Int]("page_keep") == 1)
    assert(r.getAs[String]("clean_text") == page(
      "This line has plenty of words and ends right.",
      "Another perfectly fine sentence sits right here!",
      "A third keeper closes out the healthy page?"))
  }

  test("c4Clean page-level rules: < 3 kept lines, curly brace, lorem ipsum") {
    import spark.implicits._
    val good = page(
      "First healthy sentence with enough words here.",
      "Second healthy sentence with enough words too.",
      "Third healthy sentence with enough words also.")
    val docs = Seq(
      (1L, good),
      (2L, good.replaceFirst("First", "{ First")),                 // brace kills page
      (3L, good + "\nWe left some lorem ipsum placeholder inside."), // phrase kills page
      (4L, page(
        "Only one healthy sentence with enough words.",
        "Second healthy sentence with enough words too."))          // only 2 kept
    ).toDF("doc_id", "text")
    val byId = Cleaning.c4Clean(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("page_keep") == 1)
    assert(byId(1L).getAs[String]("clean_text") == good)
    assert(byId(2L).getAs[Int]("page_keep") == 0)
    assert(byId(2L).getAs[String]("clean_text") == "")
    assert(byId(3L).getAs[Int]("page_keep") == 0)
    assert(byId(4L).getAs[Int]("page_keep") == 0)
    assert(byId(4L).getAs[Int]("n_kept") == 2)
  }

  test("c4Clean accepts closing-quote lines and counts words on single spaces") {
    import spark.implicits._
    val docs = Seq(
      (1L, page(
        "\"A quoted sentence still counts as prose.\"",
        "one two three four five.",   // exactly 5 words -> kept
        "one two three four.",        // 4 words -> dropped
        "Filler sentence to reach the page threshold here."))
    ).toDF("doc_id", "text")
    val r = Cleaning.c4Clean(docs).collect().head
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[Int]("page_keep") == 1)
  }

  test("c4Clean: CRLF pages and trailing-space lines are judged on trimmed bytes (r13 review)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // pre-fix, the raw last char of every line was '\r' → zero kept
    // lines → the whole CRLF page was silently dropped
    val crlf = "One good sentence with enough words here.\r\n" +
      "Another proper sentence with enough words too.\r\n" +
      "And a third fine sentence with many words inside.\r"
    val trailing = "A solid sentence with plenty of words present. \n" +
      "Another sentence carrying sufficient words to pass. \n" +
      "Third sentence also has the needed word count."
    val rows = Cleaning.c4Clean(
        Seq((1L, crlf), (2L, trailing)).toDF("doc_id", "text"))
      .select("doc_id", "n_kept", "page_keep").collect()
    rows.foreach { r =>
      assert(r.getInt(1) == 3,
        s"doc ${r.getLong(0)}: all 3 lines must be kept, got ${r.getInt(1)}")
      assert(r.getInt(2) == 1, s"doc ${r.getLong(0)}: page must survive")
    }
  }

  test("stripHtml removes uppercase/mixed-case script and style blocks (r13 review)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val html = "<SCRIPT>var secret = 1;</SCRIPT><Style>h1 { top: 0 }</Style>" +
      "<p>Visible text stays.</p>"
    val got = Seq(Tuple1(html)).toDF("h")
      .select(graft.ext.Cleaning.stripHtml(col("h")).as("s"))
      .as[String].head()
    assert(got == "Visible text stays.", s"got: '$got'")
    assert(!got.contains("secret") && !got.contains("top"))
  }

  test("blockedWordFilter: whole-token case-insensitive page flag") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a clean page of text"),
      (2L, "this page says BadWord twice BADWORD here"),
      (3L, "badwords is not the listed token"),   // substring must NOT match
      (4L, "edge badword")
    ).toDF("doc_id", "text")
    val m = Cleaning.blockedWordFilter(docs, Seq("badword"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Int]("n_blocked") == 0 && m(1L).getAs[Int]("word_keep") == 1)
    assert(m(2L).getAs[Int]("n_blocked") == 2 && m(2L).getAs[Int]("word_keep") == 0)
    assert(m(3L).getAs[Int]("word_keep") == 1,
      "whole-token match only — substrings must not trigger the filter")
    assert(m(4L).getAs[Int]("word_keep") == 0)
    intercept[IllegalArgumentException] {
      Cleaning.blockedWordFilter(docs, Seq.empty)
    }
  }

  test("blockedWordFilter: multi-word entries match token-boundary phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a page that mentions the Bad Phrase right here"),
      (2L, "nonbad phrases and embedded notbad phrase stay clean"),
      (3L, "bad phrase starts and it ends with bad phrase"),
      (4L, "the word bad alone and phrase alone do not match")
    ).toDF("doc_id", "text")
    val m = Cleaning.blockedWordFilter(docs, Seq("bad phrase"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Int]("n_blocked") == 1 && m(1L).getAs[Int]("word_keep") == 0)
    assert(m(2L).getAs[Int]("word_keep") == 1,
      "substrings across token boundaries must not match")
    assert(m(3L).getAs[Int]("n_blocked") == 2, "both occurrences count")
    assert(m(4L).getAs[Int]("word_keep") == 1,
      "the phrase's words alone must not match")
    // mixed lists combine token and phrase hits
    val mixed = Cleaning.blockedWordFilter(
        Seq((1L, "standalone badword plus the bad phrase too")).toDF("doc_id", "text"),
        Seq("badword", "bad phrase"))
      .head()
    assert(mixed.getAs[Int]("n_blocked") == 2)
    intercept[IllegalArgumentException] {
      Cleaning.blockedWordFilter(docs, Seq("  "))
    }
  }

  test("redactPii replaces emails, phones and IPv4s and counts matches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Mail a.user+tag@sub.example.org or b@x.io, call 555-123-4567 " +
        "or 555.987.6543, server 192.168.0.1 logs all of it."),
      (2L, "No pii here at all, just version 1.2 and section 3.")
    ).toDF("doc_id", "text")
    val byId = Cleaning.redactPii(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("n_emails") == 2)
    assert(byId(1L).getAs[Int]("n_phones") == 2)
    assert(byId(1L).getAs[Int]("n_ips") == 1)
    assert(byId(1L).getAs[String]("redacted") ==
      "Mail [EMAIL] or [EMAIL], call [PHONE] or [PHONE], server [IP] logs all of it.")
    assert(byId(2L).getAs[Int]("n_emails") == 0)
    assert(byId(2L).getAs[Int]("n_phones") == 0)
    assert(byId(2L).getAs[Int]("n_ips") == 0)
    assert(byId(2L).getAs[String]("redacted") == docs.collect()
      .find(_.getLong(0) == 2L).get.getString(1))
  }

  test("fixText: NFC-composes accents, strips controls, collapses whitespace, trims") {
    import spark.implicits._
    val raw = " Cafe\u0301  du\t\tMarche\u0301 end\u0007bell \u001b"
    val out = Seq((1L, raw)).toDF("doc_id", "text")
      .select(Cleaning.fixText(col("text")).as("fixed"))
      .collect().head.getString(0)
    assert(out == "Caf\u00e9 du March\u00e9 endbell")
    // already-normalized text passes through unchanged (fast path)
    val clean = "plain ascii stays put"
    val out2 = Seq((1L, clean)).toDF("doc_id", "text")
      .select(Cleaning.fixText(col("text")).as("fixed"))
      .collect().head.getString(0)
    assert(out2 == clean)
  }

  test("nfc expression is codegen-compatible and null-safe") {
    import spark.implicits._
    val df = Seq((1L, "é"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), Cleaning.nfc(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "é")
    assert(rows(1).isNullAt(1))
    // LocalTableScan folds constant projections driver-side; range()
    // produces a genuine codegen stage to host the expression
    val plan = spark.range(2)
      .select(Cleaning.nfc(concat(lit("é"), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in the plan dump
    assert(plan.contains("*(1) Project"), plan)
  }

  test("stripHtml: blocks and tags go, entities decode AFTER tag-strip") {
    import spark.implicits._
    val html = "<html><head><style>h1 { x }</style><!-- c --></head>" +
      "<body><h1>Hi</h1><p>A &amp; B &lt;em&gt; ok.</p>" +
      "<script>if (1 < 2) alert('x');</script>done</body></html>"
    val out = Seq((1L, html)).toDF("doc_id", "text")
      .select(Cleaning.stripHtml(col("text")).as("s"))
      .collect().head.getString(0)
    assert(out == "Hi A & B <em> ok. done")
  }

  test("sentences: terminal-punctuation runs, trailing fragment dropped") {
    import spark.implicits._
    val out = Seq((1L, "One here. Two there! Three? tail no end"))
      .toDF("doc_id", "text")
      .select(Cleaning.sentences(col("text")).as("s"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("One here.", "Two there!", "Three?"))
  }

  test("cleanCorpus composition: boilerplate paragraphs vanish, unique prose survives") {
    import spark.implicits._
    val boiler = "Subscribe to this newsletter for more details."
    def doc(unique: String) = page(
      boiler,
      unique,
      "Contact us at help@example.com for assistance today.",
      "A third filler sentence keeps the page alive.")
    val docs = Seq(
      (1L, doc("Document one carries its own special sentence.")),
      (2L, doc("Document two has a different unique sentence.")),
      (3L, doc("Document three closes with its own words."))
    ).toDF("doc_id", "text")
    val out = Cleaning.cleanCorpus(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // boiler + redacted contact + filler are corpus-wide dups; only the
    // unique line survives, with the email already redacted before dedup
    assert(out(1L).getAs[String]("text") ==
      "Document one carries its own special sentence.")
    assert(out(2L).getAs[Long]("n_dup_paras") == 3L)
    assert(out.values.forall(!_.getAs[String]("text").contains("@")))
  }

  test("null text rows: c4Clean drops the page, redactPii passes null through") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a.\nb.\nc. d e f g."))
      .toDF("doc_id", "text")
    val c4 = Cleaning.c4Clean(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(c4(1L).getAs[Int]("page_keep") == 0)
    assert(c4(1L).getAs[String]("clean_text") == "")
    val pii = Cleaning.redactPii(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(pii(1L).isNullAt(pii(1L).fieldIndex("redacted")))
    val span = graft.ext.Dedup.removeRepeatedSpans(docs, "text", "doc_id", 3, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(span.contains(1L) && span.contains(2L))
  }

  test("attritionReport: first-fail charging, null predicate drops, conservation laws") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, Some("en"), 10),  // passes all
      (2L, Some("en"), 2),   // fails min_len
      (3L, Some("de"), 9),   // fails lang_en
      (4L, None, 9),         // null lang: charged to lang_en (null = fail)
      (5L, Some("en"), 1))   // fails min_len (charged there, NOT lang)
      .toDF("doc_id", "lang", "n")
    val rep = Cleaning.attritionReport(docs, Seq(
        "min_len" -> (col("n") >= 5),
        "lang_en" -> (col("lang") === "en")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rep.toSeq == Seq(
      (0, "min_len", 5L, 3L, 2L),
      (1, "lang_en", 3L, 1L, 2L)), rep.toSeq)
    // conservation: n_in(k+1) == n_kept(k); totals add up
    assert(rep(1)._3 == rep(0)._4)
    assert(rep.map(_._5).sum + rep.last._4 == 5L)
    intercept[IllegalArgumentException] {
      Cleaning.attritionReport(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Cleaning.attritionReport(docs,
        Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("cleaning plans are map-only: no exchange, single split per scan") {
    import spark.implicits._
    val docs = Seq((1L, "a.\nb.")).toDF("doc_id", "text")
    val planC4 = Cleaning.c4Clean(docs).queryExecution.executedPlan.toString
    val planPii = Cleaning.redactPii(docs).queryExecution.executedPlan.toString
    assert(!planC4.toLowerCase.contains("exchange"))
    assert(!planPii.toLowerCase.contains("exchange"))
    // the line-split runs once, staged as an attribute (no re-inlining
    // of split() into every consumer — the CorpusFilters._toks lesson)
    val splits = "split\\(".r.findAllIn(planC4).length
    assert(splits <= 3, s"expected staged line split, got $splits split() sites:\n$planC4")
  }
}
