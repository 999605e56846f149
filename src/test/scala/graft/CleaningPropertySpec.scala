package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.{Cleaning, Curation, UrlOps}

/** Property-based invariants for the cleaning surface. Driver-side
  * generation, one Spark evaluation per property batch (rows generated
  * into a single DataFrame — not one job per case). */
class CleaningPropertySpec extends AnyFunSuite {
  import TestSpark._

  /** 500 cases with a PINNED initial seed: the r10 fixText idempotence
    * bug survived multiple rounds of this suite at 30 unpinned cases —
    * the counterexample class (control char between base letter and
    * combining mark) needs three specific generator picks to collide, so
    * a 30-case run found it only on seed luck. 500 pinned cases make the
    * run deterministic AND dense enough to cover the hazard classes; the
    * known r10 counterexample is additionally a fixed unit test below. */
  private def check(p: Prop, cases: Int = 500): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(org.scalacheck.rng.Seed(20261231L)), p)
    assert(r.passed, r.status.toString)
  }

  test("fixText regression: control char between base and combining mark (r10)") {
    import spark.implicits._
    // "O" + BEL + U+0301: stripping the BEL makes the combining acute
    // newly adjacent to the O. NFC-FIRST left the pair uncomposed, so a
    // second fixText pass composed it to Ó and the output changed —
    // the exact r10 counterexample. NFC-LAST composes in pass one.
    val rows = Seq("O\u0007\u0301k", "e\u007F\u0301", "A\u0001\u0308B end")
      .toDF("t")
      .select(Cleaning.fixText(col("t")).as("once"))
      .select(col("once"), Cleaning.fixText(col("once")).as("twice"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"fixText not idempotent on ${r.getString(0)}"))
    // and pass one must actually compose: pre-r11 code fails HERE even
    // when the idempotence assert above is not reached
    assert(rows.exists(_.getString(0).contains("\u00D3k")),
      "O+BEL+combining-acute must compose to U+00D3 in one pass")
  }

  // printable-ish text with the hazards the operators care about
  private val textGen: Gen[String] = Gen.listOfN(60,
    Gen.frequency(
      (20, Gen.alphaNumChar),
      (6, Gen.const(' ')),
      (2, Gen.oneOf('.', '!', '?', '\n', '\t', '"')),
      (1, Gen.oneOf('{', '@', '-', '&', '<', '>', '\u0301', '\u0007'))))
    .map(_.mkString)

  test("fixText is idempotent") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(Cleaning.fixText(col("t")).as("once"))
        .select(col("once"), Cleaning.fixText(col("once")).as("twice"))
      df.collect().forall(r => r.getString(0) == r.getString(1))
    })
  }

  test("redactText is idempotent and leaves no raw emails/phones/IPs") {
    import spark.implicits._
    val piiGen = Gen.oneOf(
      "write a.b@c.io now", "call 555-123-4567 ok", "host 10.0.0.1 up",
      "nothing here", "double x@y.zz and 1.2.3.4 mix")
    check(Prop.forAll(Gen.listOfN(6, piiGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(Cleaning.redactText(col("t")).as("once"))
        .select(col("once"), Cleaning.redactText(col("once")).as("twice"))
      df.collect().forall { r =>
        r.getString(0) == r.getString(1) && !r.getString(0).contains("@")
      }
    })
  }

  test("c4Clean is idempotent on kept pages") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val first = Cleaning.c4Clean(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
        .where(col("page_keep") === 1)
        .select(col("doc_id"), col("clean_text").as("text"))
      val again = Cleaning.c4Clean(first).collect()
      // a kept page is made of kept lines only and carries no page
      // hazards, so a second pass keeps every line and the whole page
      again.forall { r =>
        r.getAs[Int]("page_keep") == 1 &&
          r.getAs[Int]("n_kept") == r.getAs[Int]("n_lines")
      }
    })
  }

  test("URL normalize is idempotent") {
    import spark.implicits._
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "Ftp")
      host <- Gen.oneOf("WWW.Ex.COM", "sub.site.org:8080", "X.io")
      path <- Gen.oneOf("/A/b", "", "/p")
      q <- Gen.oneOf("", "?utm_source=a", "?id=1&utm_campaign=b&keep=2", "?gclid=z")
      frag <- Gen.oneOf("", "#f", "#a=b")
    } yield s"$scheme://$host$path$q$frag"
    check(Prop.forAll(Gen.listOfN(8, urlGen)) { urls =>
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "u")
        .select(UrlOps.normalize(col("u")).as("once"))
        .select(col("once"), UrlOps.normalize(col("once")).as("twice"))
      df.collect().forall(r => r.getString(0) == r.getString(1))
    }, cases = 100)
  }

  test("chunkTokens with stride == chunkSize partitions the tokens exactly") {
    import spark.implicits._
    val docGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(4))))
    check(Prop.forAll(Gen.listOfN(4, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val rebuilt = Curation.chunkTokens(df, "doc_id", "text", 7, 7)
        .groupBy("doc_id")
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
            x => x.getField("chunk_text")), " ").as("r"),
          sum("n_chunk_tokens").as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      docs.zipWithIndex.forall { case (ws, i) =>
        val (r, n) = rebuilt(i.toLong)
        r == ws.mkString(" ") && n == ws.length.toLong
      }
    }, cases = 100)
  }
}
