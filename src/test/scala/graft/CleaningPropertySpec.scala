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

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
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
    })
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
    })
  }
}
