package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ext.{Curation, UrlOps}

class UrlOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("domain: lowercases, strips www. and port; registeredDomain keeps last two labels") {
    import spark.implicits._
    val rows = Seq(
      "HTTPS://WWW.News.Example.COM:8080/a/b?x=1",
      "http://sub.site.org/path",
      "not a url at all"
    ).toDF("url")
      .select(UrlOps.domain(col("url")).as("d"),
        UrlOps.registeredDomain(col("url")).as("rd"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == (("news.example.com", "example.com")))
    assert(rows(1) == (("sub.site.org", "site.org")))
    assert(rows(2) == (("", "")))
  }

  test("registeredDomain: PSL multi-part, wildcard, exception, punycode") {
    import spark.implicits._
    val rows = Seq(
      "https://shop.example.co.uk/x",      // multi-part suffix: 3 labels
      "https://deep.sub.example.co.uk/x",  // suffix buried deeper: still 3
      "https://co.uk/",                    // bare public suffix host
      "https://a.b.things.ck/x",           // *.ck wildcard: things.ck is a
                                           // suffix, so 3 labels
      "https://sub.www.ck/x",              // !www.ck exception: 2 labels
      "https://site.example.bd/x",         // *.bd wildcard
      "https://sub.xn--bcher-kva.de/x",    // punycode host, wire form kept
      "https://xn--p1ai.xn--80asehdb/x"    // all-IDN labels, 2-label rule
    ).toDF("url")
      .select(UrlOps.registeredDomain(col("url")).as("rd"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq(
      "example.co.uk", "example.co.uk", "co.uk",
      "b.things.ck", "www.ck", "site.example.bd",
      "xn--bcher-kva.de", "xn--p1ai.xn--80asehdb"), rows)
  }

  // registeredDomainSql's lock-step with registeredDomain is proven by the
  // oracle gate itself: p_url_normalize/p_domain_cap hash-match the DuckDB
  // replay of the same CASE over fixtures that hit every rule class
  // (multi-part, wildcard, exception, punycode).

  test("normalize: lowercases scheme+host only, strips fragment/tracking/dangling separators") {
    import spark.implicits._
    val rows = Seq(
      "HTTP://Example.COM/KeepCase?utm_source=a&id=7&utm_campaign=b#frag",
      "https://x.io/p?gclid=abc",
      "https://x.io/p?fbclid=1&keep=2"
    ).toDF("url").select(UrlOps.normalize(col("url")).as("n"))
      .collect().map(_.getString(0))
    assert(rows(0) == "http://example.com/KeepCase?id=7")
    assert(rows(1) == "https://x.io/p")
    assert(rows(2) == "https://x.io/p?keep=2")
  }

  test("capPerDomain keeps the cap smallest orderCol rows per domain") {
    import spark.implicits._
    val docs = (1L to 10L).map(i =>
      (i, s"https://${if (i % 2 == 0) "even" else "odd"}.com/$i"))
      .toDF("doc_id", "url")
    val kept = UrlOps.capPerDomain(docs, "url", "doc_id", cap = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 2L, 4L, 6L))
  }

  test("blocklistFilter drops blocked domains without a join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://spam.net/x"), (2L, "https://good.org/y")
    ).toDF("doc_id", "url")
    val kept = UrlOps.blocklistFilter(docs, "url", Seq("spam.net"))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
    val plan = UrlOps.blocklistFilter(docs, "url", Seq("spam.net"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("temperatureMix replicates low-resource strata with copy ids, deterministically") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, if (i <= 280) "big" else "small"))
      .toDF("doc_id", "lang")
    // alpha=0 splits the budget evenly: small (20 docs) gets rate
    // 150/20 = 7.5 -> 7 or 8 copies per doc; big gets 150/280 < 1
    val mixed = Curation.temperatureMix(docs, "lang", "doc_id",
      alpha = 0.0, targetFraction = 1.0)
    val small = mixed.where(col("lang") === "small")
    val copies = small.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(copies.forall(c => c == 7L || c == 8L), copies.toSeq.toString)
    // copy ids are dense 0..n-1 per doc
    val ids = small.where(col("doc_id") === 281L)
      .select("copy_id").as[Int].collect().sorted
    assert(ids.toSeq == (0 until ids.length))
    // reproducible across invocations
    val again = Curation.temperatureMix(docs, "lang", "doc_id", 0.0, 1.0)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val first = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("chunkTokens: stride windows cover every token; tails shorten; overlap correct") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a"))
      .toDF("doc_id", "text")
    val rows = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(rows.filter(_._1 == 2L).map(_._4).toSeq == Seq("a"))
  }

  test("holdoutByDomain: domain-consistent sides, salt re-rolls, bounds enforced") {
    import spark.implicits._
    val UrlOps = graft.ext.UrlOps
    // 40 domains × 5 pages; subdomains of one registered domain MUST
    // land on the same side (the leakage case the operator exists for)
    val docs = (0L until 200L).map { i =>
      val d = i % 40
      (i, s"https://sub${i % 5}.site$d.example-$d.com/page/$i")
    }.toDF("doc_id", "url")
    val split = UrlOps.holdoutByDomain(docs, "url", valPermille = 300,
      salt = "s1")
    val sides = split.groupBy("reg_domain")
      .agg(countDistinct("split").as("k"))
      .select("k").as[Long].collect()
    assert(sides.forall(_ == 1L), "every registered domain on exactly one side")
    // deterministic across calls; salt changes SOME assignments
    val v1 = split.where(col("split") === "val")
      .select("doc_id").as[Long].collect().toSet
    val v1b = UrlOps.holdoutByDomain(docs, "url", 300, "s1")
      .where(col("split") === "val").select("doc_id").as[Long].collect().toSet
    assert(v1 == v1b && v1.nonEmpty && v1.size < 200)
    val v2 = UrlOps.holdoutByDomain(docs, "url", 300, "s2")
      .where(col("split") === "val").select("doc_id").as[Long].collect().toSet
    assert(v2 != v1, "a different salt must re-roll the split")
    // degenerate permilles: all-train / all-val
    assert(UrlOps.holdoutByDomain(docs, "url", 0)
      .where(col("split") === "val").count() == 0)
    assert(UrlOps.holdoutByDomain(docs, "url", 1000)
      .where(col("split") === "train").count() == 0)
    intercept[IllegalArgumentException] {
      UrlOps.holdoutByDomain(docs, "url", 1001)
    }
  }

  test("capPerDomain skew salting: two-stage cap is row-identical to the single window") {
    import spark.implicits._
    val UrlOps = graft.ext.UrlOps
    val rnd = new scala.util.Random(42)
    // one mega-domain (the skew case the salting exists for) + a long
    // tail, unique order ids
    val docs = ((1L to 400L).map(i => (i, "https://mega.example.com/p" + i)) ++
      (401L to 600L).map(i =>
        (i, s"https://tail${rnd.nextInt(50)}.example.org/p$i")))
      .sortBy(_ => rnd.nextLong()).toDF("doc_id", "url")
    def kept(salts: Int) =
      UrlOps.capPerDomain(docs, "url", "doc_id", cap = 5, skewSalts = salts)
        .select("doc_id").as[Long].collect().toSet
    val plain = kept(1)
    for (s <- Seq(2, 8, 37))
      assert(kept(s) == plain, s"salts=$s diverged")
    // the cap semantics themselves: smallest 5 ids of the mega domain
    assert(plain.intersect((1L to 400L).toSet) == (1L to 5L).toSet, plain)
    intercept[IllegalArgumentException] {
      UrlOps.capPerDomain(docs, "url", "doc_id", 5, skewSalts = 0)
    }
  }

  test("column-appending operators reject inputs already carrying their output columns (no silent clobber)") {
    import spark.implicits._
    val UrlOps = graft.ext.UrlOps
    val docs = Seq((1L, "https://a.example.com/x")).toDF("doc_id", "url")
    // a frame that already carries `split` (common in eval prep) or
    // `reg_domain` must not get it silently overwritten
    val e1 = intercept[IllegalArgumentException] {
      UrlOps.holdoutByDomain(docs.withColumn("split", lit("test")), "url", 300)
    }
    assert(e1.getMessage.contains("split"), e1.getMessage)
    intercept[IllegalArgumentException] {
      UrlOps.holdoutByDomain(docs.withColumn("reg_domain", lit("x")), "url", 300)
    }
    intercept[IllegalArgumentException] {
      UrlOps.capPerDomain(docs.withColumn("domain", lit("x")), "url", "doc_id", 2)
    }
    intercept[IllegalArgumentException] {
      UrlOps.capPerDomain(docs.withColumn("_rn", lit(1)), "url", "doc_id", 2)
    }
    // clean inputs still work
    assert(UrlOps.holdoutByDomain(docs, "url", 300).count() == 1)
    assert(UrlOps.capPerDomain(docs, "url", "doc_id", 2).count() == 1)
  }

  test("zeroth tier: incrementalUrlDedup blocks canonical-url variants of the snapshot; retention re-admits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val Dedup = graft.ext.Dedup
    val prior = Seq(
      (1L, "https://example.com/a"),
      (2L, "https://example.com/b?id=2")).toDF("doc_id", "url")
    val keys = Dedup.urlKeys(prior)
    assert(keys.columns.toSeq == Seq("_key"))
    val batch = Seq(
      (10L, "HTTPS://EXAMPLE.COM/a#frag"), // case+fragment variant → blocked
      (11L, "https://example.com/b?utm_source=x&id=2"), // tracking variant → blocked
      (12L, "https://example.com/c?id=3"), // novel → kept
      (13L, "https://example.com/c?id=3&utm_term=z"), // within-batch twin → collapses
      (14L, "https://example.com/d/")).toDF("doc_id", "url") // novel (slash-stripped)
    val kept = Dedup.incrementalUrlDedup(batch, keys)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 14L), kept)
    // the single-`_key` shape rides the standard retention lifecycle:
    // aged-out url keys re-admit on the same one-knob read
    val gen0 = Dedup.stampGeneration(keys, 0L)
    val keptAged = Dedup.incrementalUrlDedup(batch,
        Dedup.retainGenerations(gen0, 1L))
      .select("doc_id").as[Long].collect().toSet
    assert(keptAged == Set(10L, 11L, 12L, 14L), keptAged)
    // shape + reserved-column loud rejects
    intercept[IllegalArgumentException] {
      Dedup.incrementalUrlDedup(batch, prior)
    }
    intercept[IllegalArgumentException] {
      Dedup.incrementalUrlDedup(batch.withColumn("_key", lit("x")), keys)
    }
  }

  test("temperatureSample: alpha=1 reduces to uniform targetFraction rates") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, if (i <= 200) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Curation.temperatureRates(docs, "lang", alpha = 1.0,
      targetFraction = 0.4)
    // alpha=1: K_l = f*N*(n_l/N) = f*n_l -> every stratum rate = f
    assert(rates.map(_._3).toSet == Set(400000L))
    // alpha=0 flattens mass equally across strata: K_l = f*N/2 = 60 per
    // stratum -> de (100 docs) rate 0.6, en (200 docs) rate 0.3
    val flat = Curation.temperatureRates(docs, "lang", alpha = 0.0,
      targetFraction = 0.4).map(t => t._1 -> t._3).toMap
    assert(flat("de") == 600000L && flat("en") == 300000L)
    // the sample itself is reproducible: same call -> same kept set
    val k1 = Curation.temperatureSample(docs, "lang", "doc_id", 0.5, 0.4)
      .select("doc_id").as[Long].collect().toSet
    val k2 = Curation.temperatureSample(docs, "lang", "doc_id", 0.5, 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(k1 == k2 && k1.nonEmpty)
  }
}
