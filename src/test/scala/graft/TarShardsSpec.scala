package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.TarShards

/** Tar shard sink/source, held to the repo's codec bar: proven against
  * the INDEPENDENT system `tar` in both directions, plus byte
  * determinism and the WebDataset shard round-trip. */
class TarShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(name: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d
  }

  test("system tar reads our archives: names, sizes, and bytes match") {
    import scala.sys.process._
    val members = Seq(
      "000001.txt" -> "hello tar world".getBytes("UTF-8"),
      "000002.txt" -> Array.tabulate(1000)(i => (i % 251).toByte), // crosses a block
      "000003.txt" -> Array.emptyByteArray)                        // zero-length member
    val dir = tmpDir("tar_out")
    val f = new java.io.File(dir, "t.tar")
    java.nio.file.Files.write(f.toPath, TarShards.writeAll(members))
    val listed = Seq("tar", "-tf", f.getPath).!!.trim.split("\n").toSeq
    assert(listed == members.map(_._1), listed)
    members.foreach { case (name, body) =>
      val out = new java.io.ByteArrayOutputStream()
      (Seq("tar", "-xOf", f.getPath, name) #> out).!!
      assert(java.util.Arrays.equals(out.toByteArray, body),
        s"$name: system tar extracted different bytes")
    }
  }

  test("our parser reads system-tar archives") {
    import scala.sys.process._
    val dir = tmpDir("tar_sys")
    val a = new java.io.File(dir, "a.txt")
    val b = new java.io.File(dir, "b.bin")
    java.nio.file.Files.write(a.toPath, "alpha beta".getBytes("UTF-8"))
    java.nio.file.Files.write(b.toPath, Array.tabulate(700)(_.toByte))
    val f = new java.io.File(dir, "sys.tar")
    assert(Seq("tar", "-cf", f.getPath, "-C", dir.getPath, "a.txt", "b.bin").! == 0)
    val parsed = TarShards.parseAll(java.nio.file.Files.readAllBytes(f.toPath))
      .toSeq.sortBy(_._1)
    assert(parsed.map(_._1) == Seq("a.txt", "b.bin"), parsed.map(_._1))
    assert(new String(parsed.head._2, "UTF-8") == "alpha beta")
    assert(java.util.Arrays.equals(parsed(1)._2, Array.tabulate(700)(_.toByte)))
  }

  test("readShardsStreamed: byte-identical to readShardsBinary on a mixed plain/gz store, long names included") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    def rows(n0: Int) = (0 until 40).map { i =>
      val name =
        if (i % 7 == 0) ("k" * 140) + f"$i%04d.txt" // GNU longname path
        else f"member-$i%04d.txt"
      (i % 4L, name, Array.fill(rng.nextInt(3000))(rng.nextInt().toByte))
    }
    val plainDir = tmpDir("tar_stream_plain").getPath
    val gzDir = tmpDir("tar_stream_gz").getPath
    TarShards.writeShards(rows(0).toDF("shard", "name", "payload"),
      plainDir, "shard", "name", "payload")
    TarShards.writeShards(rows(1).toDF("shard", "name", "payload"),
      gzDir, "shard", "name", "payload", gzip = true)
    for (dir <- Seq(plainDir, gzDir)) {
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("shard"), col("member_name"),
          octet_length(col("body")).cast("long").as("n"), md5(col("body")))
        .as[(Long, String, Long, String)].collect().toSet
      val streamed = key(TarShards.readShardsStreamed(spark, dir))
      val inMemory = key(TarShards.readShardsBinary(spark, dir))
      assert(streamed == inMemory && streamed.size == 40, s"$dir: mismatch")
    }
  }

  test("readShardsStreamed reads a >2 GiB archive the whole-file scan cannot hold") {
    import spark.implicits._
    // 40 x 64 MiB members = 2.56 GiB — past the JVM byte-array (and
    // binaryFile content) cap that bounds readShards. Written streamed
    // (per-member archives concatenated minus their trailers), read
    // back with the bounded-window parser; md5s pin every byte.
    val dir = tmpDir("tar_huge")
    val f = new java.io.File(dir, "shard-00000.tar")
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 20)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until 40).map { i =>
      val body = new Array[Byte](64 << 20)
      java.util.Arrays.fill(body, (i + 1).toByte)
      body(0) = (i * 3 + 7).toByte // per-member fingerprint byte
      val name = f"big-$i%04d.bin"
      val one = TarShards.writeAll(Seq(name -> body))
      out.write(one, 0, one.length - 1024) // strip the per-call trailer
      md.reset()
      name -> (body.length.toLong, md.digest(body).map("%02x".format(_)).mkString)
    }.toMap
    out.write(new Array[Byte](1024)) // the archive trailer
    out.close()
    assert(f.length() > Int.MaxValue.toLong, f.length())
    val got = TarShards.readShardsStreamed(spark, dir.getPath)
      .select(col("member_name"), octet_length(col("body")).cast("long"),
        md5(col("body")))
      .as[(String, Long, String)].collect()
      .map { case (n, len, h) => n -> (len, h) }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (n, want) =>
      assert(got(n) == want, s"$n: ${got(n)} vs $want")
    }
    // free the 2.5 GiB promptly
    f.delete()
  }

  test("writeShards/readShards round-trip: one tar per shard, deterministic bytes, rows preserved") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("shard", pmod(col("doc_id"), lit(4)))
      .withColumn("name", format_string("%06d.txt", col("doc_id")))
      .withColumn("payload", col("text").cast("binary"))
    val dir = tmpDir("tar_shards")
    TarShards.writeShards(docs, dir.getPath, "shard", "name", "payload")
    val files = dir.listFiles.filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      (0 to 3).map(i => f"shard-$i%05d.tar"), files.map(_.getName).toSeq)
    // commit leaves no temp artifacts behind
    assert(!dir.listFiles.exists(_.getName.endsWith(".tmp")),
      dir.listFiles.map(_.getName).mkString(", "))
    // rows preserved exactly (shard membership + payload text)
    val back = TarShards.readShards(spark, dir.getPath)
      .select(col("shard"),
        regexp_extract(col("member_name"), "^(\\d+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        col("body_text"))
    val expect = docs.select(col("shard").cast("long"), col("doc_id"), col("text"))
    assert(back.count() == docs.count())
    assert(back.join(expect,
        back("shard") === expect("shard") && back("doc_id") === expect("doc_id")
          && back("body_text") === expect("text"))
      .count() == docs.count(), "every member must match its source row")
    // byte determinism: a rewrite produces identical files
    val dir2 = tmpDir("tar_shards2")
    TarShards.writeShards(docs, dir2.getPath, "shard", "name", "payload")
    files.foreach { f1 =>
      val f2 = new java.io.File(dir2, f1.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1.toPath),
        java.nio.file.Files.readAllBytes(f2.toPath)),
        s"${f1.getName} must be byte-identical across reruns")
    }
    // and system tar agrees with the member count of one shard
    import scala.sys.process._
    val n0 = Seq("tar", "-tf", files.head.getPath).!!.trim.split("\n").length
    assert(n0.toLong == docs.where(col("shard") === 0).count())
  }

  test("index sidecars: every (offset, size) entry ranged-reads the exact member bytes, long names included") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a.txt", "first body"),
      (0L, ("k" * 130) + ".txt", "body behind a GNU longname entry"),
      (0L, "z.txt", "x" * 700), // crosses a block boundary
      (1L, "only.txt", "second shard"))
      .toDF("shard", "name", "text")
      .withColumn("payload", col("text").cast("binary"))
    val dir = tmpDir("tar_idx")
    TarShards.writeShards(docs, dir.getPath, "shard", "name", "payload",
      index = true)
    val idxFiles = dir.listFiles.filter(_.getName.endsWith(".idx")).sortBy(_.getName)
    assert(idxFiles.map(_.getName).toSeq ==
      Seq("shard-00000.idx", "shard-00001.idx"), idxFiles.map(_.getName).toSeq)
    val expected = docs.select("shard", "name", "text")
      .as[(Long, String, String)].collect()
      .map { case (s, n, t) => (s, n) -> t }.toMap
    var checked = 0
    idxFiles.foreach { idx =>
      val shard = idx.getName.stripSuffix(".idx").stripPrefix("shard-").toLong
      val tar = new java.io.File(dir, idx.getName.stripSuffix("idx") + "tar")
      val raf = new java.io.RandomAccessFile(tar, "r")
      try {
        scala.io.Source.fromFile(idx, "UTF-8").getLines().foreach { line =>
          val Array(name, off, size) = line.split("\t")
          val buf = new Array[Byte](size.toInt)
          raf.seek(off.toLong)
          raf.readFully(buf)
          assert(new String(buf, "UTF-8") == expected((shard, name)),
            s"ranged read of $name returned different bytes")
          checked += 1
        }
      } finally raf.close()
    }
    assert(checked == 4, s"index must cover every member: $checked")
    // determinism across reruns
    val dir2 = tmpDir("tar_idx2")
    TarShards.writeShards(docs, dir2.getPath, "shard", "name", "payload",
      index = true)
    idxFiles.foreach { f1 =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1.toPath),
        java.nio.file.Files.readAllBytes(new java.io.File(dir2, f1.getName).toPath)))
    }
    // the sidecar never matches readShards' tar glob
    assert(TarShards.readShards(spark, dir.getPath).count() == 4)
  }

  test("sample shards: multi-part samples round-trip with adjacent members; null parts skipped; dotted keys rejected") {
    import spark.implicits._
    val docs = Seq(
      (0L, "k1", "caption one", """{"id":1}"""),
      (0L, "k2", "caption two", null),          // optional part missing
      (1L, "k3", "caption three", """{"id":3}"""))
      .toDF("shard", "key", "cap", "meta")
      .withColumn("txt", col("cap").cast("binary"))
      .withColumn("json", col("meta").cast("binary"))
    val dir = tmpDir("tar_samples")
    TarShards.writeSampleShards(docs, dir.getPath, "shard", "key",
      Seq("json" -> "json", "txt" -> "txt"))
    // read side reassembles each sample's part map
    val back = TarShards.readSampleShards(spark, dir.getPath)
      .select(col("shard"), col("key"),
        map_keys(col("parts")).as("exts"),
        transform(map_values(col("parts")),
          b => b.cast("string")).as("vals"))
      .as[(Long, String, Seq[String], Seq[String])]
      .collect().map(r => (r._1, r._2) -> (r._3.zip(r._4).toMap)).toMap
    assert(back((0L, "k1")) ==
      Map("json" -> """{"id":1}""", "txt" -> "caption one"))
    assert(back((0L, "k2")) == Map("txt" -> "caption two"),
      "null part must be skipped, not written as an empty member")
    assert(back((1L, "k3")) ==
      Map("json" -> """{"id":3}""", "txt" -> "caption three"))
    // the WebDataset loader contract: a sample's members are ADJACENT
    // in the raw archive
    val raw = TarShards.parseAll(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "shard-00000.tar").toPath)).map(_._1).toSeq
    assert(raw == Seq("k1.json", "k1.txt", "k2.txt"), raw)
    // a key containing '.' would corrupt the extension split — loud
    val bad = Seq((0L, "k.4", "x", "y")).toDF("shard", "key", "cap", "meta")
      .withColumn("txt", col("cap").cast("binary"))
      .withColumn("json", col("meta").cast("binary"))
    val e = intercept[Exception] {
      TarShards.writeSampleShards(bad, tmpDir("tar_badkey").getPath,
        "shard", "key", Seq("txt" -> "txt"))
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("reserved"), e.getMessage)
    // a dotted EXTENSION would mis-split on re-read (last-dot rule)
    val e2 = intercept[IllegalArgumentException] {
      TarShards.writeSampleShards(docs, tmpDir("tar_badext").getPath,
        "shard", "key", Seq("tar.gz" -> "txt"))
    }
    assert(e2.getMessage.contains("no '.'"), e2.getMessage)
  }

  test("readShardsBinary: byte-identical bodies, no per-blob text decode column") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a.bin", Array[Byte](0, -1, 127, 8)), // invalid UTF-8 on purpose
      (1L, "b.bin", "plain".getBytes("UTF-8")))
      .toDF("shard", "name", "payload")
    val dir = tmpDir("tar_bin")
    TarShards.writeShards(docs, dir.getPath, "shard", "name", "payload")
    val bin = TarShards.readShardsBinary(spark, dir.getPath)
    assert(bin.columns.toSeq == Seq("shard", "member_name", "body"))
    val got = bin.as[(Long, String, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    val want = docs.as[(Long, String, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(got == want, got)
    // agrees with readShards' body column on the same store
    val full = TarShards.readShards(spark, dir.getPath)
      .select("shard", "member_name", "body")
      .as[(Long, String, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(full == got)
  }

  test("fetchSamples: ranged fetch off the .idx sidecars matches readSampleShards byte-exactly; gzip stores reject") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .where(col("doc_id") < 120)
      .withColumn("shard", pmod(col("doc_id"), lit(3)))
      .withColumn("key", format_string("%06d", col("doc_id")))
      .withColumn("txt", col("text").cast("binary"))
      .withColumn("json",
        concat(lit("{\"id\":"), col("doc_id").cast("string"), lit("}"))
          .cast("binary"))
    val dir = tmpDir("tar_fetch")
    TarShards.writeSampleShards(docs, dir.getPath, "shard", "key",
      Seq("json" -> "json", "txt" -> "txt"), index = true)
    def collectSamples(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("key"),
        map_keys(col("parts")).as("exts"),
        transform(map_values(col("parts")), b => b.cast("string")).as("vals"))
      .as[(Long, String, Seq[String], Seq[String])]
      .collect().map(r => (r._1, r._2) -> r._3.zip(r._4).sortBy(_._1)).toMap
    // full-key fetch == the full scan, byte for byte
    val allKeys = docs.select("key").distinct()
    val fetched = collectSamples(
      TarShards.fetchSamples(spark, dir.getPath, allKeys))
    val scanned = collectSamples(TarShards.readSampleShards(spark, dir.getPath))
    assert(fetched == scanned, s"${fetched.size} vs ${scanned.size}")
    assert(fetched.size == 120)
    // subset fetch returns exactly the requested samples (absent keys: no
    // row, no error), both parts intact
    val some = TarShards.fetchSamples(spark, dir.getPath,
      Seq("000007", "000033", "no_such_key").toDF("k"))
    val got = collectSamples(some)
    assert(got.keySet.map(_._2) == Set("000007", "000033"), got.keySet)
    assert(got((1L, "000007")) == scanned((1L, "000007")))
    // a gzip store rejects loudly — its offsets address the uncompressed
    // stream, so a silent ranged read would return garbage
    val gzDir = tmpDir("tar_fetch_gz")
    TarShards.writeSampleShards(docs, gzDir.getPath, "shard", "key",
      Seq("txt" -> "txt"), gzip = true, index = true)
    val e = intercept[Exception] {
      TarShards.fetchSamples(spark, gzDir.getPath,
        Seq("000007").toDF("k")).collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("UNCOMPRESSED"), e.getMessage)
    // shape guard: a multi-column keys frame is a usage bug
    intercept[IllegalArgumentException] {
      TarShards.fetchSamples(spark, dir.getPath,
        Seq(("a", "b")).toDF("k", "x"))
    }
    // a corrupt sidecar line (bad field count, non-numeric offset, or a
    // member name without the <key>.<ext> form) rejects with the
    // DESIGNED message — a silent skip could hide a requested sample
    // from an audit, and an opaque cast error would hide the cause
    for (badLine <- Seq("orphan\t0", "a.txt\tfoo\t5", "README\t0\t5")) {
      val badDir = tmpDir("tar_fetch_bad")
      TarShards.writeSampleShards(docs.where(col("doc_id") < 8),
        badDir.getPath, "shard", "key", Seq("txt" -> "txt"), index = true)
      val idx = badDir.listFiles.filter(_.getName.endsWith(".idx")).head
      java.nio.file.Files.write(idx.toPath, s"$badLine\n".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      // the writer went through Hadoop's checksummed local FS — drop the
      // stale .crc so the read reaches OUR validation, not the CRC check
      new java.io.File(idx.getParentFile, "." + idx.getName + ".crc").delete()
      // request key "a" too: off/len validation is Catalyst-lazy (only
      // entries the fetch selects evaluate them), so the corrupt-offset
      // case must be on a REQUESTED key to prove the loud path
      val e3 = intercept[Exception] {
        TarShards.fetchSamples(spark, badDir.getPath,
          Seq("000000", "a").toDF("k")).collect()
      }
      val msgs = Iterator.iterate[Throwable](e3)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("malformed .idx line"), s"$badLine -> $msgs")
    }
  }

  test("fetchSamples over a MIXED store: un-indexed shards fall back to a scan, nothing silently missing") {
    import spark.implicits._
    val dir = tmpDir("tar_mixed_idx").getPath
    // shards 0/1 indexed; shards 2/3 written WITHOUT sidecars (the
    // pre-index era of a store) — requested keys live in both eras
    val indexed = (0 until 20).map(i => (i % 2L, f"k$i%04d", s"body $i"))
      .toDF("shard", "key", "cap").withColumn("txt", col("cap").cast("binary"))
    val plain = (20 until 40).map(i => (2L + i % 2L, f"k$i%04d", s"body $i"))
      .toDF("shard", "key", "cap").withColumn("txt", col("cap").cast("binary"))
    TarShards.writeSampleShards(indexed, dir, "shard", "key",
      Seq("txt" -> "txt"), index = true)
    TarShards.writeSampleShards(plain, dir, "shard", "key",
      Seq("txt" -> "txt"), index = false)
    val want = Seq("k0003", "k0007", "k0023", "k0031", "k9999") // both eras + a miss
    val got = TarShards.fetchSamples(spark, dir, want.toDF("key"))
      .select(col("shard"), col("key"),
        col("parts").getItem("txt").cast("string").as("txt"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "k0003", "body 3"), (1L, "k0007", "body 7"),
      (3L, "k0023", "body 23"), (3L, "k0031", "body 31")), got)
    // a FULLY indexed store takes the pure ranged path (no scan branch)
    val got2 = TarShards.fetchSamples(spark, dir.toString,
      Seq("k0003").toDF("key")).count()
    assert(got2 == 1L)
    // a FULLY-UNINDEXED store (every shard predates index=true — the
    // fallback's motivating class): the .idx glob matches nothing and
    // the fetch must scan, not die with PATH_NOT_FOUND at plan time
    val noIdx = tmpDir("tar_noidx").getPath
    TarShards.writeSampleShards(plain, noIdx, "shard", "key",
      Seq("txt" -> "txt"), index = false)
    val got3 = TarShards.fetchSamples(spark, noIdx,
        Seq("k0023", "k9999").toDF("key"))
      .select(col("key"), col("parts").getItem("txt").cast("string"))
      .as[(String, String)].collect().toSet
    assert(got3 == Set(("k0023", "body 23")), got3)
  }

  test("readShardsStreamed fails loudly on a corrupt gzip header (no hang, no silent skip)") {
    import spark.implicits._
    val dir = tmpDir("tar_badgz")
    // gzip magic followed by garbage: the GZIPInputStream constructor
    // throws during the sniffed open — the task must die loudly (and the
    // review-hardened `cur = buf` handoff means the raw stream is closed
    // by the completion listener, not leaked)
    java.nio.file.Files.write(new java.io.File(dir, "shard-00000.tar.gz").toPath,
      Array[Byte](0x1f.toByte, 0x8b.toByte, 0x7f, 0x7f, 0x00, 0x01, 0x02))
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.readShardsStreamed(spark, dir.getPath).count()
    }
    val msgs = e.getMessage +
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" ")
    assert(msgs.toLowerCase.contains("zip") || msgs.toLowerCase.contains("gzip") ||
      msgs.toLowerCase.contains("deflat") || msgs.toLowerCase.contains("eof"),
      msgs.take(400))
  }

  test("empty-store reads loud-reject; zero-key fetch degrades cleanly") {
    import spark.implicits._
    // an EMPTY shard directory is a wrong store path or a failed write,
    // not an empty corpus: every directory reader loud-rejects (r17 —
    // a silently-empty frame reads as an empty-but-'successful' run)
    val empty = tmpDir("tar_empty").getPath
    for (read <- Seq(
        () => TarShards.readShardsStreamed(spark, empty),
        () => TarShards.readShards(spark, empty))) {
      val e = intercept[IllegalArgumentException](read().count())
      assert(e.getMessage.contains("no shard-"), e.getMessage)
    }
    // a mixed store fetched with ZERO keys returns zero rows through
    // both the ranged and the fallback-scan branches
    val dir = tmpDir("tar_mixed_empty").getPath
    val rows = Seq((0L, "k0001", "x"), (1L, "k0002", "y"))
      .toDF("shard", "key", "cap")
      .withColumn("txt", col("cap").cast("binary"))
    TarShards.writeSampleShards(rows.where(col("shard") === 0), dir,
      "shard", "key", Seq("txt" -> "txt"), index = true)
    TarShards.writeSampleShards(rows.where(col("shard") === 1), dir,
      "shard", "key", Seq("txt" -> "txt"), index = false)
    assert(TarShards.fetchSamples(spark, dir,
      Seq.empty[String].toDF("key")).count() == 0)
  }

  test("seeded random fetch property: random multi-part stores fetch byte-exactly through the index, long keys and empty bodies included") {
    import spark.implicits._
    val rnd = new scala.util.Random(15082026L)
    for (trial <- 1 to 3) {
      val nDocs = 30 + rnd.nextInt(40)
      val rows = (0 until nDocs).map { i =>
        // ~half the keys exceed the 100-byte name field (with their
        // extension) so the idx offsets must account for the longname
        // carrier entries; bodies include zero-length members
        val key = (if (rnd.nextBoolean()) "k" * (95 + rnd.nextInt(40))
                   else "k") + f"-$trial-$i"
        def part() =
          if (rnd.nextInt(4) == 0) null
          else { val b = new Array[Byte](rnd.nextInt(900)); rnd.nextBytes(b); b }
        (i % 3, key, part(), part(), part())
      }.filter(r => r._3 != null || r._4 != null || r._5 != null)
      val df = rows.toDF("shard", "key", "txt", "json", "bin")
      val dir = tmpDir(s"tar_fprop$trial")
      TarShards.writeSampleShards(df, dir.getPath, "shard", "key",
        Seq("txt" -> "txt", "json" -> "json", "bin" -> "bin"), index = true)
      val wanted = rows.map(_._2).filter(_ => rnd.nextBoolean())
      def collectSamples(d: org.apache.spark.sql.DataFrame) = d
        .select(col("shard"), col("key"),
          map_keys(col("parts")).as("es"),
          transform(map_values(col("parts")), b => md5(b)).as("hs"))
        .as[(Long, String, Seq[String], Seq[String])]
        .collect().map(r => (r._1, r._2) -> r._3.zip(r._4).sortBy(_._1)).toMap
      val fetched = collectSamples(TarShards.fetchSamples(spark, dir.getPath,
        wanted.toDF("key")))
      val scanned = collectSamples(TarShards.readSampleShards(spark, dir.getPath))
        .filter { case ((_, k), _) => wanted.contains(k) }
      assert(fetched == scanned,
        s"trial $trial: ${fetched.size} vs ${scanned.size}")
      assert(fetched.size == wanted.distinct.size, s"trial $trial")
    }
  }

  test("gzipped shards: .tar.gz round-trip, deterministic bytes, system tar -z reads them") {
    import spark.implicits._
    import scala.sys.process._
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("shard", pmod(col("doc_id"), lit(3)))
      .withColumn("name", format_string("%06d.txt", col("doc_id")))
      .withColumn("payload", col("text").cast("binary"))
    val dir = tmpDir("tar_gz")
    TarShards.writeShards(docs, dir.getPath, "shard", "name", "payload",
      gzip = true)
    val files = dir.listFiles.filter(_.getName.endsWith(".tar.gz")).sortBy(_.getName)
    assert(files.map(_.getName).toSeq ==
      (0 to 2).map(i => f"shard-$i%05d.tar.gz"), files.map(_.getName).toSeq)
    // readShards sniffs the gzip magic and restores every member
    val back = TarShards.readShards(spark, dir.getPath)
    assert(back.count() == docs.count())
    val expect = docs.select(col("shard").cast("long").as("shard"),
      col("name"), col("text"))
    assert(back.join(expect,
        back("shard") === expect("shard") && back("member_name") === expect("name")
          && back("body_text") === expect("text"))
      .count() == docs.count(), "every gz member must match its source row")
    // byte determinism (fixed gzip header, MTIME 0)
    val dir2 = tmpDir("tar_gz2")
    TarShards.writeShards(docs, dir2.getPath, "shard", "name", "payload",
      gzip = true)
    files.foreach { f1 =>
      val f2 = new java.io.File(dir2, f1.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1.toPath),
        java.nio.file.Files.readAllBytes(f2.toPath)),
        s"${f1.getName} must be byte-identical across reruns")
    }
    // the independent system tar agrees on the member count
    val n0 = Seq("tar", "-tzf", files.head.getPath).!!.trim.split("\n").length
    assert(n0.toLong == docs.where(col("shard") === 0).count())
    // a mixed directory (plain + gz) reads as the union
    TarShards.writeShards(docs.where(col("shard") === 0)
      .withColumn("shard", lit(7L)), dir.getPath, "shard", "name", "payload")
    val mixed = TarShards.readShards(spark, dir.getPath)
    assert(mixed.count() == docs.count() + docs.where(col("shard") === 0).count())
  }

  test("truncated archives fail loudly") {
    // member claims more bytes than present
    val good = TarShards.writeAll(Seq("a.txt" -> "abc".getBytes("UTF-8")))
    val cut = java.util.Arrays.copyOfRange(good, 0, 513)
    intercept[IllegalArgumentException] {
      TarShards.parseAll(cut).toSeq
    }
  }

  test("long member names round-trip through GNU longname entries, deterministically, and system tar reads them") {
    import scala.sys.process._
    val longName = ("url-derived-key-" * 9) + "tail.txt" // 152 bytes
    assert(longName.getBytes("UTF-8").length > 100)
    val members = Seq(
      longName -> "long-keyed payload".getBytes("UTF-8"),
      "short.txt" -> "short".getBytes("UTF-8"))
    val bytes = TarShards.writeAll(members)
    // our own parser restores the FULL name
    val parsed = TarShards.parseAll(bytes).toSeq
    assert(parsed.map(_._1) == members.map(_._1), parsed.map(_._1))
    assert(new String(parsed.head._2, "UTF-8") == "long-keyed payload")
    // byte determinism holds across reruns
    assert(java.util.Arrays.equals(bytes, TarShards.writeAll(members)))
    // the independent system tar lists the full name and extracts the bytes
    val dir = tmpDir("tar_longw")
    val f = new java.io.File(dir, "lw.tar")
    java.nio.file.Files.write(f.toPath, bytes)
    val listed = Seq("tar", "-tf", f.getPath).!!.trim.split("\n").toSeq
    assert(listed == members.map(_._1), listed)
    val out = new java.io.ByteArrayOutputStream()
    (Seq("tar", "-xOf", f.getPath, longName) #> out).!!
    assert(new String(out.toByteArray, "UTF-8") == "long-keyed payload")
  }

  test("PAX write side: format=pax emits x-header long names that system tar AND Python tarfile read; deterministic") {
    import scala.sys.process._
    val longName = ("pax-url-derived-key-" * 7) + "tail.txt" // 148 bytes
    assert(longName.getBytes("UTF-8").length > 100)
    val members = Seq(
      longName -> "pax long-keyed payload".getBytes("UTF-8"),
      "short.txt" -> "short".getBytes("UTF-8"))
    val bytes = TarShards.writeAll(members, format = "pax")
    // no GNU extension bytes anywhere: the carrier is an 'x' entry
    val parsedNames = TarShards.parseAll(bytes).map(_._1).toSeq
    assert(parsedNames == members.map(_._1), parsedNames)
    assert(!new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("././@LongLink"), "pax output must not carry GNU 'L' entries")
    // byte determinism across reruns (fixed header fields + tarfile's
    // constant PaxHeader name, no PID template)
    assert(java.util.Arrays.equals(bytes,
      TarShards.writeAll(members, format = "pax")))
    val dir = tmpDir("tar_paxw")
    val f = new java.io.File(dir, "pw.tar")
    java.nio.file.Files.write(f.toPath, bytes)
    // independent reader 1: system tar lists the full name, extracts bytes
    val listed = Seq("tar", "-tf", f.getPath).!!.trim.split("\n").toSeq
    assert(listed == members.map(_._1), listed)
    val out = new java.io.ByteArrayOutputStream()
    (Seq("tar", "-xOf", f.getPath, longName) #> out).!!
    assert(new String(out.toByteArray, "UTF-8") == "pax long-keyed payload")
    // independent reader 2: Python tarfile agrees on names and bytes
    val py = Seq("python3", "-c",
      s"""import tarfile
         |t = tarfile.open('${f.getPath}')
         |ms = t.getmembers()
         |print('|'.join(m.name for m in ms))
         |print(t.extractfile(ms[0]).read().decode())""".stripMargin).!!
    val Array(names, body) = py.trim.split("\n")
    assert(names == members.map(_._1).mkString("|"), names)
    assert(body == "pax long-keyed payload")
    // file-scale: writeShards(format = "pax") round-trips through our
    // own reader AND an unknown format rejects loudly
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, longName, "a"), (0L, "b.txt", "b"))
      .toDF("shard", "name", "text")
      .withColumn("payload", col("text").cast("binary"))
    val fdir = tmpDir("tar_paxw2")
    TarShards.writeShards(docs, fdir.getPath, "shard", "name", "payload",
      format = "pax")
    val back = TarShards.readShards(spark, fdir.getPath)
      .select("member_name", "body_text")
      .as[(String, String)].collect().toMap
    assert(back == Map(longName -> "a", "b.txt" -> "b"), back)
    intercept[IllegalArgumentException] {
      TarShards.writeAll(members, format = "v7")
    }
  }

  test("GNU-tar longname archives parse with the full name (Python tarfile's default for long keys)") {
    import scala.sys.process._
    val dir = tmpDir("tar_long")
    val longName = ("k" * 120) + ".txt" // > 100 bytes → tar emits an 'L' entry
    val f0 = new java.io.File(dir, longName)
    java.nio.file.Files.write(f0.toPath, "payload".getBytes("UTF-8"))
    val f = new java.io.File(dir, "long.tar")
    assert(Seq("tar", "--format=gnu", "-cf", f.getPath,
      "-C", dir.getPath, longName).! == 0)
    val parsed = TarShards.parseAll(
      java.nio.file.Files.readAllBytes(f.toPath)).toSeq
    assert(parsed.map(_._1) == Seq(longName), parsed.map(_._1))
    assert(new String(parsed.head._2, "UTF-8") == "payload")
  }

  test("PAX archives parse with the x-header path override") {
    import scala.sys.process._
    val dir = tmpDir("tar_pax")
    val longName = ("p" * 110) + ".txt"
    val f0 = new java.io.File(dir, longName)
    java.nio.file.Files.write(f0.toPath, "pax payload".getBytes("UTF-8"))
    val f = new java.io.File(dir, "pax.tar")
    assert(Seq("tar", "--format=pax", "-cf", f.getPath,
      "-C", dir.getPath, longName).! == 0)
    val parsed = TarShards.parseAll(
      java.nio.file.Files.readAllBytes(f.toPath)).toSeq
    assert(parsed.map(_._1) == Seq(longName), parsed.map(_._1))
    assert(new String(parsed.head._2, "UTF-8") == "pax payload")
  }

  test("POSIX ustar prefix-split paths parse as the full path, not the truncated name field") {
    import scala.sys.process._
    val dir = tmpDir("tar_pfx")
    // a path over 100 bytes with a slash split point: ustar stores the
    // directory part in the prefix field (offset 345) — ignoring it
    // would both truncate the key and collide distinct keys sharing a
    // 100-byte suffix
    val sub = "d" * 80
    val leaf = ("f" * 40) + ".txt"
    val subDir = new java.io.File(dir, sub)
    assert(subDir.mkdir())
    java.nio.file.Files.write(new java.io.File(subDir, leaf).toPath,
      "prefixed payload".getBytes("UTF-8"))
    val f = new java.io.File(dir, "pfx.tar")
    assert(Seq("tar", "--format=ustar", "-cf", f.getPath,
      "-C", dir.getPath, s"$sub/$leaf").! == 0)
    val parsed = TarShards.parseAll(
      java.nio.file.Files.readAllBytes(f.toPath)).toSeq
    assert(parsed.map(_._1) == Seq(s"$sub/$leaf"), parsed.map(_._1))
    assert(new String(parsed.head._2, "UTF-8") == "prefixed payload")
  }

  test("PAX global headers with path/size overrides are rejected loudly; harmless globals are ignored") {
    def patchTypeflag(archive: Array[Byte], flag: Byte): Array[Byte] = {
      val a = archive.clone()
      a(156) = flag
      // recompute the POSIX checksum over the patched header
      java.util.Arrays.fill(a, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += a(i) & 0xff)
      val chk = java.lang.Long.toOctalString(sum)
      val field = ("0" * (6 - chk.length)) + chk + "  "
      System.arraycopy(field.getBytes("UTF-8"), 0, a, 148, 8)
      a
    }
    // a 'g' entry whose body carries a path override → loud reject
    val evil = patchTypeflag(TarShards.writeAll(
      Seq("g.hdr" -> "17 path=evil.txt\n".getBytes("UTF-8"))), 'g'.toByte)
    val e = intercept[IllegalArgumentException] {
      TarShards.parseAll(evil).toSeq
    }
    assert(e.getMessage.contains("global"), e.getMessage)
    // a harmless global (comment) parses through to zero members
    val benign = patchTypeflag(TarShards.writeAll(
      Seq("g.hdr" -> "15 comment=hiA\n".getBytes("UTF-8"))), 'g'.toByte)
    assert(TarShards.parseAll(benign).toSeq.isEmpty)
  }

  test("corrupted headers are rejected by checksum, never silently mis-framed (seeded fuzz)") {
    val members = Seq(
      "000001.txt" -> "the first member body".getBytes("UTF-8"),
      "000002.txt" -> Array.tabulate(600)(i => (i % 127).toByte),
      "000003.txt" -> "the last member".getBytes("UTF-8"))
    val good = TarShards.writeAll(members)
    val goodParse = TarShards.parseAll(good).toSeq.map {
      case (n, b) => (n, b.toSeq)
    }
    val rnd = new scala.util.Random(42)
    var rejected = 0
    for (_ <- 1 to 200) {
      val corrupt = good.clone()
      // flip one byte inside the FIRST header (the frame everything
      // downstream depends on), skipping positions where a flip can be
      // a no-op for parsing (name tail NULs past the name, pad bytes)
      val off = rnd.nextInt(512)
      val delta = (1 + rnd.nextInt(254)).toByte
      corrupt(off) = (corrupt(off) + delta).toByte
      val r = scala.util.Try(TarShards.parseAll(corrupt).toSeq.map {
        case (n, b) => (n, b.toSeq)
      })
      r match {
        case scala.util.Success(parsed) =>
          // a flip the checksum cannot see (it didn't change the sum
          // contribution — impossible for a single byte — or landed in
          // the data region) may parse; it must never silently change
          // the member FRAMING (names and sizes of all three members)
          assert(parsed.map(_._1) == goodParse.map(_._1) &&
            parsed.map(_._2.length) == goodParse.map(_._2.length),
            s"flip at $off silently re-framed the archive")
        case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
        case scala.util.Failure(e) => throw e
      }
    }
    assert(rejected > 150, s"most single-byte header flips must be caught: $rejected/200")
  }

  test("fuzz over longname/PAX header blocks: flips reject loudly or leave framing untouched (seeded)") {
    // archive: [L header][longname body][real header][body]
    //          [x header][pax body][real header][body]  (patched from 'L')
    val longName = ("q" * 120) + ".txt"
    val gnuPart = TarShards.writeAll(Seq(
      longName -> "gnu member body".getBytes("UTF-8")))
    // build a PAX pair by patching a synthetic 'L'-style layout: write a
    // pax record carrier + the following member, then set typeflag 'x'
    val paxRecord = {
      // len counts its own digits: solve len == digits(len) + rest
      val content = s" path=$longName\n"
      var len = content.length + 1
      while (len.toString.length + content.length != len) len += 1
      s"$len$content".getBytes("UTF-8")
    }
    val paxCarrier = TarShards.writeAll(Seq(
      "pax.hdr" -> paxRecord,
      "short.txt" -> "pax member body".getBytes("UTF-8")))
    val paxPart = paxCarrier.clone()
    paxPart(156) = 'x'.toByte
    // recompute the first header's checksum after the typeflag patch
    java.util.Arrays.fill(paxPart, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += paxPart(i) & 0xff)
    val chk = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - chk.length)) + chk + "  ").getBytes("UTF-8"),
      0, paxPart, 148, 8)
    // strip each part's two-zero-block trailer except the last
    val archive = java.util.Arrays.copyOfRange(gnuPart, 0, gnuPart.length - 1024) ++ paxPart
    // the 'L' entry names the gnu member; the 'x' record renames the
    // pax pair's following member — two emitted members, both longName
    val goodParse = TarShards.parseAll(archive).toSeq.map { case (n, b) => (n, b.toSeq) }
    assert(goodParse.map(_._1) == Seq(longName, longName), goodParse.map(_._1))
    val rnd = new scala.util.Random(1234)
    // header blocks sit at known offsets: L@0, real@1024 (after 512-pad
    // name), x@2048+? — compute: gnuPart layout: L hdr 512 + name 512 +
    // real hdr 512 + body 512 = 2048; pax: x hdr at 2048, record 512,
    // real hdr at 3072
    val headerOffsets = Seq(0, 1024, 2048, 3072)
    var rejected = 0
    for (_ <- 1 to 200) {
      val corrupt = archive.clone()
      val base = headerOffsets(rnd.nextInt(headerOffsets.length))
      val off = base + rnd.nextInt(512)
      corrupt(off) = (corrupt(off) + 1 + rnd.nextInt(254)).toByte
      scala.util.Try(TarShards.parseAll(corrupt).toSeq.map {
        case (n, b) => (n, b.toSeq)
      }) match {
        case scala.util.Success(parsed) =>
          assert(parsed.map(_._1) == goodParse.map(_._1) &&
            parsed.map(_._2.length) == goodParse.map(_._2.length),
            s"flip at $off silently re-framed the longname/PAX archive")
        case scala.util.Failure(_: IllegalArgumentException) => rejected += 1
        case scala.util.Failure(e) => throw e
      }
    }
    assert(rejected > 150, s"most header flips must be caught: $rejected/200")
  }

  test("review hardening: typeflag 7 reads as regular, sparse rejects, idx tab-names reject, sample edge cases loud") {
    import spark.implicits._
    def patch(archive: Array[Byte], flag: Byte): Array[Byte] = {
      val a = archive.clone()
      a(156) = flag
      java.util.Arrays.fill(a, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += a(i) & 0xff)
      val chk = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - chk.length)) + chk + "  ").getBytes("UTF-8"),
        0, a, 148, 8)
      a
    }
    val base = TarShards.writeAll(Seq("a.txt" -> "contiguous body".getBytes("UTF-8")))
    // POSIX '7' (contiguous) = regular file, must not silently vanish
    val seven = TarShards.parseAll(patch(base, '7'.toByte)).toSeq
    assert(seven.map(_._1) == Seq("a.txt") &&
      new String(seven.head._2, "UTF-8") == "contiguous body")
    // GNU sparse would yield hole-mangled bytes if read as regular — loud
    val eS = intercept[IllegalArgumentException] {
      TarShards.parseAll(patch(base, 'S'.toByte)).toSeq
    }
    assert(eS.getMessage.contains("sparse"), eS.getMessage)
    // a negative PAX size record is corrupt, not "absent"
    val negRec = {
      val content = " size=-1\n"
      var len = content.length + 1
      while (len.toString.length + content.length != len) len += 1
      s"$len$content".getBytes("UTF-8")
    }
    val paxNeg = patch(TarShards.writeAll(Seq(
      "p.hdr" -> negRec, "b.txt" -> "x".getBytes("UTF-8"))), 'x'.toByte)
    val eN = intercept[IllegalArgumentException] {
      TarShards.parseAll(paxNeg).toSeq
    }
    assert(eN.getMessage.contains("negative PAX size"), eN.getMessage)
    // index mode rejects names the tab-delimited sidecar cannot express
    val tabbed = Seq((0L, "a\tb.txt", "x"))
      .toDF("shard", "name", "text")
      .withColumn("payload", col("text").cast("binary"))
    val eT = intercept[org.apache.spark.SparkException] {
      TarShards.writeShards(tabbed, tmpDir("tar_tab").getPath,
        "shard", "name", "payload", index = true)
    }
    assert(eT.getMessage.contains("idx") ||
      Option(eT.getCause).exists(_.getMessage.contains("idx")), eT.getMessage)
    // ...but plain (un-indexed) writes still allow them (tar itself does)
    TarShards.writeShards(tabbed, tmpDir("tar_tab2").getPath,
      "shard", "name", "payload")
    // null sample keys are a loud data bug, not a deep NPE
    val nullKey = Seq((0L, Option.empty[String], "x"))
      .toDF("shard", "key", "cap")
      .withColumn("txt", col("cap").cast("binary"))
    val eK = intercept[Exception] {
      TarShards.writeSampleShards(nullKey, tmpDir("tar_nullkey").getPath,
        "shard", "key", Seq("txt" -> "txt"))
    }
    assert((eK.getMessage + Option(eK.getCause).map(_.getMessage).getOrElse(""))
      .contains("null"), eK.getMessage)
    // a third-party shard whose members lack <key>.<ext> form fails
    // loudly on the sample read, not as a "" sample
    val dir = tmpDir("tar_nodot")
    val plain = Seq((0L, "noext", "x"))
      .toDF("shard", "name", "text")
      .withColumn("payload", col("text").cast("binary"))
    TarShards.writeShards(plain, dir.getPath, "shard", "name", "payload")
    val eD = intercept[Exception] {
      TarShards.readSampleShards(spark, dir.getPath).collect()
    }
    assert((eD.getMessage + Option(eD.getCause).map(_.getMessage).getOrElse(""))
      .contains("key"), eD.getMessage)
  }

  test("seeded random round-trip property: arbitrary names (short and long) and bodies survive write->parse") {
    val rnd = new scala.util.Random(20240815L)
    // printable-ish name alphabet incl. path separators and spaces —
    // everything tar allows except NUL (the field terminator)
    val alphabet = (' ' to '~').filter(c => c != ' ').toArray
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(8)
      val members = (0 until n).map { i =>
        val nameLen = 1 + rnd.nextInt(150) // crosses the 100-byte longname split
        val name = s"m$i-" + Array.fill(nameLen)(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        val body = new Array[Byte](rnd.nextInt(2000))
        rnd.nextBytes(body)
        (name, body)
      }
      // both long-name carriers round-trip the same rows — PAX names of
      // many lengths also sweep the record-length self-referential
      // fixpoint across its digit boundaries (95..1000+ byte records)
      for (format <- Seq("gnu", "pax")) {
        val parsed = TarShards.parseAll(
          TarShards.writeAll(members, format)).toSeq
        assert(parsed.map(_._1) == members.map(_._1),
          s"trial $trial ($format): names diverged")
        parsed.zip(members).foreach { case ((_, got), (name, want)) =>
          assert(java.util.Arrays.equals(got, want),
            s"trial $trial ($format): body of $name diverged")
        }
      }
    }
  }

  test("negative shard ids fail loudly instead of NPE or unparseable filenames") {
    import spark.implicits._
    val docs = Seq((-1L, "a.txt", "x"), (0L, "b.txt", "y"))
      .toDF("shard", "name", "text")
      .withColumn("payload", col("text").cast("binary"))
    val dir = tmpDir("tar_neg")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.writeShards(docs, dir.getPath, "shard", "name", "payload")
    }
    assert(e.getCause != null || e.getMessage.contains("non-negative"),
      e.getMessage.take(300))
  }
}
