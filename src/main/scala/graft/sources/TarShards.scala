package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shards — the de-facto container for sharded
  * multimodal training data (Aizman et al., "High Performance I/O For
  * Large Scale Deep Learning", IEEE BigData 2019; webdataset.github.io):
  * a dataset is a directory of plain `shard-NNNNN.tar` files, each tar
  * member a sample file named `<key>.<ext>`, consumed sequentially by
  * data loaders. This module is the SINK side of the training-data
  * pipeline (the mirror of [[Warc]]'s ingest side): curated documents go
  * out as deterministic USTAR archives any `tar` implementation can
  * read.
  *
  * Format (POSIX ustar, the subset every tar reads): 512-byte header
  * (name 100, mode/uid/gid as octal ASCII, size 12-byte octal, mtime,
  * checksum over the header with the checksum field blanked to spaces,
  * typeflag '0', magic "ustar\0" version "00"), data padded to 512-byte
  * blocks, archive terminated by two zero blocks. Headers are written
  * with FIXED mode/uid/gid/mtime (0644/0/0/0), so the same rows always
  * produce byte-identical shards — reruns and task retries are
  * idempotent at the byte level, and round-trip oracles can hash them.
  *
  * Scale shape: [[writeShards]] repartitions by shard id (each shard's
  * rows land in one task; a task streams its shards to disk one member
  * at a time — no shard is ever materialized in memory) and
  * [[readShards]]/[[members]] follow the multimodal-column pattern:
  * whole-file binary blobs explode per partition in one batched pass,
  * blobs never shuffle. Verification discipline: the parser and writer
  * are proven against the INDEPENDENT system `tar` in both directions
  * (TarShardsSpec), same bar as the JPEG/WAV codecs.
  */
object TarShards {

  private val BlockSize = 512

  private def octal(value: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminator — the conservative layout
    // every tar implementation accepts
    val s = java.lang.Long.toOctalString(value)
    require(s.length <= width - 1, s"value $value overflows $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(UTF_8)
  }

  /** Serialize one ustar member header. */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100, s"tar member name exceeds 100 bytes: $name")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420L, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0L, 12), 0, h, 136, 12) // mtime: fixed for determinism
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum blanked for the sum
    h(156) = '0' // typeflag: regular file
    System.arraycopy(Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0'),
      0, h, 257, 8) // POSIX magic "ustar" NUL + version "00"
    System.arraycopy(octal(0L, 8), 0, h, 329, 8) // devmajor
    System.arraycopy(octal(0L, 8), 0, h, 337, 8) // devminor
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // POSIX checksum layout: 6 octal digits, NUL, space
    val chk = java.lang.Long.toOctalString(sum)
    val chkField = ("0" * (6 - chk.length)) + chk + "\u0000 "
    System.arraycopy(chkField.getBytes(UTF_8), 0, h, 148, 8)
    h
  }

  private def writeMember(out: java.io.OutputStream, name: String,
      body: Array[Byte]): Unit = {
    out.write(header(name, body.length.toLong))
    out.write(body)
    val pad = (BlockSize - body.length % BlockSize) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def writeTrailer(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  /** Serialize members into one in-memory tar archive (tests + the
    * round-trip oracle row; production shards stream via [[writeShards]]). */
  def writeAll(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    members.foreach { case (n, b) => writeMember(out, n, b) }
    writeTrailer(out)
    out.toByteArray
  }

  /** Parse a tar archive into its (name, body) members. Accepts
    * ustar/GNU archives of regular files with header-sized (≤ 100 byte)
    * names; directories and links are skipped by typeflag. GNU longname
    * ('L') and PAX extension ('x'/'g') entries are REJECTED loudly: the
    * member after them carries a truncated header name, and silently
    * returning it would corrupt keys (and collide distinct long keys
    * sharing a 100-byte prefix). Python's tarfile writes GNU longnames
    * by default for >100-byte keys — keep shard keys short. */
  def parseAll(payload: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var pos = 0
      private var nextRec: (String, Array[Byte]) = null
      private def blockZero(off: Int): Boolean = {
        var i = off
        while (i < off + BlockSize) { if (payload(i) != 0) return false; i += 1 }
        true
      }
      private def parseOctal(off: Int, len: Int): Long = {
        var v = 0L
        var i = off
        while (i < off + len) {
          val c = payload(i)
          if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
          else if (c != ' ' && c != 0) return v
          i += 1
        }
        v
      }
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos + BlockSize <= payload.length
            && !blockZero(pos)) {
          // verify the header checksum BEFORE trusting the size field: a
          // corrupted size silently mis-frames every later member, which
          // is far worse than a loud reject. Sum over the header with
          // the checksum field read as spaces (the format's rule).
          var sum = 0L
          var ci = pos
          while (ci < pos + BlockSize) {
            sum += (if (ci - pos >= 148 && ci - pos < 156) ' '.toByte
                    else payload(ci)) & 0xff
            ci += 1
          }
          require(parseOctal(pos + 148, 8) == sum,
            s"tar header checksum mismatch at offset $pos — corrupt archive")
          var end = pos
          while (end < pos + 100 && payload(end) != 0) end += 1
          val name = new String(payload, pos, end - pos, UTF_8)
          val size = parseOctal(pos + 124, 12)
          val typeflag = payload(pos + 156)
          val dataStart = pos + BlockSize
          require(dataStart + size <= payload.length,
            s"truncated tar: member $name claims $size bytes past the end")
          require(typeflag != 'L'.toByte && typeflag != 'K'.toByte &&
              typeflag != 'x'.toByte && typeflag != 'g'.toByte,
            s"GNU longname / PAX extension entry (typeflag '${typeflag.toChar}') " +
              "is not supported — the following member's header name is " +
              "truncated; keep member names within 100 bytes")
          val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
          pos = dataStart + padded.toInt
          if (typeflag == '0'.toByte || typeflag == 0) {
            val body = java.util.Arrays.copyOfRange(
              payload, dataStart, dataStart + size.toInt)
            nextRec = (name, body)
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }

  /** Explode a binary tar-payload column into (member_name, body,
    * body_text) rows — batched per partition, blobs never shuffle (the
    * [[Warc.records]] pattern). */
  def members(df: DataFrame, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(payloadCol.as("p")).as[Array[Byte]]
      .mapPartitions(_.flatMap(p => parseAll(p)
        .map { case (n, b) => (n, b, new String(b, UTF_8)) }))
      .toDF("member_name", "body", "body_text")
  }

  /** Write `docs` as WebDataset shards `dir/shard-NNNNN.tar`, one tar
    * per distinct value of `shardCol` (produce it with
    * [[graft.ext.Curation.epochShards]] or `pmod(hash, n)`). Rows are
    * repartitioned BY SHARD so each archive is written by exactly one
    * task, streamed member-by-member (bounded memory), sorted by
    * `nameCol` within the shard for byte determinism. */
  def writeShards(docs: DataFrame, dir: String, shardCol: String,
      nameCol: String, payloadCol: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    // tasks write through the Hadoop FileSystem API so `dir` can be any
    // cluster store (hdfs://, s3a://, file:/) — java.io would silently
    // write executor-local disks on a real cluster. Configuration is not
    // serializable; ship the session's entries and rebuild per task.
    val confEntries: Seq[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.result()
    }
    docs.select(col(shardCol).cast("long"), col(nameCol).cast("string"),
        col(payloadCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .repartition(n, col(shardCol))
      .sortWithinPartitions(col(shardCol), col(nameCol))
      .foreachPartition { (it: Iterator[(Long, String, Array[Byte])]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(conf)
        // write-temp-then-rename (the FileOutputCommitter pattern): a
        // speculative or zombie duplicate attempt must never interleave
        // bytes into a reader-visible file, and a mid-write failure must
        // leave no partial shard-*.tar behind. The temp name does not
        // match readShards' shard-*.tar glob; the rename on close is the
        // atomic commit (per-shard, last-finisher-wins between attempts).
        val attempt = java.util.UUID.randomUUID().toString
        var cur = -1L
        var open = false
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var fin: org.apache.hadoop.fs.Path = null
        def commit(): Unit = if (open) {
          writeTrailer(out); out.close(); open = false
          fs.delete(fin, false)
          require(fs.rename(tmp, fin), s"failed to commit $fin")
        }
        try {
          it.foreach { case (shard, name, body) =>
            require(shard >= 0,
              s"shard ids must be non-negative (use pmod, not hash%%n): $shard")
            if (!open || shard != cur) {
              commit()
              cur = shard
              fin = new org.apache.hadoop.fs.Path(base, f"shard-$shard%05d.tar")
              tmp = new org.apache.hadoop.fs.Path(base,
                f".shard-$shard%05d.tar.$attempt.tmp")
              out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
              open = true
            }
            writeMember(out, name, body)
          }
          commit()
        } finally if (open) {
          out.close()
          fs.delete(tmp, false)
        }
      }
  }

  /** Read a shard directory back as (shard, member_name, body,
    * body_text) — whole-file binary scan + per-partition explode, shard
    * id recovered from the file name. */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shardRe = "shard-(\\d+)\\.tar$".r
    spark.read.format("binaryFile").load(s"$dir/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, payload) =>
        val shard = shardRe.findFirstMatchIn(path)
          .map(_.group(1).toLong).getOrElse(-1L)
        parseAll(payload).map { case (n, b) =>
          (shard, n, b, new String(b, UTF_8))
        }
      })
      .toDF("shard", "member_name", "body", "body_text")
  }
}
