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
  * blocks, archive terminated by two zero blocks. Names over 100 bytes
  * (URL-derived WebDataset keys routinely are) are written as GNU
  * longname ('L') entries — the same bytes GNU tar and Python's tarfile
  * emit, readable everywhere. Headers are written with FIXED
  * mode/uid/gid/mtime (0644/0/0/0), so the same rows always produce
  * byte-identical shards — reruns and task retries are idempotent at
  * the byte level, and round-trip oracles can hash them. The parser
  * additionally reads POSIX prefix-split paths and PAX per-file
  * extended headers (see [[parseAll]]), so third-party shards from any
  * mainstream tar round-trip.
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

  /** Serialize one ustar member header (`nameBytes` ≤ 100 — longer names
    * are split into a GNU longname entry by [[writeMember]]). */
  private def header(nameBytes: Array[Byte], size: Long,
      typeflag: Byte): Array[Byte] = {
    require(nameBytes.length <= 100,
      "tar header name field exceeds 100 bytes")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420L, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0L, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0L, 12), 0, h, 136, 12) // mtime: fixed for determinism
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum blanked for the sum
    h(156) = typeflag
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

  private def writeBody(out: java.io.OutputStream, body: Array[Byte]): Unit = {
    out.write(body)
    val pad = (BlockSize - body.length % BlockSize) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** GNU longname marker — the name GNU tar itself puts on 'L' entries. */
  private val LongLink = "././@LongLink".getBytes(UTF_8)

  /** PAX extended-header member name — Python tarfile's deterministic
    * convention (POSIX's "%d/PaxHeaders.%p/%f" template embeds a PID,
    * which would break byte determinism). */
  private val PaxHeaderName = "././@PaxHeader".getBytes(UTF_8)

  private def blockPadded(n: Long): Long =
    ((n + BlockSize - 1) / BlockSize) * BlockSize

  /** One PAX record `"<len> <key>=<value>\n"` — `<len>` is the DECIMAL
    * byte length of the WHOLE record including its own digits (the
    * self-referential fixpoint: smallest L with digits(L) + rest == L). */
  private def paxRecord(key: String, value: String): Array[Byte] = {
    // the record terminator IS a newline — a value carrying one would
    // silently shift every following record's framing
    require(!value.contains('\n'),
      s"PAX record value contains a newline — unrepresentable: $value")
    val payload = s" $key=$value\n".getBytes(UTF_8)
    var digits = 1
    while ((digits + payload.length).toString.length != digits)
      digits = (digits + payload.length).toString.length
    (digits + payload.length).toString.getBytes(UTF_8) ++ payload
  }

  /** Write one member. Names over the 100-byte ustar field emit a
    * long-name carrier first: a GNU 'L' entry (`format = "gnu"`, the
    * default — what GNU tar and Python tarfile emit by default) or a
    * POSIX PAX 'x' entry with a `path` record (`format = "pax"`, for
    * consumers that reject GNU extensions). Both layouts are
    * byte-deterministic (fixed header fields; the PAX header name is
    * tarfile's constant "././@PaxHeader", not POSIX's PID-bearing
    * template) and both round-trip through [[parseAll]].
    * @return (bytes written, data offset within those bytes) — what a
    *         random-access index needs. */
  private def writeMember(out: java.io.OutputStream, name: String,
      body: Array[Byte], format: String = "gnu"): (Long, Long) = {
    val nameBytes = name.getBytes(UTF_8)
    var pre = 0L
    if (nameBytes.length > 100) {
      // WebDataset keys are frequently URL-derived and exceed the ustar
      // 100-byte name field; the real member follows with the name
      // truncated to the field, which the carrier's override replaces
      if (format == "pax") {
        val rec = paxRecord("path", name)
        out.write(header(PaxHeaderName, rec.length.toLong, 'x'.toByte))
        writeBody(out, rec)
        pre = BlockSize + blockPadded(rec.length.toLong)
      } else {
        // GNU longname: full name NUL-terminated, the GNU layout
        val full = java.util.Arrays.copyOf(nameBytes, nameBytes.length + 1)
        out.write(header(LongLink, full.length.toLong, 'L'.toByte))
        writeBody(out, full)
        pre = BlockSize + blockPadded(full.length.toLong)
      }
      out.write(header(java.util.Arrays.copyOf(nameBytes, 100),
        body.length.toLong, '0'.toByte))
    } else out.write(header(nameBytes, body.length.toLong, '0'.toByte))
    writeBody(out, body)
    val dataOff = pre + BlockSize
    (dataOff + blockPadded(body.length.toLong), dataOff)
  }

  private def writeTrailer(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  private def requireFormat(format: String): Unit =
    require(format == "gnu" || format == "pax",
      s"unknown long-name format '$format' (gnu | pax)")

  /** Serialize members into one in-memory tar archive (tests + the
    * round-trip oracle row; production shards stream via [[writeShards]]).
    * `format` picks the long-name carrier — see [[writeMember]]. */
  def writeAll(members: Seq[(String, Array[Byte])],
      format: String = "gnu"): Array[Byte] = {
    requireFormat(format)
    val out = new ByteArrayOutputStream()
    members.foreach { case (n, b) => writeMember(out, n, b, format) }
    writeTrailer(out)
    out.toByteArray
  }

  /** Parse the PAX extended-header body: a sequence of
    * `"<len> <key>=<value>\n"` records where `<len>` is the DECIMAL byte
    * length of the whole record including its own digits, the space and
    * the trailing newline (POSIX pax(1) layout). Malformed records are a
    * loud reject — a mis-parsed record could silently shift every
    * override. */
  private def paxRecords(body: Array[Byte]): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < body.length) {
      var j = i
      while (j < body.length && body(j) != ' ') j += 1
      require(j < body.length && j > i,
        s"malformed PAX record at offset $i: missing length delimiter")
      val len = new String(body, i, j - i, UTF_8).toInt
      require(len > j - i + 2 && i + len <= body.length && body(i + len - 1) == '\n',
        s"malformed PAX record at offset $i: bad length $len")
      val rec = new String(body, j + 1, i + len - (j + 1) - 1, UTF_8)
      val eq = rec.indexOf('=')
      require(eq > 0, s"malformed PAX record at offset $i: no '=' in '$rec'")
      out += ((rec.substring(0, eq), rec.substring(eq + 1)))
      i += len
    }
    out.result()
  }

  /** Parse a tar archive into its (name, body) members. Accepts the
    * layouts real WebDataset shards arrive in:
    *  - plain ustar/v7 regular files (≤ 100-byte names);
    *  - POSIX ustar long paths split across the `prefix` field (offset
    *    345; applied only under the exact POSIX magic — GNU archives
    *    reuse those bytes for atime/ctime);
    *  - GNU longname ('L') entries (what GNU tar and Python's tarfile
    *    emit for > 100-byte names) — the carried name overrides the
    *    next member's truncated header name;
    *  - PAX per-file extended headers ('x') — `path` and `size` records
    *    override the next member's name/size (the `size` record is how
    *    PAX represents > 8 GiB members; bodies must still fit a JVM
    *    array here).
    * Directories and links are skipped by typeflag ('7'
    * contiguous-file members are read as regular files per POSIX; GNU
    * sparse 'S' members reject loudly — their hole-encoded data region
    * would silently yield wrong bytes); GNU longLINKname ('K') entries
    * are consumed and ignored (they describe a link target). PAX
    * GLOBAL headers ('g') are ignored unless they carry a `path`/`size`
    * override — which would silently apply to EVERY following member,
    * so that one case stays a loud reject. */
  def parseAll(payload: Array[Byte]): Iterator[(String, Array[Byte])] =
    parseMembers(new java.io.ByteArrayInputStream(payload))

  /** The framing core behind [[parseAll]] and [[readShardsStreamed]]:
    * parse tar members off an InputStream with a BOUNDED window — one
    * 512-byte header block plus at most one member body resident at a
    * time — so the ARCHIVE no longer has to fit in memory (members
    * still do: each body becomes one row). Because the in-memory
    * [[parseAll]] is this same code over a ByteArrayInputStream, the
    * two fronts cannot drift: every fuzz/round-trip case in
    * TarShardsSpec exercises this parser. Semantics (checksum-first
    * loud rejects, GNU/PAX/prefix long names, sparse reject, quiet end
    * at the first zero or partial block) are the pre-r16 parseAll's,
    * message-for-message. */
  private def parseMembers(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var pos = 0L // bytes consumed before the current header
      private var nextRec: (String, Array[Byte]) = null
      // pending per-file overrides from a preceding 'L'/'x' entry; they
      // apply to the NEXT member of any type, then clear
      private var overrideName: String = null
      private var overrideSize: Long = -1L
      private val h = new Array[Byte](BlockSize)
      /** Fill `h` with the next header block; false on clean EOF or a
        * partial trailing block (both are the quiet end, matching the
        * array parser's `pos + BlockSize <= length` loop bound). */
      private def readBlock(): Boolean = {
        var off = 0
        while (off < BlockSize) {
          val n = in.read(h, off, BlockSize - off)
          if (n < 0) return false
          off += n
        }
        true
      }
      private def blockZero: Boolean = {
        var i = 0
        while (i < BlockSize) { if (h(i) != 0) return false; i += 1 }
        true
      }
      private def parseOctal(off: Int, len: Int): Long = {
        var v = 0L
        var i = off
        while (i < off + len) {
          val c = h(i)
          if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
          else if (c != ' ' && c != 0) return v
          i += 1
        }
        v
      }
      /** NUL-terminated string field (within the header block). */
      private def strField(off: Int, len: Int): String = {
        var end = off
        while (end < off + len && h(end) != 0) end += 1
        new String(h, off, end - off, UTF_8)
      }
      /** Exact POSIX magic "ustar\0" — required before trusting the
        * prefix field (GNU's "ustar  " stores atime/ctime there). */
      private def posixMagic: Boolean =
        h(257) == 'u' && h(258) == 's' && h(259) == 't' && h(260) == 'a' &&
          h(261) == 'r' && h(262) == 0
      /** Read `size` body bytes (+ block padding) or reject loudly —
        * the stream form of the array parser's bounds require. Grows the
        * buffer WITH the bytes actually read (1 MiB hint, amortized
        * doubling) instead of allocating `size` up front: a corrupt
        * fuzzed size field must reject at EOF, not OOM first. */
      private def readBody(size: Long, rawName: String): Array[Byte] = {
        val out = new ByteArrayOutputStream(
          math.max(64L, math.min(size, 1L << 20)).toInt)
        var left = size
        while (left > 0) {
          val n = in.read(scratch, 0,
            math.min(left, scratch.length.toLong).toInt)
          require(n >= 0,
            s"truncated tar: member $rawName claims $size bytes past the end")
          out.write(scratch, 0, n)
          left -= n
        }
        skipFully(blockPadded(size) - size, rawName, size)
        out.toByteArray
      }
      /** Discard `n` bytes (body of a skipped dir/link member, padding). */
      private def skipFully(n: Long, rawName: String, size: Long): Unit = {
        var left = n
        while (left > 0) {
          val got = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
          require(got >= 0,
            s"truncated tar: member $rawName claims $size bytes past the end")
          left -= got
        }
      }
      private val scratch = new Array[Byte](1 << 16)
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && readBlock() && !blockZero) {
          // verify the header checksum BEFORE trusting the size field: a
          // corrupted size silently mis-frames every later member, which
          // is far worse than a loud reject. Sum over the header with
          // the checksum field read as spaces (the format's rule).
          var sum = 0L
          var ci = 0
          while (ci < BlockSize) {
            sum += (if (ci >= 148 && ci < 156) ' '.toByte else h(ci)) & 0xff
            ci += 1
          }
          require(parseOctal(148, 8) == sum,
            s"tar header checksum mismatch at offset $pos — corrupt archive")
          val rawName = strField(0, 100)
          val headerSize = parseOctal(124, 12)
          val typeflag = h(156)
          val isMeta = typeflag == 'L'.toByte || typeflag == 'K'.toByte ||
            typeflag == 'x'.toByte || typeflag == 'g'.toByte
          // a meta entry's own size is always the header's; a regular
          // member's may carry a PAX size override
          val size =
            if (!isMeta && overrideSize >= 0L) overrideSize else headerSize
          require(size <= Int.MaxValue - BlockSize,
            s"tar member $rawName of $size bytes exceeds the in-memory limit")
          val padded = blockPadded(size)
          if (isMeta) {
            // prefix/name fields are consumed from `h` BEFORE the body
            // read overwrites nothing — the header block is private
            val body = readBody(size, rawName)
            if (typeflag == 'L'.toByte) {
              // GNU longname: body = full name, NUL-terminated
              var end = 0
              while (end < body.length && body(end) != 0) end += 1
              overrideName = new String(body, 0, end, UTF_8)
            } else if (typeflag == 'x'.toByte) {
              paxRecords(body).foreach {
                case ("path", v) => overrideName = v
                case ("size", v) =>
                  val sv = v.toLong // NumberFormatException = loud
                  require(sv >= 0, s"negative PAX size record: $v")
                  overrideSize = sv
                case _ => () // mtime/atime/charset/...: no bearing here
              }
            } else if (typeflag == 'g'.toByte) {
              val global = paxRecords(body).filter {
                case (k, _) => k == "path" || k == "size"
              }
              require(global.isEmpty,
                "PAX global header overrides " +
                  global.map(_._1).mkString(",") +
                  " for all following members — not supported")
            } // 'K' (longlinkname): links are skipped anyway
            pos += BlockSize + padded
          } else {
            // POSIX ustar splits long paths as prefix + '/' + name; a
            // pending 'L'/'x' override wins over both
            val name =
              if (overrideName != null) overrideName
              else if (posixMagic && h(345) != 0)
                strField(345, 155) + "/" + rawName
              else rawName
            // '7' (contiguous) is POSIX-defined as "treat as a regular
            // file"; GNU sparse ('S') members would yield WRONG bytes if
            // read as regular (the data region is hole-encoded), so they
            // reject loudly rather than silently corrupting samples
            require(typeflag != 'S'.toByte,
              s"GNU sparse member $name is not supported")
            if (typeflag == '0'.toByte || typeflag == 0 ||
                typeflag == '7'.toByte) {
              nextRec = (name, readBody(size, rawName))
            } else {
              skipFully(padded, rawName, size) // dir/link body discarded
            }
            pos += BlockSize + padded
            // overrides are per-file: consumed by this member whether it
            // was emitted or skipped (dir/link)
            overrideName = null
            overrideSize = -1L
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }

  /** Gunzip when the gzip magic is present; pass through otherwise. */
  private def gunzipIfNeeded(raw: Array[Byte]): Array[Byte] =
    if (raw.length >= 2 && raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw), 1 << 16)
      try in.readAllBytes() finally in.close()
    } else raw

  /** Explode a binary tar-payload column into (member_name, body,
    * body_text) rows — batched per partition, blobs never shuffle (the
    * [[Warc.records]] pattern). Gzipped payloads are magic-sniffed. */
  def members(df: DataFrame, payloadCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(payloadCol.as("p")).as[Array[Byte]]
      .mapPartitions(_.flatMap(p => parseAll(gunzipIfNeeded(p))
        .map { case (n, b) => (n, b, new String(b, UTF_8)) }))
      .toDF("member_name", "body", "body_text")
  }

  /** Write `docs` as WebDataset shards `dir/shard-NNNNN.tar`, one tar
    * per distinct value of `shardCol` (produce it with
    * [[graft.ext.Curation.epochShards]] or `pmod(hash, n)`). Rows are
    * repartitioned BY SHARD so each archive is written by exactly one
    * task, streamed member-by-member (bounded memory), sorted by
    * `nameCol` within the shard for byte determinism.
    *
    * Commit protocol: each shard streams to a temp name and commits by
    * rename-if-absent — safe under speculative/zombie duplicate
    * attempts because the archives are byte-deterministic (an
    * already-committed shard is the same bytes this attempt would have
    * written). Consequence: write each dataset into a FRESH directory —
    * an existing `shard-NNNNN.tar` from a previous, different dataset
    * may be kept as-is on stores whose rename refuses existing targets
    * (HDFS) rather than replaced.
    *
    * `gzip = true` writes the `.tar.gz` WebDataset variant
    * (`shard-NNNNN.tar.gz`, one gzip stream per shard, still streamed
    * member-by-member through the Deflater — bounded memory).
    * Determinism: the gzip header is constant (MTIME 0) and the
    * Deflater level is PINNED (level 6) rather than left at the JDK's
    * default constant — but deflate output is only specified up to the
    * zlib implementation, so `.tar.gz` byte identity is scoped to ONE
    * JVM/zlib build. Within one Spark job that always holds (executors
    * share the JVM image), which is what the rename-if-absent commit's
    * "another attempt wrote identical bytes" argument needs; a re-run
    * on a DIFFERENT JDK image may produce different (equally valid)
    * compressed bytes for the same rows. The plain-tar layout is
    * unconditionally byte-deterministic — pin cross-environment hashes
    * to it, or to the decompressed stream. [[readShards]] sniffs the
    * gzip magic per file and reads both layouts, mixed freely.
    *
    * `index = true` additionally writes a `shard-NNNNN.idx` sidecar per
    * shard — one `name<TAB>offset<TAB>size` line per member, offsets
    * addressing the member's DATA in the (uncompressed) tar stream — so
    * external loaders (the wids-style random-access pattern) can fetch
    * one sample with a ranged read instead of scanning the archive.
    * Written streamed alongside the tar and committed with the same
    * rename-if-absent protocol; deterministic like the archives. */
  /** Tasks read/write through the Hadoop FileSystem API so shard dirs
    * can live on any cluster store (hdfs://, s3a://, file:/) — java.io
    * would silently hit executor-local disks on a real cluster.
    * Configuration is not serializable; ship the session's entries and
    * rebuild per task. */
  private def hadoopConfEntries(spark: SparkSession): Seq[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val buf = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.result()
  }

  private def rebuildConf(entries: Seq[(String, String)]) = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  def writeShards(docs: DataFrame, dir: String, shardCol: String,
      nameCol: String, payloadCol: String, gzip: Boolean = false,
      index: Boolean = false, format: String = "gnu"): Unit = {
    requireFormat(format)
    val spark = docs.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val confEntries = hadoopConfEntries(spark)
    docs.select(col(shardCol).cast("long"), col(nameCol).cast("string"),
        col(payloadCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .repartition(n, col(shardCol))
      .sortWithinPartitions(col(shardCol), col(nameCol))
      .foreachPartition { (it: Iterator[(Long, String, Array[Byte])]) =>
        val conf = rebuildConf(confEntries)
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(conf)
        // write-temp-then-rename (the FileOutputCommitter pattern): a
        // speculative or zombie duplicate attempt must never interleave
        // bytes into a reader-visible file, and a mid-write failure must
        // leave no partial shard-*.tar behind. The temp name does not
        // match readShards' shard-*.tar glob; the rename on close is the
        // commit.
        val attempt = java.util.UUID.randomUUID().toString
        var cur = -1L
        var open = false
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var fin: org.apache.hadoop.fs.Path = null
        var idxOut: java.io.OutputStream = null
        var idxTmp: org.apache.hadoop.fs.Path = null
        var idxFin: org.apache.hadoop.fs.Path = null
        var off = 0L
        // NEVER delete the final path from a task: delete-then-rename
        // is last-finisher-wins — a zombie duplicate attempt could
        // delete an already-committed shard and die before its own
        // rename, losing the shard while the job reports success.
        // Rename-if-absent instead: archives are byte-deterministic,
        // so a shard already committed by a concurrent attempt of the
        // same job carries IDENTICAL bytes — "another attempt won" is
        // success, drop our temp. (Flip side: a stale shard file from
        // a different dataset is treated the same way on stores whose
        // rename refuses existing targets — hence the fresh-directory
        // contract in the scaladoc.)
        def commitOne(t: org.apache.hadoop.fs.Path,
            f: org.apache.hadoop.fs.Path): Unit =
          if (!fs.rename(t, f)) {
            require(fs.exists(f),
              s"failed to commit $f and no other attempt has")
            fs.delete(t, false)
          }
        def commit(): Unit = if (open) {
          writeTrailer(out)
          // hand off before close/commit so a failure in either leaves
          // the field null and the finally block does not double-close
          val o = out; out = null; open = false
          o.close()
          commitOne(tmp, fin)
          tmp = null // committed (or ceded to the winning attempt)
          if (idxOut != null) {
            val io = idxOut; idxOut = null
            io.close(); commitOne(idxTmp, idxFin)
            idxTmp = null
          }
        }
        try {
          it.foreach { case (shard, name, body) =>
            require(shard >= 0,
              s"shard ids must be non-negative (use pmod, not hash%%n): $shard")
            // the idx sidecar is line/tab-delimited: a name carrying a
            // tab or newline would silently corrupt the whole shard's
            // index for external consumers — loud reject instead
            require(!index ||
                (name.indexOf('\t') < 0 && name.indexOf('\n') < 0 &&
                 name.indexOf('\r') < 0),
              "member name contains tab/newline — unrepresentable in " +
                s"the .idx sidecar: $name")
            if (!open || shard != cur) {
              commit()
              cur = shard
              off = 0L
              val ext = if (gzip) "tar.gz" else "tar"
              fin = new org.apache.hadoop.fs.Path(base, f"shard-$shard%05d.$ext")
              tmp = new org.apache.hadoop.fs.Path(base,
                f".shard-$shard%05d.$ext.$attempt.tmp")
              // `out` is assigned the RAW stream first so that a throw
              // from the gzip wrap (header write) or the idx create
              // below still reaches the finally block's close — keying
              // cleanup on `open` alone leaked the stream (and gzip's
              // native Deflater) on exactly those paths
              out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
              // GZIPOutputStream's close() releases the native Deflater
              // (the Warc lesson); header constant (MTIME 0) and level
              // pinned to 6 (zlib's default, stated explicitly) so byte
              // determinism rides the pinned level, not a JDK default —
              // scope of the guarantee is per-JVM/zlib build (scaladoc)
              if (gzip)
                out = new java.util.zip.GZIPOutputStream(out, 1 << 16) {
                  `def`.setLevel(6)
                }
              if (index) {
                idxFin = new org.apache.hadoop.fs.Path(base, f"shard-$shard%05d.idx")
                idxTmp = new org.apache.hadoop.fs.Path(base,
                  f".shard-$shard%05d.idx.$attempt.tmp")
                idxOut = new java.io.BufferedOutputStream(
                  fs.create(idxTmp, true), 1 << 16)
              }
              open = true
            }
            val (written, dataOff) = writeMember(out, name, body, format)
            if (idxOut != null)
              idxOut.write(
                s"$name\t${off + dataOff}\t${body.length}\n".getBytes(UTF_8))
            off += written
          }
          commit()
        } finally {
          // abandoned-attempt cleanup; close() may throw on an already
          // -failed stream — never mask the original exception with it.
          // out/idxOut are nulled at commit-handoff and tmp/idxTmp after
          // their renames, so ANY non-null field here is an uncommitted
          // leftover — including a shard whose OPEN failed halfway (gzip
          // header, idx create) or whose commit threw mid-sequence (the
          // paths the old flag-keyed cleanup leaked).
          if (out != null) {
            try out.close() catch { case _: java.io.IOException => () }
          }
          if (tmp != null) fs.delete(tmp, false)
          if (idxOut != null) {
            try idxOut.close() catch { case _: java.io.IOException => () }
          }
          if (idxTmp != null) fs.delete(idxTmp, false)
        }
      }
  }

  /** Read a shard directory back as (shard, member_name, body,
    * body_text) — whole-file binary scan + per-partition explode, shard
    * id recovered from the file name. Reads both the plain `.tar` and
    * the gzipped `.tar.gz` layouts (magic-sniffed per file, so a mixed
    * directory works). */
  /** Shard id recovered from a `shard-NNNNN.{tar,tar.gz,idx}` file name
    * (−1 when the name does not match — shared by every reader so the
    * naming rule lives in one place). */
  private val ShardFileRe = "shard-(\\d+)\\.(?:tar(?:\\.gz)?|idx)$".r
  private def shardIdOf(path: String): Long =
    ShardFileRe.findFirstMatchIn(path).map(_.group(1).toLong).getOrElse(-1L)

  /** Whole-file binary scan of a shard directory's archives — the shared
    * front of every archive reader (one task per file; the per-reader
    * mapPartitions stays at the call site so no extra serialization
    * boundary enters the plan). */
  private def shardFiles(spark: SparkSession,
      dir: String): org.apache.spark.sql.Dataset[(String, Array[Byte])] =
    shardFilesAt(spark, listShardFiles(spark, dir, "shard-*.tar*"))

  /** Expand a top-level shard glob to its EXPLICIT file list — the
    * shared front of the directory readers, fixing two hazards at
    * once: (a) a glob IN the load path makes DataSource resolution
    * stat the literal string for a (never-present) streaming-sink
    * metadata dir, throwing-and-logging a FileNotFoundException WARN
    * stack per read that buries real fetch failures; (b) a bare
    * directory load with a pathGlobFilter silently returns EMPTY for a
    * wrong/failed store (and partition discovery could pick up nested
    * key=value matches the top-level glob never meant). Explicit
    * existing-file paths produce no probe noise, no discovery, and an
    * empty match LOUD-REJECTS — the store-reader convention (a missing
    * store is a bug, not an empty corpus).
    *
    * Day-0/bootstrap consumers: the loud-reject is deliberate on the
    * READ side, so a pipeline that may legitimately start before any
    * shard exists must write first (the daily loop's natural order —
    * day 1 ships its own shards before any readback) or probe
    * existence itself (`FileSystem.globStatus` on `dir/shard-*.tar*`)
    * and branch; silently reading an absent store as an empty corpus
    * is exactly the failure mode this guard closed in r17. */
  private def listShardFiles(spark: SparkSession, dir: String,
      pattern: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$pattern")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
    require(hits.nonEmpty,
      s"no $pattern files under $dir — wrong store path, or the shard " +
        "write failed; a reader returning an empty frame here would " +
        "report an empty-but-'successful' run")
    hits
  }

  /** [[shardFiles]] over explicit paths/globs (the mixed-store fallback
    * reads a subset of a directory's archives). */
  private def shardFilesAt(spark: SparkSession,
      paths: Seq[String]): org.apache.spark.sql.Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
  }

  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardFiles(spark, dir)
      .mapPartitions(_.flatMap { case (path, raw) =>
        val shard = shardIdOf(path)
        parseAll(gunzipIfNeeded(raw)).map { case (n, b) =>
          (shard, n, b, new String(b, UTF_8))
        }
      })
      .toDF("shard", "member_name", "body", "body_text")
  }

  /** STREAMING shard read — [[readShardsBinary]] without the
    * whole-archive materialization: each task opens its archives as
    * Hadoop streams and parses members off a bounded window (one header
    * block + one member body resident at a time — [[parseMembers]]),
    * lifting [[readShards]]'s 2 GiB/archive JVM-array cap for
    * THIRD-PARTY stores (this library's own [[writeShards]] convention
    * is 16 KB–1 GB shards, where the whole-file scan is fine; a 10 GB
    * WebDataset shard from elsewhere needs this path). Members still
    * become individual rows, so each BODY must fit in memory — only the
    * archive bound is lifted. Gzipped shards are magic-sniffed and
    * stream through GZIPInputStream (decompression is inherently
    * sequential, which is exactly what this reader does). Returns
    * (shard, member_name, body); results are byte-identical to
    * [[readShardsBinary]] by construction — both fronts run the SAME
    * [[parseMembers]] core.
    *
    * Scale shape: the file listing (one glob, one row per shard — the
    * shard count, not the corpus) distributes over the session's
    * parallelism; bodies never shuffle; one open stream per task at a
    * time, closed on exhaustion and again on task completion (covers
    * abandonment mid-iteration). */
  def readShardsStreamed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val confEntries = hadoopConfEntries(spark)
    // listShardFiles loud-rejects an EMPTY match — a missing/failed
    // store must not read back as an empty corpus (shared convention)
    val files = listShardFiles(spark, dir, "shard-*.tar*")
    val n = math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, files.length))
    spark.createDataset(files).repartition(n)
      .mapPartitions { paths =>
        val conf = rebuildConf(confEntries)
        var cur: java.io.InputStream = null
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (cur != null) cur.close()))
        paths.flatMap { p =>
          val shard = shardIdOf(p)
          val hp = new org.apache.hadoop.fs.Path(p)
          val buf = new java.io.BufferedInputStream(
            hp.getFileSystem(conf).open(hp), 1 << 16)
          // track the RAW stream immediately: a corrupt gzip header
          // makes the GZIPInputStream constructor throw below, and the
          // task-completion listener must still find something to close
          cur = buf
          // gzip magic sniff without consuming the stream
          buf.mark(2)
          val b0 = buf.read(); val b1 = buf.read()
          buf.reset()
          val in: java.io.InputStream =
            if (b0 == 0x1f && b1 == 0x8b)
              new java.util.zip.GZIPInputStream(buf, 1 << 16)
            else buf
          cur = in
          val members = parseMembers(in)
          new Iterator[(Long, String, Array[Byte])] {
            override def hasNext: Boolean = {
              val more = members.hasNext
              if (!more && cur != null) { cur.close(); cur = null }
              more
            }
            override def next(): (Long, String, Array[Byte]) = {
              val (nm, b) = members.next()
              (shard, nm, b)
            }
          }
        }
      }
      .toDF("shard", "member_name", "body")
  }

  /** [[readShards]] without the `body_text` column — for BINARY
    * modalities (images, audio, packed tensors), where decoding every
    * blob to a UTF-8 String inside the parse task is pure waste: the
    * decode copies each payload (with replacement-char churn on invalid
    * bytes) before Catalyst can prune it, since column pruning cannot
    * reach inside `mapPartitions`. Same files, same framing, bodies
    * byte-identical; returns (shard, member_name, body). */
  def readShardsBinary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardFiles(spark, dir)
      .mapPartitions(_.flatMap { case (path, raw) =>
        val shard = shardIdOf(path)
        parseAll(gunzipIfNeeded(raw)).map { case (n, b) => (shard, n, b) }
      })
      .toDF("shard", "member_name", "body")
  }

  /** WebDataset SAMPLE writer — the multi-part form of [[writeShards]]:
    * each row is one sample (a key plus one binary payload per part),
    * written as members `<key>.<ext>` so any WebDataset loader
    * reassembles the sample from adjacent members sharing the key
    * prefix. `parts` maps extension → column (e.g. `Seq("jpg" -> "img",
    * "json" -> "meta", "txt" -> "caption")`). ADJACENCY — the loader
    * contract — follows from [[writeShards]]'s within-shard name sort:
    * all `<key>.*` members are consecutive (keys cannot contain '.',
    * so every other key's members differ from this key's `<key>.`
    * prefix before the dot and sort entirely before or after it —
    * nothing can interleave). Null parts are skipped
    * (optional modalities); a sample whose parts are ALL null vanishes.
    * Keys must not contain '.' (it delimits the extension on re-read —
    * loudly enforced map-side) and must be unique per shard. */
  def writeSampleShards(docs: DataFrame, dir: String, shardCol: String,
      keyCol: String, parts: Seq[(String, String)], gzip: Boolean = false,
      index: Boolean = false, format: String = "gnu"): Unit = {
    require(parts.nonEmpty, "need at least one (extension, column) part")
    require(parts.map(_._1).distinct.size == parts.size,
      "part extensions must be distinct: " + parts.map(_._1).mkString(", "))
    // readSampleShards splits on the LAST '.', so a dotted extension
    // ("tar.gz") would re-read with part of itself folded into the key
    require(parts.forall { case (e, _) => e.nonEmpty && !e.contains(".") },
      "part extensions must be non-empty and contain no '.': " +
        parts.map(_._1).mkString(", "))
    val key = col(keyCol).cast("string")
    val melted = docs
      .select(col(shardCol),
        when(key.isNull,
          raise_error(lit("sample key is null — null parts are skipped " +
            "but a null KEY is a data bug")))
          .when(key.contains("."), raise_error(concat(
            lit("sample key contains '.' (reserved as the extension " +
              "delimiter): "), key)))
          .otherwise(key).as("__k"),
        explode(filter(
          array(parts.map { case (ext, c) =>
            struct(lit(ext).as("ext"), col(c).cast("binary").as("body"))
          }: _*),
          s => s.getField("body").isNotNull)).as("__m"))
      .select(col(shardCol),
        concat(col("__k"), lit("."), col("__m.ext")).as("__name"),
        col("__m.body").as("__payload"))
    writeShards(melted, dir, shardCol, "__name", "__payload", gzip, index,
      format)
  }

  /** Split a `<key>.<ext>` member name at the LAST dot. A member without
    * one cannot carry a sample key — a third-party shard not following
    * the WebDataset convention must fail loudly, not collapse onto the
    * "" sample. */
  private def splitKeyExt(name: String, src: String): (String, String) = {
    val dot = name.lastIndexOf('.')
    require(dot >= 0 && dot < name.length - 1,
      s"member name has no <key>.<ext> form: $name (in $src)")
    (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Fold a shard's member stream into samples by grouping ADJACENT
    * members sharing the key prefix — ZERO shuffle: [[writeShards]]
    * sorts members by name within the shard, so all `<key>.*` members
    * are consecutive (see [[writeSampleShards]]'s adjacency proof) and
    * one pass over the parse iterator reassembles every sample. A
    * third-party shard violating adjacency (a key recurring after its
    * group closed) or carrying duplicate `<key>.<ext>` members is a
    * loud reject — silently emitting two half-samples for one key (or
    * dropping a part) would corrupt downstream pairing; such shards can
    * still be read via [[readShards]] + an explicit groupBy. */
  private def adjacentSamples(shard: Long,
      members: Iterator[(String, Array[Byte])],
      src: String): Iterator[(Long, String, Map[String, Array[Byte]])] =
    new Iterator[(Long, String, Map[String, Array[Byte]])] {
      private val it = members.buffered
      // closed-group keys, for the non-adjacency loud reject; bounded by
      // the shard's key bytes (far below the archive payload already in
      // memory on this task)
      private val seen = new scala.collection.mutable.HashSet[String]
      override def hasNext: Boolean = it.hasNext
      override def next(): (Long, String, Map[String, Array[Byte]]) = {
        val (n0, b0) = it.next()
        val (key, ext0) = splitKeyExt(n0, src)
        require(seen.add(key),
          s"sample key $key recurs non-adjacently in $src — not a " +
            "writeSampleShards layout; read it with readShards and group " +
            "explicitly")
        val parts = scala.collection.mutable.LinkedHashMap(ext0 -> b0)
        while (it.hasNext && splitKeyExt(it.head._1, src)._1 == key) {
          val (n, b) = it.next()
          val ext = splitKeyExt(n, src)._2
          require(!parts.contains(ext),
            s"duplicate sample part $key.$ext in $src")
          parts += ext -> b
        }
        (shard, key, parts.toMap)
      }
    }

  /** Read sample shards back grouped per sample: (shard, key, parts:
    * map<ext, binary>). Shuffle-FREE: each archive is parsed
    * sequentially in one task and samples reassemble by folding
    * ADJACENT members there (the writer's within-shard name sort
    * guarantees adjacency — see [[writeSampleShards]]), so the corpus's
    * binary bodies never ride an exchange. Shards violating the
    * `<key>.<ext>` adjacency convention reject loudly (see
    * [[adjacentSamples]]). */
  def readSampleShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardFiles(spark, dir)
      .mapPartitions(_.flatMap { case (path, raw) =>
        adjacentSamples(shardIdOf(path), parseAll(gunzipIfNeeded(raw)), path)
      })
      .toDF("shard", "key", "parts")
  }

  /** Validated (name, off, len) projection over a split `.idx` line
    * (columns `path`, `line`, `f`). Each column is self-defensive — the
    * long cast lives in the otherwise branch — so the designed
    * "malformed" message fires whichever column a fused projection
    * evaluates first, never an opaque ANSI cast error. Evaluation is
    * Catalyst-lazy by design: the NAME check runs for every line (the
    * join key derives from it, so a line that could hide a requested
    * key always rejects loudly), while off/len of entries the fetch
    * never selects may go unevaluated — a corrupt offset on an
    * unrequested entry cannot affect the result. */
  private def idxEntryCols: Seq[Column] = {
    def bad = raise_error(concat(
      lit("malformed .idx line in "), col("path"), lit(": "), col("line")))
    def num(i: Int) =
      when(size(col("f")) =!= 3 ||
          !element_at(col("f"), i).rlike("^\\d+$"), bad)
        .otherwise(element_at(col("f"), i).cast("long"))
    Seq(col("path"),
      when(size(col("f")) =!= 3 ||
          !element_at(col("f"), 1).rlike("^.*\\.[^.]+$"), bad)
        .otherwise(element_at(col("f"), 1)).as("name"),
      num(2).as("off"), num(3).as("len"))
  }

  /** RANGED-read sample fetch — the engine-side consumer of the `.idx`
    * sidecars [[writeShards]]`(index = true)` emits: fetch the samples
    * named in `keys` (a single-column DataFrame of sample keys) from a
    * shard store by seeking straight to each member's data bytes,
    * instead of scanning whole archives the way [[readShards]] /
    * [[readSampleShards]] do. The use case is sampled probes over a
    * large shard store (QA spot-checks, decontamination audits): cost is
    * ∝ the `.idx` sidecar scan (tens of bytes per member — orders of
    * magnitude below the corpus) + the FETCHED bytes, not the corpus.
    *
    * Scale shape: sidecars scan distributed, entries semi-join the
    * (bounded, broadcast) key set, matches repartition BY ARCHIVE so one
    * task serves each archive's fetches through ONE open stream with
    * positioned reads in ascending offset order; sample parts stay
    * adjacent under the writer's name sort, so samples fold with zero
    * shuffle, same as [[readSampleShards]]. Bodies never ride an
    * exchange.
    *
    * Plain-`.tar` layout only: the sidecar offsets address the
    * UNCOMPRESSED tar stream, so a `.tar.gz` store rejects loudly
    * (gzip admits no ranged reads without a decompression index — read
    * those with [[readSampleShards]]). Returns (shard, key, parts) like
    * [[readSampleShards]], restricted to the requested keys; requested
    * keys absent from the store simply return no row.
    *
    * MIXED stores (sidecars for some shards only — e.g. a store whose
    * early shards predate `index = true`): shards WITHOUT a `.idx` fall
    * back to a full scan of just those archives, filtered to the
    * requested keys — with a loud stderr note, because silently
    * fetching nothing from them would read as "key absent" (data loss
    * masquerading as a miss). Fetch cost for the un-indexed shards is ∝
    * their bytes, not the fetched bytes; re-index the store to get the
    * ranged path everywhere. */
  def fetchSamples(spark: SparkSession, dir: String, keys: DataFrame): DataFrame = {
    import spark.implicits._
    require(keys.columns.length == 1,
      "keys must be a single-column DataFrame of sample keys; got " +
        keys.columns.mkString(", "))
    require(!keys.isStreaming, "keys must be a bounded batch frame")
    // mixed-store detection: one driver-side glob, bounded by the SHARD
    // count (one status per file, never corpus data)
    val globPath = new org.apache.hadoop.fs.Path(s"$dir/shard-*")
    val fsd = globPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = Option(fsd.globStatus(globPath)).getOrElse(Array.empty)
      .map(_.getPath.toString)
    val idxFiles = all.filter(_.endsWith(".idx"))
    val idxShards = idxFiles.map(shardIdOf).toSet
    val unindexed = all.filter(p =>
      (p.endsWith(".tar") || p.endsWith(".tar.gz")) &&
        !idxShards.contains(shardIdOf(p)))
    val fallback: Option[DataFrame] =
      if (unindexed.isEmpty) None
      else {
        System.err.println(s"[graft-tar] fetchSamples: ${unindexed.length} " +
          s"of ${all.count(p => p.endsWith(".tar") || p.endsWith(".tar.gz"))} " +
          s"shards in $dir have no .idx sidecar — falling back to a full " +
          "scan of those shards (cost ∝ their bytes, not the fetched " +
          "bytes); rewrite or re-index the store for ranged fetch")
        val scanned = shardFilesAt(spark, unindexed.toSeq)
          .mapPartitions(_.flatMap { case (path, raw) =>
            adjacentSamples(shardIdOf(path), parseAll(gunzipIfNeeded(raw)), path)
          })
          .toDF("shard", "key", "parts")
        Some(scanned.join(
          broadcast(keys.select(col(keys.columns.head).cast("string").as("key"))
            .distinct()),
          Seq("key"), "left_semi")
          .select("shard", "key", "parts"))
      }
    // a store with NO sidecars at all (every shard predates index=true,
    // or an empty directory) must not die on the `.idx` glob below —
    // PATH_NOT_FOUND at plan time is exactly the opaque failure the
    // fallback exists to replace
    if (idxFiles.isEmpty)
      return fallback.getOrElse(
        Seq.empty[(Long, String, Map[String, Array[Byte]])]
          .toDF("shard", "key", "parts"))
    val confEntries = hadoopConfEntries(spark)
    val n = spark.sessionState.conf.numShufflePartitions
    val nameRe = "^(.*)\\.([^.]+)$"
    // the sidecars are line/tab-delimited (name, data offset, size); a
    // malformed line — wrong field count, non-numeric offset/size, or a
    // member name without the <key>.<ext> sample form — means a corrupt
    // or non-sample index that could silently miss requested keys: loud
    // reject with the designed message, never skip (and never an opaque
    // cast error)
    // explicit file list (the already-listed sidecars, non-empty past
    // the guard above), not a glob path — the listShardFiles rationale:
    // no spurious FileNotFoundException WARN, no silent empty store,
    // no nested partition-discovery pickup
    val entries = spark.read.format("binaryFile")
      .load(idxFiles.sorted.toIndexedSeq: _*)
      .select(col("path"),
        explode(split(col("content").cast("string"), "\n")).as("line"))
      .where(col("line") =!= "")
      .select(col("path"), col("line"), split(col("line"), "\t").as("f"))
      .select(idxEntryCols: _*)
      .withColumn("key", regexp_extract(col("name"), nameRe, 1))
      .withColumn("ext", regexp_extract(col("name"), nameRe, 2))
    val wanted = entries.join(
      broadcast(keys.select(col(keys.columns.head).cast("string").as("key"))
        .distinct()),
      Seq("key"), "left_semi")
    val ranged = wanted
      .repartition(n, col("path"))
      .sortWithinPartitions(col("path"), col("off"))
      .select(col("path"), col("key"), col("ext"), col("off"), col("len"))
      .as[(String, String, String, Long, Long)]
      .mapPartitions { rows =>
        val conf = rebuildConf(confEntries)
        val it = rows.buffered
        new Iterator[(Long, String, Map[String, Array[Byte]])] {
          private var curPath: String = null
          private var curShard = -1L
          private var in: org.apache.hadoop.fs.FSDataInputStream = null
          // non-adjacency guard per archive, same contract as
          // readSampleShards (dotted keys could defeat the name-sort
          // grouping — loud, never two half-samples for one key)
          private var seen = new scala.collection.mutable.HashSet[String]
          // close on task end too — covers abandonment mid-iteration
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => if (in != null) in.close()))
          private def ensureOpen(path: String): Unit = if (path != curPath) {
            if (in != null) { in.close(); in = null }
            curPath = path
            seen = new scala.collection.mutable.HashSet[String]
            curShard = shardIdOf(path)
            val idx = new org.apache.hadoop.fs.Path(path)
            val fs = idx.getFileSystem(conf)
            val base = path.stripSuffix(".idx")
            val tar = new org.apache.hadoop.fs.Path(base + ".tar")
            if (!fs.exists(tar)) {
              val gz = new org.apache.hadoop.fs.Path(base + ".tar.gz")
              require(!fs.exists(gz),
                s"$gz is gzipped: .idx offsets address the UNCOMPRESSED " +
                  "stream, so ranged fetch needs the plain .tar layout — " +
                  "read gzip stores with readSampleShards")
            }
            in = fs.open(tar) // absent plain tar: loud FileNotFound
          }
          private def fetch(off: Long, len: Long): Array[Byte] = {
            require(len >= 0 && len <= Int.MaxValue - 8,
              s"member of $len bytes exceeds the in-memory limit")
            val buf = new Array[Byte](len.toInt)
            in.readFully(off, buf) // positioned read — no seek state
            buf
          }
          override def hasNext: Boolean = {
            val more = it.hasNext
            if (!more && in != null) { in.close(); in = null }
            more
          }
          override def next(): (Long, String, Map[String, Array[Byte]]) = {
            val (path0, key, ext0, off0, len0) = it.next()
            ensureOpen(path0)
            require(seen.add(key),
              s"sample key $key recurs non-adjacently in the index of " +
                s"$path0 — not a writeSampleShards layout")
            val parts = scala.collection.mutable.LinkedHashMap(
              ext0 -> fetch(off0, len0))
            // parts of one sample are offset-adjacent within the archive
            // (writer name sort) — fold them without cross-row state
            while (it.hasNext && it.head._1 == path0 && it.head._2 == key) {
              val (_, _, ext, off, len) = it.next()
              require(!parts.contains(ext),
                s"duplicate sample part $key.$ext in ${path0}")
              parts += ext -> fetch(off, len)
            }
            (curShard, key, parts.toMap)
          }
        }
      }
      .toDF("shard", "key", "parts")
    fallback.map(ranged.unionByName(_)).getOrElse(ranged)
  }
}
