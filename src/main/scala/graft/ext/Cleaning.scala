package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression (Spark has no
  * builtin; a Scala UDF would box every row and fall out of whole-stage
  * codegen). `java.text.Normalizer` NFC agrees with DuckDB's
  * `nfc_normalize` (utf8proc) on the stable Unicode composition set, so
  * normalized text oracle-checks by md5. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${dt.sql}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and nearly all
    // real text is already NFC — skip the allocation for it
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  protected override def nullSafeEval(v: Any): Any =
    normalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftNfc", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, v => s"$self.normalize($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Text-cleaning operators for pretraining-corpus curation — the two
  * canonical pre-dedup cleaning stages of a web-scale pipeline:
  *
  *  - [[c4Clean]] — the C4 line/page heuristics (Raffel et al. 2020,
  *    "Exploring the Limits of Transfer Learning…", §2.2): keep a line
  *    iff it ends in a terminal punctuation mark, has at least five
  *    words, and does not mention javascript; drop the whole page if
  *    fewer than three lines survive or the raw page contains a curly
  *    brace (code markup) or the phrase "lorem ipsum" (placeholder
  *    boilerplate).
  *  - [[redactPii]] — rule-based PII redaction (the Dolma / BigScience
  *    ROOTS practice): replace email addresses, North-American-style
  *    phone numbers and IPv4 addresses with typed placeholder tokens,
  *    reporting per-document match counts.
  *
  * Scale design (100 TB): both operators are pure per-row projections —
  * higher-order array functions and `regexp_replace` over the text
  * column, no shuffle, no UDFs, fully codegen'd — so they scale with
  * the scan and compose for free ahead of [[Dedup]] / [[CorpusFilters]]
  * stages. Regexes stay inside the Java∩RE2 common subset (no
  * lookaround, no backreferences) so a DuckDB oracle evaluates the
  * SAME patterns, and the cleaned/redacted strings are compared by md5
  * across engines.
  */
object Cleaning {

  /** Email, phone, IPv4 — the portable (Java ∩ RE2) patterns. Groups are
    * avoided so `regexp_extract_all(…, 0)` works identically in Spark
    * and DuckDB. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** C4 keep-this-line predicate over a line Column (a lambda variable
    * from `filter(lines, …)`): terminal punctuation + ≥5 words + no
    * "javascript" mention. Word count uses single-space splitting — the
    * same contract as [[TextOps.tokens]]. */
  private def keepLine(l: Column): Column = {
    // test the RIGHT-TRIMMED line: raw web lines end in "\r" (CRLF pages
    // — ControlRe deliberately preserves \r) or trailing spaces, and the
    // C4 reference strips each line before testing; on the raw bytes a
    // CRLF page lost EVERY line (terminal char was '\r') and the whole
    // page was dropped (r13 review). Kept lines keep their original
    // bytes — only the predicate trims.
    val lt = rtrim(l, " \t\r")
    substring(lt, -1, 1).isin(".", "!", "?", "\"") &&
      size(split(lt, " ")) >= 5 &&
      !lower(l).contains("javascript")
  }

  /** C4 line+page filter. One row per input row:
    * (idCol, n_lines, n_kept, page_keep 0/1, clean_text) where
    * clean_text is the surviving lines re-joined with '\n' for kept
    * pages and the empty string for dropped pages. Map-only. */
  /** Append `n_lines`, `n_kept`, `page_keep`, `clean_text` to every row,
    * preserving all other columns — a stateless projection, so it is
    * streaming-safe and composes inside any gate. Lines and kept-lines
    * are materialized once as attributes so the per-line lambda work is
    * not re-inlined per consumer (the CorpusFilters `_toks` lesson). */
  def withC4Columns(df: DataFrame, textCol: String = "text"): DataFrame = {
    val staged = df
      .withColumn("_lines", split(col(textCol), "\n"))
      .withColumn("_kept", filter(col("_lines"), keepLine _))
    val pageKeep = size(col("_kept")) >= 3 &&
      !lower(col(textCol)).contains("lorem ipsum") &&
      !col(textCol).contains("{")
    staged
      .withColumn("n_lines", size(col("_lines")))
      .withColumn("n_kept", size(col("_kept")))
      .withColumn("page_keep", pageKeep.cast("int"))
      .withColumn("clean_text",
        when(pageKeep, array_join(col("_kept"), "\n")).otherwise(lit("")))
      .drop("_lines", "_kept")
  }

  def c4Clean(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    withC4Columns(docs, textCol)
      .select(col(idCol), col("n_lines"), col("n_kept"), col("page_keep"),
        col("clean_text"))

  /** Unicode NFC normalization of a string column (see [[NfcNormalize]]). */
  def nfc(c: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Control characters to strip in [[fixText]]: C0 minus \t\n\r, plus
    * DEL. Hex escapes parse identically in Java and RE2 regexes. */
  val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** ftfy/Dolma-style text fixing: strip control characters, collapse
    * space/tab runs to one space, trim, then NFC-normalize LAST.
    * Map-only, fully codegen'd; DuckDB mirrors it with
    * `regexp_replace(..., 'g')` + `nfc_normalize` in the same order.
    *
    * NFC must run last for idempotence: a control char sitting between
    * a base letter and a combining mark (e.g. `O` + BEL + U+0301)
    * blocks composition, and stripping it AFTER normalizing leaves a
    * newly-adjacent base+mark pair that a second pass would compose —
    * so nfc-first breaks `fixText(fixText(x)) == fixText(x)`. With NFC
    * last, a second pass finds no controls, no space runs, nothing to
    * trim, and NFC itself is idempotent. */
  def fixText(c: Column): Column =
    nfc(trim(regexp_replace(regexp_replace(c, ControlRe, ""), "[ \\t]+", " ")))

  /** Rule-based PII redaction. One row per input row:
    * (idCol, n_emails, n_phones, n_ips, redacted) with matches replaced
    * by [EMAIL] / [PHONE] / [IP] in that order. Map-only. */
  /** Plain-text extraction from raw HTML (the trafilatura-lite step a
    * web pipeline runs before any line heuristics): drop script/style
    * blocks and comments (dotall non-greedy — `(?s)` is in the Java∩RE2
    * subset), drop remaining tags, THEN decode the common entities
    * (decoding last so `&lt;p&gt;` cannot materialize a strippable
    * tag), collapse whitespace, trim. Map-only, codegen'd. */
  def stripHtml(t: Column): Column = {
    // (?i): <SCRIPT>/<Style> blocks are ubiquitous in older web pages —
    // case-sensitive matching leaked their JS/CSS payload into the
    // extracted text (r13 review)
    val noBlocks = regexp_replace(t,
      "(?is)(<script\\b.*?</script>|<style\\b.*?</style>|<!--.*?-->)", "")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(noTags, "&nbsp;", " "),
                "&quot;", "\""),
              "&#39;", "'"),
            "&lt;", "<"),
          "&gt;", ">"),
        "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t]+", " "))
  }

  /** Sentence segmentation without lookaround (RE2 has none): sentences
    * are maximal `[^.!?]+[.!?]+` runs, trimmed — the C4/Gopher
    * sentence-count unit. Returns array<string>. */
  def sentences(t: Column): Column =
    filter(
      transform(regexp_extract_all(t, lit("[^.!?]+[.!?]+"), lit(0)),
        s => trim(s)),
      s => s =!= "")

  /** Batch cleaning composition in production order: [[fixText]] →
    * C4 line/page filter (dropped pages leave the corpus, survivors
    * carry the cleaned text) → PII redaction → paragraph-level dedup
    * ([[Dedup.paragraphDedup]], which removes cross-corpus boilerplate
    * paragraphs the line rules cannot see). Returns one row per
    * SURVIVING page: (idCol, n_paras, n_dup_paras, textCol). The same
    * composition the streaming gate applies per micro-batch
    * (paragraph dedup being the one corpus-wide stage that stays
    * batch-only — its counts need the full corpus). */
  def cleanCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", paraMinCount: Int = 2): DataFrame = {
    val fixed = docs.withColumn(textCol, fixText(col(textCol)))
    val c4ed = withC4Columns(fixed, textCol)
      .where(col("page_keep") === 1)
      .withColumn(textCol, redactText(col("clean_text")))
      .drop("n_lines", "n_kept", "page_keep", "clean_text")
    Dedup.paragraphDedup(c4ed, textCol, idCol, paraMinCount)
      .withColumnRenamed("clean_text", textCol)
  }

  /** Per-stage ATTRITION report for a filter pipeline — the
    * observability surface a production curation run ships with its
    * output: how many documents each stage dropped, with stages applied
    * in order (a document is charged to the FIRST stage it fails).
    * `stages` are (name, keep-predicate) pairs evaluated on the row; a
    * null predicate counts as a failure at that stage (dirty data does
    * not silently survive).
    *
    * Scale shape: ONE scan — each row is classified map-side to its
    * first failing stage index (a nested when-chain, codegen'd), then
    * one count-by-index aggregation of ≤ stages+1 groups. The
    * driver-side math runs over that bounded aggregate (stage count,
    * never data) — the temperatureRates precedent. S separate
    * count-after-filter jobs would scan the corpus S times.
    *
    * Returns (stage_idx, stage, n_in, n_kept, n_dropped) with
    * n_in(0) = corpus size and n_in(k+1) = n_kept(k). */
  def attritionReport(docs: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one (name, predicate) stage")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be distinct: " + stages.map(_._1).mkString(", "))
    val firstFail = stages.zipWithIndex.foldRight(
        lit(stages.length): Column) { case (((_, pred), i), rest) =>
      when(!coalesce(pred, lit(false)), lit(i)).otherwise(rest)
    }
    val agg = docs.select(firstFail.as("_ff"))
      .groupBy("_ff").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var in = agg.values.sum
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      val dropped = agg.getOrElse(i, 0L)
      val out = (i, name, in, in - dropped, dropped)
      in -= dropped
      out
    }
    val spark = docs.sparkSession
    import spark.implicits._
    rows.toDF("stage_idx", "stage", "n_in", "n_kept", "n_dropped")
  }

  /** The redaction chain alone, as a Column — for composing into gates
    * (streaming or batch) that only need the scrubbed text. */
  def redactText(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ips"),
      redactText(t).as("redacted"))
  }

  /** C4's blocklist page filter (Raffel et al. 2020 §2.2: any page
    * containing a word from the "Dirty, Naughty, Obscene..." list is
    * removed ENTIRELY — page granularity, unlike the line-level
    * [[c4Clean]] rules): counts blocklisted tokens (case-insensitive
    * whole-token match over the same single-space tokenization as
    * [[TextOps.tokens]]) and flags clean pages. The list is bounded by
    * construction, compiles into a codegen'd set-membership predicate —
    * map-only, no shuffle, no UDF, scan-linear at any corpus size.
    * Returns (idCol, n_tokens, n_blocked, word_keep 0/1). */
  def blockedWordFilter(docs: DataFrame, blocklist: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol),
        size(toks).as("n_tokens"),
        blockedWordCount(col(textCol), blocklist).as("n_blocked"))
      .withColumn("word_keep",
        when(col("n_blocked") === 0, 1).otherwise(0))
  }

  /** Count of blocklisted matches in `t` — THE shared predicate of
    * [[blockedWordFilter]] and the streaming ingest gate
    * ([[graft.streaming.StreamingIngest.cleanDocuments]]), so batch and
    * feed agree bit-identically on what a blocked page is.
    *
    * Single-word entries match whole tokens (case-insensitive, the
    * [[TextOps.tokens]] single-space convention). MULTI-WORD entries —
    * the real C4/LDNOOBW list is full of them, and a tokens-only match
    * would silently never fire on any — match as token-boundary phrases:
    * occurrences of `" phrase "` inside the space-padded lowered text,
    * so `"strip club"` matches the phrase but not `"nonstrip clubs"`.
    * Both forms are plain codegen'd string expressions; map-only. */
  def blockedWordCount(t: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val entries = blocklist.map(_.toLowerCase)
    require(entries.forall(_.trim.nonEmpty), "blocklist entries must be non-blank")
    val (phrases, words) = entries.partition(_.contains(" "))
    val tokenHits =
      if (words.nonEmpty)
        size(filter(TextOps.tokens(t), w => lower(w).isInCollection(words)))
      else lit(0)
    // padded substring count: (len(s) − len(replace(s, p, ''))) / len(p)
    // over s = ' ' + lower(text) + ' ' and p = ' ' + phrase + ' '; note
    // back-to-back occurrences ("p p") share the separating space and
    // count as one — the page is dropped either way (count > 0 is the
    // decision), so the under-count is harmless and engine-portable
    val padded = concat(lit(" "), lower(t), lit(" "))
    val phraseHits = phrases.map { ph =>
      val p = s" $ph "
      ((length(padded) - length(replace(padded, lit(p), lit("")))) /
        lit(p.length)).cast("int")
    }.reduceOption(_ + _).getOrElse(lit(0))
    tokenHits + phraseHits
  }
}
