package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL operators for web-corpus curation — the provenance-side of a
  * pretraining pipeline (C4/RefinedWeb/Dolma all key cleaning decisions
  * off the URL):
  *
  *  - [[domain]] / [[registeredDomain]] — host extraction for grouping,
  *    blocklists and per-domain statistics.
  *  - [[normalize]] — canonical URL form for URL-level dedup: lowercase
  *    scheme+host, strip the fragment, strip tracking parameters
  *    (utm_*, fbclid, gclid), strip a trailing "?"/"&", strip a
  *    trailing slash on a bare path.
  *  - [[blocklistFilter]] — drop documents whose domain is on a list
  *    (broadcast by construction — blocklists are bounded).
  *  - [[capPerDomain]] — RefinedWeb-style per-domain quota: keep at most
  *    `cap` documents per domain, smallest `orderCol` first (the
  *    deterministic tiebreak that makes the sample reproducible and
  *    oracle-checkable, where "random k" would not be).
  *
  * Everything except the cap is a map-only projection built from
  * regexp_extract/regexp_replace in the Java∩RE2 subset, so a DuckDB
  * oracle evaluates the same patterns. The cap is ONE window over
  * hash-partitioned domains — at 100 TB the per-domain partitions are
  * the natural unit (hot domains are exactly what the cap removes, and
  * row_number short-circuits past `cap` rows only after the sort; a
  * domain hot enough to skew a partition is cut to `cap` rows on
  * output, so downstream stages never see the skew).
  */
object UrlOps {

  /** scheme://host[:port] capture — host is everything before the first
    * '/', '?' or '#'. */
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Host of the URL, lowercased, with any leading "www." and any
    * ":port" suffix stripped; empty string when no scheme/host parses. */
  def domain(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, HostRe, 1)), ":\\d+$", ""),
      "^www\\.", "")

  /** Last two host labels ("registered domain" under generic TLDs — the
    * public-suffix list is out of scope and documented so). */
  def registeredDomain(url: Column): Column =
    regexp_extract(domain(url), "([^.]+\\.[^.]+)$", 1)

  /** Canonical URL for URL-level dedup (see object doc for the rules).
    * Note the tracking-param match is unanchored on the left (RE2 has no
    * backreferences for a capture-and-restore spelling, and lookbehind
    * is unavailable in the Java∩RE2 subset), so a parameter NAME that
    * merely ends in `utm_x`/`fbclid`/`gclid` is also stripped — the
    * standard aggressive-canonicalization tradeoff, identical in the
    * oracle. */
  def normalize(url: Column): Column = {
    // lowercase scheme+host only: split at the first path separator
    val schemeHost = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val noFragment = regexp_replace(rest, "#.*$", "")
    val noTracking = regexp_replace(noFragment,
      "(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&?", "")
    val noDanglingSep = regexp_replace(noTracking, "[?&]$", "")
    concat(lower(schemeHost), noDanglingSep)
  }

  /** Drop rows whose [[domain]] is in `blocked` (a bounded list — rides
    * the plan as a literal array, no join). */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    df.where(!domain(col(urlCol)).isInCollection(blocked))

  /** Keep at most `cap` rows per domain, smallest `orderCol` first.
    * Appends `domain`; one hash-partitioned window. */
  def capPerDomain(df: DataFrame, urlCol: String, orderCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(domain(col(urlCol))).orderBy(col(orderCol))
    df.withColumn("domain", domain(col(urlCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }
}
