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

  /** Column-APPENDING operators must never silently overwrite an input
    * column (a frame that already carries `split` — common in eval prep
    * — would get it clobbered). Same loud-reject class as
    * `Dedup.requireNoReserved`. */
  private def requireNoClobber(df: DataFrame, op: String,
      cols: String*): Unit =
    cols.foreach { c =>
      require(!df.columns.contains(c),
        s"$op appends a column named $c but the input already has one — " +
          "it would be silently overwritten; rename the input column")
    }

  /** scheme://host[:port] capture — host is everything before the first
    * '/', '?' or '#'. */
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Host of the URL, lowercased, with any leading "www." and any
    * ":port" suffix stripped; empty string when no scheme/host parses. */
  def domain(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, HostRe, 1)), ":\\d+$", ""),
      "^www\\.", "")

  /** Bounded literal subset of the Public Suffix List: the common
    * MULTI-PART public suffixes (ccTLD second-level registries) under
    * which "last two labels" is the wrong registered-domain rule —
    * `example.co.uk` must group as `example.co.uk`, not collapse to
    * `co.uk` (which would merge every .co.uk site into one blocklist /
    * per-domain-cap bucket). The full PSL is a public, periodically
    * updated table; this trimmed set covers the highest-traffic ccTLD
    * registries and is deliberately literal so the DuckDB oracle can
    * evaluate the identical membership test. Hosts under suffixes not
    * listed here fall back to the last-two-labels rule. */
  val MultiPartSuffixes: Seq[String] = Seq(
    // United Kingdom / Ireland
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // Japan / Korea / Taiwan / Hong Kong / Singapore
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    // China / India / Southeast Asia
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "co.id", "or.id", "web.id", "ac.id", "go.id",
    "co.th", "in.th", "or.th", "ac.th", "go.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    // Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    // Middle East / Africa / Europe ccSLDs
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.eg", "com.sa", "org.sa", "edu.sa", "gov.sa",
    "com.ua", "in.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl")

  /** The PSL's WILDCARD rules (`*.<tld>`): EVERY second-level label under
    * these TLDs is itself a public suffix, so the registered domain is the
    * last THREE labels. This is the complete current wildcard set for
    * whole ccTLDs (the PSL also wildcards a handful of hosting providers'
    * private subtrees, which are out of scope for provenance grouping). */
  val WildcardTlds: Seq[String] = Seq(
    "bd", "ck", "er", "fk", "jm", "kh", "kw", "mm", "np", "pg", "ye")

  /** PSL EXCEPTION rules (`!www.ck`): hosts carved back OUT of a wildcard
    * — `www.ck` is a registrable domain even though `*.ck` is a suffix. */
  val WildcardExceptions: Seq[String] = Seq("www.ck")

  /** Registered domain of the URL: the last two host labels, EXCEPT
    *  - wildcard-exception hosts ([[WildcardExceptions]], `!www.ck`):
    *    the two labels ARE the registered domain even under a wildcard;
    *  - wildcard TLDs ([[WildcardTlds]], `*.ck` …): last THREE labels;
    *  - known multi-part public suffixes ([[MultiPartSuffixes]] — co.uk,
    *    com.au, co.jp, …): last THREE labels.
    * A host that IS a bare public suffix (no third label) returns the
    * suffix itself. Hosts under suffixes in none of the literal tables
    * fall back to last-two-labels. Internationalized hosts participate in
    * their wire (punycode `xn--`) form — the PSL's own canonical matching
    * form — so no IDN decode is needed or attempted. Pure column
    * expression (regex extracts + literal INs), identically evaluable in
    * DuckDB. */
  def registeredDomain(url: Column): Column = {
    val d = domain(url)
    val two = regexp_extract(d, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(d, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val tld = regexp_extract(d, "([^.]+)$", 1)
    when(two.isInCollection(WildcardExceptions), two)
      .when(tld.isInCollection(WildcardTlds) && three =!= "", three)
      .when(two.isInCollection(MultiPartSuffixes) && three =!= "", three)
      .otherwise(two)
  }

  /** [[registeredDomain]]'s decision in the DuckDB dialect over a SQL
    * expression `domainSql` yielding the host (for oracles — keeps the
    * literal suffix/wildcard/exception tables in lock-step with the
    * Scala side). */
  def registeredDomainSql(domainSql: String): String = {
    val inList = MultiPartSuffixes.map(s => s"'$s'").mkString(", ")
    val wcList = WildcardTlds.map(s => s"'$s'").mkString(", ")
    val exList = WildcardExceptions.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN regexp_extract($domainSql, '([^.]+\\.[^.]+)$$', 1) IN ($exList)
       |     THEN regexp_extract($domainSql, '([^.]+\\.[^.]+)$$', 1)
       |     WHEN regexp_extract($domainSql, '([^.]+)$$', 1) IN ($wcList)
       |      AND regexp_extract($domainSql, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
       |     THEN regexp_extract($domainSql, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
       |     WHEN regexp_extract($domainSql, '([^.]+\\.[^.]+)$$', 1) IN ($inList)
       |      AND regexp_extract($domainSql, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
       |     THEN regexp_extract($domainSql, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
       |     ELSE regexp_extract($domainSql, '([^.]+\\.[^.]+)$$', 1) END""".stripMargin
  }

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
    // trailing-slash strip: /a/b/ and /a/b are the same resource for
    // dedup purposes; fires only when the slash ends the whole remainder
    // (i.e. no query survived), one slash at a time — /a// canonicalizes
    // to /a/ which re-canonicalizes to /a on a second pass, matching the
    // single-application contract of the other rules
    val noTrailingSlash = regexp_replace(noDanglingSep, "/$", "")
    concat(lower(schemeHost), noTrailingSlash)
  }

  /** Drop rows whose [[domain]] is in `blocked` (a bounded list — rides
    * the plan as a literal array, no join). */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    df.where(!domain(col(urlCol)).isInCollection(blocked))

  /** Deterministic GROUP-CONSISTENT train/validation split by registered
    * domain — the leakage guard for web-corpus evals: near-duplicate
    * pages overwhelmingly share a registered domain (mirrors, templated
    * subpages, per-article boilerplate), so a row-level random split
    * leaks them across sides and inflates validation scores. Every row
    * whose URL shares a registered domain lands on the SAME side:
    * `split = "val"` iff hash60(reg_domain ‖ '#' ‖ salt) mod 1000 <
    * `valPermille`. Appends (reg_domain, split). Map-only (no shuffle,
    * no state — the hash IS the assignment), reproducible across runs
    * and engines, and `salt` re-rolls the split without touching data.
    * E[val fraction] = valPermille/1000 over domains; the realized
    * fraction over ROWS tracks it only as far as the domain-size
    * distribution allows — at web scale a handful of mega-domains
    * dominate row counts, so validate the realized mass (one groupBy)
    * if the budget matters. Rows with a null/unextractable URL get a
    * null `reg_domain` and land on the TRAIN side (the null hash
    * propagates to a null predicate), identically in the oracle. */
  def holdoutByDomain(df: DataFrame, urlCol: String, valPermille: Int,
      salt: String = ""): DataFrame = {
    require(valPermille >= 0 && valPermille <= 1000,
      s"valPermille must be in [0, 1000], got $valPermille")
    requireNoClobber(df, "holdoutByDomain", "reg_domain", "split")
    val rd = registeredDomain(col(urlCol))
    df.withColumn("reg_domain", rd)
      .withColumn("split",
        when(TextOps.hash60(concat(col("reg_domain"), lit("#" + salt)))
            % 1000 < valPermille, lit("val"))
          .otherwise(lit("train")))
  }

  /** Keep at most `cap` rows per domain, smallest `orderCol` first.
    * Appends `domain`; one hash-partitioned window.
    *
    * Skew (`skewSalts > 1`): the single window sorts each domain inside
    * ONE task — fine for the web's long tail, but a mega-domain
    * (10⁸-page platform hosts are routine at 100 TB) serializes into a
    * single spilling sort. With S salts the cap runs in TWO stages:
    * per-(domain, salt) top-`cap` windows (each sorts ~1/S of the hot
    * domain, in parallel) and then the exact top-`cap` window over the
    * ≤ S·cap per-domain survivors — row-identical to the single window
    * (every global top-cap row is in its salt group's top-cap), at the
    * price of one extra bounded shuffle. Ties: `orderCol` should be
    * unique per domain (the usual doc-id), otherwise WHICH of the tied
    * rows survives is arbitrary on either path — same caveat as the
    * plain window, but the arbitrary choice can differ between salted
    * and unsalted runs. */
  def capPerDomain(df: DataFrame, urlCol: String, orderCol: String,
      cap: Int, skewSalts: Int = 1): DataFrame = {
    require(cap > 0, "cap must be positive")
    require(skewSalts > 0, "skewSalts must be positive")
    requireNoClobber(df, "capPerDomain", "domain", "_rn", "_salt")
    val keyed = df.withColumn("domain", domain(col(urlCol)))
    val preCapped =
      if (skewSalts == 1) keyed
      else {
        val ws = Window.partitionBy(col("domain"), col("_salt"))
          .orderBy(col(orderCol))
        keyed
          .withColumn("_salt",
            pmod(TextOps.hash60(col(orderCol)), lit(skewSalts.toLong)))
          .withColumn("_rn", row_number().over(ws))
          .where(col("_rn") <= cap)
          .drop("_rn", "_salt")
      }
    val w = Window.partitionBy(col("domain")).orderBy(col(orderCol))
    preCapped
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }
}
