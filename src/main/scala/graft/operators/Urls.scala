package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing and domain-level curation for web-crawled corpora (north-star
  * extension; SURVEY.md §7 `graft.scale`).
  *
  * A Common-Crawl-shaped training pipeline curates per SITE, not just per
  * document: parse every URL once, roll documents up to their registered
  * domain, cap the per-domain document count (one template-heavy site must
  * not dominate the corpus), and report domain concentration. Everything
  * here is per-row regexp/codegen compute plus ONE aggregation keyed by
  * domain — the natural shuffle key, low-cardinality relative to documents,
  * so the rollup combines map-side and the cap never sorts globally
  * (`WindowGroupLimit` per domain).
  *
  * Parsing is deliberately regex-based (no java.net.URI driver objects, no
  * UDFs): the exact same patterns run as RE2 in DuckDB, so every component
  * is oracle-checkable, and a malformed URL yields NULL components instead
  * of an exception — at corpus scale malformed URLs are a certainty.
  */
object Urls {

  /** Multi-part public suffixes recognized by [[registeredDomain]]: when a
    * host's last TWO labels are one of these, the registered domain keeps
    * three labels (`shop.example.co.uk` -> `example.co.uk`). A pragmatic
    * short list of the high-traffic two-level suffixes — the full public
    * suffix list is data, not code, and callers with one can pass their own
    * via the `extraSuffixes` parameter. */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "edu.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.kr", "or.kr", "co.za", "org.za"
  )

  // every component anchors on a valid `scheme://` prefix so non-URLs
  // yield NULL EVERYTHING (a bare '?x=1' in random text is not a query
  // string); userinfo (`user:pw@`) is consumed greedily up to the LAST
  // '@' in the authority and never reaches the host, port, or domain —
  // varying credentials must not split one site into many cap groups
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"
  private val PortRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]+:([0-9]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
  // the '?' must precede any '#': a '?' inside the fragment is not a query
  private val QueryRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\\?([^#]*)"

  private def extractOrNull(c: Column, re: String): Column =
    nullif(regexp_extract(c, re, 1), lit(""))

  /** Lowercased registered domain straight from a URL column — the one
    * shared host→domain expression every operator here uses (a single
    * definition keeps cap groups, stats keys, and parseUrls output
    * consistent by construction). */
  private def urlDomain(u: Column, extraSuffixes: Seq[String]): Column =
    registeredDomain(lower(extractOrNull(u, HostRe)), extraSuffixes)

  /** Parse a URL column into `<prefix>scheme/host/port/path/query_string`
    * plus `<prefix>domain` ([[registeredDomain]] of the host). Absent
    * components are NULL (never empty strings), ports are INT, hosts and
    * domains are lowercased; anything that doesn't look like
    * `scheme://host...` yields NULL everything. Pure per-row codegen'd
    * regexps — no shuffle, no action, column pruning unaffected. */
  def parseUrls(
      df: DataFrame,
      urlCol: String,
      prefix: String = "url_",
      extraSuffixes: Seq[String] = Nil
  ): DataFrame = {
    require(df.columns.contains(urlCol), s"column '$urlCol' does not exist")
    val u = col(urlCol)
    val host = lower(extractOrNull(u, HostRe))
    df.withColumn(s"${prefix}scheme", lower(extractOrNull(u, SchemeRe)))
      .withColumn(s"${prefix}host", host)
      .withColumn(s"${prefix}port", extractOrNull(u, PortRe).cast("int"))
      .withColumn(s"${prefix}path", extractOrNull(u, PathRe))
      .withColumn(s"${prefix}query_string", extractOrNull(u, QueryRe))
      .withColumn(s"${prefix}domain", urlDomain(u, extraSuffixes))
  }

  /** Registered domain of an (already-lowercased) host: the last two
    * labels, or the last three when the final two are a recognized
    * multi-part suffix ([[MultiPartSuffixes]] plus `extraSuffixes`).
    * Single-label hosts (`localhost`) and NULLs pass through unchanged. */
  def registeredDomain(host: Column, extraSuffixes: Seq[String] = Nil): Column = {
    val suffixes = (MultiPartSuffixes ++ extraSuffixes).map(_.toLowerCase)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(host.isNull, lit(null).cast("string"))
      .when(n >= 3 && array_contains(typedlit(suffixes), last2), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Cap the documents kept per registered domain at `maxPerDomain`,
    * chosen by the deterministic md5 hash order of `idCol` (+ `salt` for
    * an independent re-draw) — an unbiased per-site subsample, the
    * anti-template-site guard every crawled corpus applies before
    * training. Unparseable URLs (NULL domain) form their own group and are
    * capped too (they would otherwise ride in uncapped). Rows keep all
    * input columns plus `<prefix>domain`; per-domain ranking is
    * `WindowGroupLimit` — no global sort, state bounded by the cap. */
  def domainCap(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      maxPerDomain: Int,
      salt: String = "",
      prefix: String = "url_",
      extraSuffixes: Seq[String] = Nil
  ): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be >= 1")
    val withDomain = df.withColumn(
      s"${prefix}domain",
      urlDomain(col(urlCol), extraSuffixes)
    )
    TopN
      .firstRow(
        withDomain.withColumn("__bk", Splits.hashBucket(col(idCol), salt)),
        n = maxPerDomain,
        partitionBy = Seq(col(s"${prefix}domain")),
        orderBy = Seq(col("__bk"), col(idCol))
      )
      .drop("__bk")
  }

  /** Per-domain concentration report: document count and corpus share per
    * registered domain — the "is one site dominating the corpus" dashboard
    * that motivates [[domainCap]]. One map-side-combined aggregate keyed by
    * domain; the denominator is a broadcast 1-row total (NEVER an
    * unpartitioned window — at web scale the domain table itself is
    * millions of rows and must not funnel through one task). */
  def domainStats(
      df: DataFrame,
      urlCol: String,
      extraSuffixes: Seq[String] = Nil
  ): DataFrame = {
    val perDomain = df
      .select(urlDomain(col(urlCol), extraSuffixes).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"))
    val total = perDomain.agg(sum("n_docs").as("__total"))
    perDomain
      .crossJoin(broadcast(total))
      .withColumn(
        "share",
        round(col("n_docs").cast("double") / col("__total"), 6)
      )
      .drop("__total")
  }
}
