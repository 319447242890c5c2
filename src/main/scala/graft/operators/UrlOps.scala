package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain rollups — the web-curation entry
  * stage. Crawl pipelines (C4, RefinedWeb, CC pipelines) dedup by
  * canonical URL and budget/filter by registered domain BEFORE any
  * content pass, so these run on the raw crawl index at full corpus
  * width. Everything here is a composition of built-in string/array
  * functions (whole-stage codegen, no UDFs, no java.net parsing), and
  * every step is replayable in plain SQL — the q_url_canon oracle
  * recomputes canonicalization, registered domains and the rollup
  * verbatim in DuckDB.
  *
  * Canonical form (documented contract, applied in this order):
  *  1. trim; scheme and host lowercase (path/query case preserved);
  *  2. fragment (`#...`) dropped;
  *  3. default ports stripped (`:80` for http, `:443` for https; other
  *     ports kept);
  *  4. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `msclkid`,
  *     `mc_eid`, `igshid`, `ref`), remaining params sorted
  *     byte-lexicographically (param ORDER never distinguishes URLs);
  *  5. empty path becomes `/`; a trailing slash on a non-root path is
  *     dropped (`/a/` ≡ `/a`);
  *  6. userinfo (`user:pw@`) is STRIPPED from the canonical form (and
  *     from [[hostOf]]) — credentials are noise for crawl dedup and
  *     would otherwise corrupt the ':'-port split;
  *  7. IPv6 literal hosts (`[::1]`, with or without a port) keep their
  *     brackets; an IP literal (v4 or v6) is its own registered domain
  *     (no label heuristic on numeric hosts).
  * Input must carry an explicit `scheme://`; anything else (mailto:,
  * scheme-relative `//host`, garbage) passes through unchanged via the
  * `contains('://')` guard — curation drops non-http(s) rows anyway.
  */
object UrlOps {

  private val TrackingPrefixes =
    Seq("utm_", "fbclid=", "gclid=", "msclkid=", "mc_eid=", "igshid=", "ref=")

  /** Multi-label public suffixes the registered-domain heuristic knows.
    * A full public-suffix list is data, not code — feed one through
    * `registeredDomain(host, suffixes)` when exactness matters; this
    * default covers the common ccTLD second-levels.
    */
  val DefaultTwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr")

  /** Lowercased host (port and userinfo stripped; IPv6 brackets kept)
    * of a `scheme://...` URL.
    */
  def hostOf(url: Column): Column = {
    val rest = substring_index(trim(url), "://", -1)
    val beforeFrag = substring_index(rest, "#", 1)
    val beforeQuery = substring_index(beforeFrag, "?", 1)
    val hostport = substring_index(beforeQuery, "/", 1)
    val hp = substring_index(hostport, "@", -1) // strip userinfo
    when(hp.startsWith("["),
        lower(concat(substring_index(hp, "]", 1), lit("]"))))
      .otherwise(lower(substring_index(hp, ":", 1)))
  }

  /** Registered (pay-level) domain of a lowercased host: the last two
    * labels, or three when the last two form a known public suffix.
    * `suffixes` defaults to [[DefaultTwoLabelSuffixes]]; hosts with one
    * label (localhost, bare TLD) pass through unchanged.
    */
  def registeredDomain(host: Column,
      suffixes: Seq[String] = DefaultTwoLabelSuffixes): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= lit(1), host)
      // IP literals are their own registered domain: bracketed IPv6
      // FIRST (IPv4-mapped forms like [::ffff:192.0.2.1] DO contain
      // dots, so the no-dots assumption alone is not enough), then
      // all-digits-and-dots IPv4
      .when(host.startsWith("["), host)
      .when(host.rlike("^[0-9.]+$"), host)
      .when(n >= lit(3) && lastTwo.isin(suffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** The canonical URL (contract in the object doc); inputs without an
    * explicit `scheme://` pass through unchanged (the guard lives HERE,
    * so direct callers get the documented behavior, not mangled output).
    */
  def canonicalizeUrl(url: Column): Column =
    when(url.contains("://"), canonicalizeSchemed(url)).otherwise(url)

  private def canonicalizeSchemed(url: Column): Column = {
    val s = trim(url)
    val scheme = lower(substring_index(s, "://", 1))
    val rest = substring_index(s, "://", -1)
    val beforeFrag = substring_index(rest, "#", 1)
    val beforeQuery = substring_index(beforeFrag, "?", 1)
    // query = everything after the FIRST '?' (fragment already dropped)
    val hasQuery = beforeFrag =!= beforeQuery
    val query = when(hasQuery,
      beforeFrag.substr(length(beforeQuery) + lit(2), length(beforeFrag)))
      .otherwise(lit(""))
    val hostport = substring_index(beforeQuery, "/", 1)
    val hp = substring_index(hostport, "@", -1) // userinfo stripped (contract 6)
    val isV6 = hp.startsWith("[")
    val host = when(isV6, lower(concat(substring_index(hp, "]", 1), lit("]"))))
      .otherwise(lower(substring_index(hp, ":", 1)))
    val afterBracket = hp.substr(
      length(substring_index(hp, "]", 1)) + lit(2), length(hp))
    val port = when(isV6,
        when(afterBracket.startsWith(":"),
          afterBracket.substr(lit(2), length(afterBracket))).otherwise(lit("")))
      .otherwise(when(hp.contains(":"),
        substring_index(hp, ":", -1)).otherwise(lit("")))
    val keepPort = port =!= lit("") &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val rawPath = beforeQuery.substr(length(hostport) + lit(1), length(beforeQuery))
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(path0 =!= lit("/") && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - lit(1))).otherwise(path0)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= lit("") && !TrackingPrefixes
        .map(t => p.startsWith(t)).reduce(_ || _)))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qs =!= lit(""), concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Per-registered-domain crawl report over a URL column: pages,
    * distinct canonical URLs, and the URL-duplicate count (pages minus
    * distinct canonicals — the pre-content dedup win). ONE
    * domain-keyed aggregation; canonicalization rides the scan.
    */
  def domainReport(df: DataFrame, urlCol: String): DataFrame = {
    df.select(registeredDomain(hostOf(col(urlCol))).as("domain"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("domain")
      .agg(count(lit(1)).cast("long").as("pages"),
        countDistinct(col("canonical_url")).cast("long").as("distinct_urls"))
      .withColumn("url_duplicates", (col("pages") - col("distinct_urls")).cast("long"))
  }
}
