package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing for web-corpus curation — the grouping key of most
  * web-scale filtering decisions (C4/RefinedWeb-family pipelines
  * filter and rate-limit by registered domain, not by page).
  *
  * Built on Spark's native `parse_url` expression (java.net.URI
  * semantics) — per-row scalar work, zero shuffle; the shuffles
  * appear only when a caller aggregates per domain. The reference
  * (/root/reference) has no URL surface; north-star extension scope
  * (SURVEY §7.1 step 7).
  */
object WebAnalysis {

  /** Authority component: `https://www.x.com/a?b=1` → `www.x.com`. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** Path component: `https://x.com/a/b?c=1` → `/a/b`. */
  def path(url: Column): Column = parse_url(url, lit("PATH"))

  /** Value of one query parameter: `?item=3&ref=r1` key `item` → `3`;
    * NULL when absent.
    */
  def queryParam(url: Column, key: String): Column =
    parse_url(url, lit("QUERY"), lit(key))

  /** Host with a leading `www.` label stripped — the pragmatic
    * registered-domain key (a full public-suffix-list resolution
    * needs the PSL data file; `www`-folding covers the dominant
    * alias in web crawls).
    */
  def registeredDomain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** URL canonicalization — fold the raw-crawl aliases of one page
    * onto a single key so URL-level dedup (the first, cheapest dedup
    * pass of every web-corpus pipeline) catches them:
    *
    *   1. drop the fragment (`#...` — client-side only),
    *   2. lowercase the scheme and authority (case-insensitive per
    *      RFC 3986; paths stay case-sensitive),
    *   3. drop default ports (`:80` http, `:443` https),
    *   4. fold a leading `www.`,
    *   5. strip tracking parameters (`utm_*`, `ref`, `fbclid`,
    *      `gclid`), keeping the survivors in original order,
    *   6. strip trailing slashes before the query / end.
    *
    * Pure per-row regex chains (codegen'd, zero shuffle), written in
    * the RE2-compatible subset (no lookaround) so an engine-neutral
    * oracle can replay them verbatim. Tracking-param removal is the
    * classic three-pass form: kill every `&tracker`, then a leading
    * `?tracker&` → `?`, then a lone `?tracker` → nothing — after
    * pass one at most one tracker remains, so one application of
    * each pass is complete.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase scheme://authority, leave path/query untouched
    val pre = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val lowered = concat(lower(pre),
      noFrag.substr(length(pre) + lit(1), lit(Int.MaxValue)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val tracker = "(utm_[^&#]*|ref=[^&#]*|fbclid=[^&#]*|gclid=[^&#]*)"
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noWww, "&" + tracker, ""),
        "\\?" + tracker + "&", "?"),
      "\\?" + tracker + "$", "")
    regexp_replace(noTrack, "/+(\\?.*)?$", "$1")
  }
}
