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
}
