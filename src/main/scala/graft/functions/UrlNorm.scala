package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — the first
  * operator of every web-corpus dedup stack: crawls re-discover one page
  * under dozens of spellings (scheme/host case, default ports, fragments,
  * param order, trailing host dots, doubled slashes), and exact dedup on
  * the RAW url misses all of them. Canonical form (deterministic, both
  * engines can express it, so the gate hashes full values):
  *
  *   1. scheme → lowercase
  *   2. host → lowercase, trailing dots stripped (DNS root label)
  *   3. default port dropped (http:80, https:443); other ports kept
  *   4. path: empty → "/", runs of '/' collapsed to one
  *   5. query: params (the literal `k=v` strings) sorted bytewise,
  *      empties dropped; an empty query drops the '?'
  *   6. fragment dropped (client-side only, never reaches the server)
  *
  * Registered domain (eTLD+1) buckets hosts by OWNER — the unit crawl
  * policies, dedup quotas (t13-style per-source caps), and robots
  * grouping operate on. Backed by the FULL Public Suffix List (public
  * data, shipped as a classpath resource — see
  * [[graft.functions.expr.RegisteredDomain]] for the algorithm: longest
  * match, wildcard rules, exception rules, ICANN + private sections);
  * updating the list is a data change, not a code change.
  *
  * Canonicalization is composed native functions (regexp_extract /
  * array_sort / element_at — all codegen'd, zero UDFs); the eTLD+1
  * lookup is a table-driven native expression (O(#labels) hash probes
  * against a JVM-static rule table). Both are narrow no-shuffle maps,
  * embarrassingly parallel at 100 TB.
  */
object UrlNorm {

  private val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Lowercased host with trailing dots and any `:port` stripped. */
  def host(url: Column): Column = {
    val authority = regexp_extract(url, UrlRe, 2)
    rtrim(regexp_replace(lower(authority), ":[0-9]+$", ""), ".")
  }

  /** Canonical URL per the 6 rules above; malformed (non-matching) input
    * yields NULL so it can be routed, not silently kept. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val authority = regexp_extract(url, UrlRe, 2)
    val h = host(url)
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, "").otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(url, UrlRe, 3)
    val path = when(rawPath === "", "/").otherwise(regexp_replace(rawPath, "/{2,}", "/"))
    val rawQuery = regexp_extract(url, UrlRe, 4) // includes the leading '?'
    val params = array_sort(filter(
      split(regexp_replace(rawQuery, "^\\?", ""), "&"), p => p =!= ""))
    val queryPart = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(regexp_extract(url, UrlRe, 0) === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), h, portPart, path, queryPart))
  }

  /** Registered domain (eTLD+1) of an already-canonical host, under the
    * full Public Suffix List (longest-match + wildcard + exception
    * semantics); a bare single label, or a host that IS a public suffix,
    * passes through unchanged. */
  def registeredDomain(hostCol: Column): Column =
    graft.functions.expr.RegisteredDomain(hostCol)
}
