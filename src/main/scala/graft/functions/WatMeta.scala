package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WAT-style metadata extraction — the third leg of the WARC/WAT/WET
  * triple (CommonCrawl's public derived formats): where WET keeps the
  * visible text ([[HtmlText]]), WAT keeps the page's METADATA — the
  * head title and the outgoing links that make the web graph. Pure
  * Catalyst regexp chain riding the scan (the HtmlText discipline): no
  * UDFs, no shuffle; link FAN-OUT (posexplode) is the caller's query.
  *
  * Extraction subset, documented:
  *  - `title`: first `<title>…</title>` content, case-insensitive,
  *    dot-matches-newline, non-greedy; missing/empty title → NULL;
  *  - `hrefs`: every `<a … href="…">` / `<a … HREF='…'>` in document
  *    order — ANCHORS only (`<link href>` / `<area>` are not corpus
  *    edges here), either quote style, attribute anywhere in the tag;
  *    an unquoted or mixed-quote href is outside the subset;
  *  - `resolve`: RFC 3986 reference resolution for the shapes a crawler
  *    meets — absolute (has a scheme) kept verbatim, protocol-relative
  *    `//host/…` inherits the base scheme, root-relative `/…` joins the
  *    base origin, query-only `?…` and fragment-only `#…` keep the base
  *    PATH (§5.3 — pagination and same-document links), and remaining
  *    relative references merge with the base directory (base path up
  *    to its last `/`; a base with no path merges at `/` per the RFC).
  *    Dot-segment normalization is t50's job downstream.
  */
object WatMeta {

  def title(html: Column): Column = {
    val t = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    when(t === "", lit(null).cast("string")).otherwise(t)
  }

  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))

  /** Base origin: scheme://authority (no trailing slash). */
  private def origin(base: Column): Column =
    regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)

  /** Base directory: origin + path up to and including the last '/';
    * a base whose path is empty resolves relatives at '/'. */
  private def baseDir(base: Column): Column = {
    val withPath = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*/([^?#]*/)?)", 1)
    when(withPath === "", concat(origin(base), lit("/"))).otherwise(withPath)
  }

  def resolve(base: Column, href: Column): Column =
    when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), href)
      .when(href.startsWith("//"),
        concat(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1), lit(":"), href))
      .when(href.startsWith("/"), concat(origin(base), href))
      // query-only / fragment-only references keep the base PATH (RFC
      // 3986 §5.3: same-document and re-query links — the ubiquitous
      // '?page=2' pagination shape must not fall into the directory merge)
      .when(href.startsWith("?"), concat(regexp_extract(base, "^([^?#]*)", 1), href))
      .when(href.startsWith("#"), concat(regexp_extract(base, "^([^#]*)", 1), href))
      .otherwise(concat(baseDir(base), href))
}
