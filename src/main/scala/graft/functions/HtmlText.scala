package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WET-style HTML → text extraction — the stage between a raw crawl
  * (s17's WARC responses) and the `documents` table, as CommonCrawl's
  * WET files do it (public method; tag-stripping extraction, not a DOM
  * render). Pure Catalyst regexp chain riding the scan — no UDFs, no
  * shuffle:
  *
  *   1. drop `<script>…</script>` and `<style>…</style>` BLOCKS
  *      (case-insensitive, dot-matches-newline, non-greedy — code and
  *      CSS are not corpus text);
  *   2. replace every remaining tag with a SPACE (adjacent elements
  *      must not weld their words together);
  *   3. decode the high-traffic entities, `&amp;` strictly LAST — the
  *      double-escape law: `&amp;lt;` means the literal text "&lt;",
  *      and decoding amp first would corrupt it to `<`. Decoding runs
  *      AFTER tag-stripping for the mirror-image reason: `&lt;b&gt;` is
  *      literal text "<b>", not markup to strip;
  *   4. collapse whitespace runs and trim.
  *
  * The regex subset (case-insensitive flag, dotall flag, non-greedy
  * repetition, character classes) behaves identically in Java regex and
  * RE2, so the chain is oracle-expressible verbatim.
  */
object HtmlText {

  def extract(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(ent, "\\s+", " "))
  }
}
