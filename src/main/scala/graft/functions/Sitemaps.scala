package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sitemap discovery — the crawl-frontier hop between a robots fetch
  * and t71's fetch scheduling (sitemaps.org protocol, referenced by RFC
  * 9309): robots.txt advertises `Sitemap:` URLs (absolute, outside any
  * user-agent group, case-insensitive key), and each sitemap is a
  * `<urlset>` of `<url><loc>…</loc><lastmod>…</lastmod></url>` entries.
  *
  * Parsing subset, documented: the regexp-chain XML read every crawler
  * actually runs on sitemaps (flat urlset, element content with the
  * spec's `&amp;` entity-escaping decoded; no CDATA, no nested url
  * elements — the format forbids them). Sitemap INDEX files
  * (`<sitemapindex>`) are one recursion of the same shape and stay the
  * caller's loop. Pure Catalyst: one line explode + window for
  * discovery, one regexp_extract_all + transform for entries.
  */
object Sitemaps {

  /** `Sitemap:` URLs per domain, 0-based in file order:
    * (domain, sitemap_idx, sitemap_url). */
  def sitemapUrls(robots: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("domain")).orderBy(col("pos"))
    robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "raw")))
      .select(col("domain"), col("pos"),
        // trailing `# comment` is legal robots.txt and tolerated by the
        // RobotsTxt parser — accept it here too instead of dropping the
        // directive (the URL itself cannot contain an unencoded `#`:
        // fragments are stripped before a sitemap URL is advertised)
        regexp_extract(col("raw"),
          "(?i)^\\s*sitemap:\\s*(\\S+)\\s*(?:#.*)?$", 1).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
      .withColumn("sitemap_idx", (row_number().over(w) - 1).cast("int"))
      .select(col("domain"), col("sitemap_idx"), col("sitemap_url"))
  }

  /** `<url>` entries of a urlset document, in order: array of
    * struct(loc, lastmod) — loc entity-decoded (`&amp;` → `&`),
    * absent/empty lastmod → NULL. */
  def urlsetEntries(xml: Column): Column = {
    val blocks = regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1))
    transform(blocks, b => struct(
      regexp_replace(
        regexp_extract(b, "(?s)<loc>(.*?)</loc>", 1), "&amp;", "&").as("loc"),
      nullif(regexp_extract(b, "(?s)<lastmod>(.*?)</lastmod>", 1), lit("")).as("lastmod")))
  }
}
