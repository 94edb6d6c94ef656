package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sitemaps
import org.apache.spark.sql.functions._

class SitemapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Sitemap: directives tolerate trailing comments, keep file order, ignore case") {
    // trailing `# note` is legal robots.txt (the RobotsTxt parser accepts
    // it); the discovery regex must not silently drop such a directive
    val robots =
      "User-agent: *\nSitemap: https://d/a.xml # primary\n" +
        "Disallow: /x\nSITEMAP: https://d/b.xml\nnot-a-directive\n" +
        "Sitemap: https://d/c.xml\t\n"
    val got = Sitemaps.sitemapUrls(
      Seq(("d", robots)).toDF("domain", "txt"), "domain", "txt")
      .as[(String, Int, String)].collect().sortBy(_._2).toSeq
    assert(got == Seq(("d", 0, "https://d/a.xml"),
      ("d", 1, "https://d/b.xml"), ("d", 2, "https://d/c.xml")))
  }

  test("urlset entries: document order, &amp; decode, absent lastmod is NULL") {
    val xml = "<urlset><url><loc>https://d/p?a=1&amp;b=2</loc>" +
      "<lastmod>2024-05-06</lastmod></url>" +
      "<url><loc>https://d/q</loc></url></urlset>"
    val got = Seq(Tuple1(xml)).toDF("xml")
      .select(posexplode(Sitemaps.urlsetEntries(col("xml"))).as(Seq("i", "e")))
      .select(col("i"), col("e.loc"), col("e.lastmod"))
      .as[(Int, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, "https://d/p?a=1&b=2", Some("2024-05-06")),
      (1, "https://d/q", None)))
  }
}
