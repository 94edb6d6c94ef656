package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WatMeta
import org.apache.spark.sql.functions._

/** Laws for the WAT-style metadata extractor. The s19 gate composes the
  * WARC byte round-trip with title/href extraction and resolution; these
  * pin the pieces outside the gate fixture: protocol-relative and
  * no-path-base resolution, missing titles, and the anchor-only rule.
  */
class WatMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(html: String): (String, Seq[String]) = {
    val r = Seq(html).toDF("h")
      .select(WatMeta.title(col("h")).as("t"), WatMeta.hrefs(col("h")).as("l"))
      .as[(String, Seq[String])].collect().head
    (r._1, r._2)
  }

  private def res(base: String, href: String): String =
    Seq((base, href)).toDF("b", "h")
      .select(WatMeta.resolve(col("b"), col("h"))).as[String].collect().head

  test("title: first match, case-insensitive, spanning newlines; missing or empty is NULL") {
    assert(one("<TITLE>Hi\nthere</TITLE><title>second</title>")._1 == "Hi\nthere")
    assert(one("<p>no head</p>")._1 == null)
    assert(one("<title></title>")._1 == null)
  }

  test("hrefs: anchors only, both quote styles, attribute order free, document order") {
    val (_, links) = one(
      """<link href="/css"><a id="z" href="/a">x</a><area href="/m">""" +
        """<A HREF='b/c'>y</A><a name="n">none</a>""")
    assert(links == Seq("/a", "b/c"), s"got $links")
  }

  test("resolve: the four RFC 3986 shapes a crawler meets") {
    val base = "https://ex.com/dir/page"
    assert(res(base, "http://other.org/x") == "http://other.org/x")
    assert(res(base, "//cdn.ex.com/x") == "https://cdn.ex.com/x")
    assert(res(base, "/root/x") == "https://ex.com/root/x")
    assert(res(base, "rel/x") == "https://ex.com/dir/rel/x")
    // base with no path: relatives merge at '/'
    assert(res("https://ex.com", "rel/x") == "https://ex.com/rel/x")
    // base path is a root file: directory is '/'
    assert(res("https://ex.com/page", "rel/x") == "https://ex.com/rel/x")
    // query/fragment on the base never leak into the directory
    assert(res("https://ex.com/a/b?q=1#f", "c") == "https://ex.com/a/c")
    // query-only and fragment-only references keep the base PATH (§5.3)
    assert(res("https://ex.com/dir/page?q=1", "?page=2") == "https://ex.com/dir/page?page=2")
    assert(res("https://ex.com/dir/page?q=1#top", "#sec") == "https://ex.com/dir/page?q=1#sec")
  }
}
