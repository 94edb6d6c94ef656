package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlText
import org.apache.spark.sql.functions._

class HtmlTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlText.extract(col("h"))).as[String].head()

  test("script/style blocks drop whole; tags become spaces so words don't weld") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract("<script>var x = '<p>not text</p>';</script>keep") == "keep")
    assert(extract("<SCRIPT\ntype=x>a\nb</SCRIPT>mid<style>p{}</style>") == "mid")
  }

  test("entity decode order laws: after tag-strip, '&amp;' strictly last") {
    // &lt;b&gt; is literal text "<b>", NOT markup — must survive
    assert(extract("<p>&lt;b&gt;</p>") == "<b>")
    // &amp;lt; is literal text "&lt;" — amp-first would corrupt it to "<"
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
    assert(extract("A &amp; B &quot;q&quot; &#39;s&#39;&nbsp;.") == "A & B \"q\" 's' .")
  }

  test("whitespace collapses and trims") {
    assert(extract("  <div>\n a \t b \n</div>  ") == "a b")
    assert(extract("<br/>") == "")
  }
}
