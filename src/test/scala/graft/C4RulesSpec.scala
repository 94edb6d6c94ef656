package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.C4Rules
import org.apache.spark.sql.functions._

/** Laws for the C4 cleaning rule-pack. The t65 gate hash-compares the
  * full per-page report cross-engine; these pin the per-rule behavior
  * on hand-built lines and the edges outside the gate fixture.
  */
class C4RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(text: String, badwords: Seq[String] = Seq("bad")) =
    C4Rules.report(Seq((1L, text)).toDF("id", "text"), "id", "text", badwords)
      .collect().head

  test("line rules: terminal punct (incl. closing quote, trailing ws), 3 words, javascript") {
    val r = report(
      "One two three.\nends with quote \"\nOnly two.\nno punct at all here\n" +
        "JavaScript is case-insensitive here.\nFour words stay fine!  \n" +
        "typographic curly close”\nand curly apostrophe’")
    assert(r.getAs[String]("kept_text") ==
      "One two three.\nends with quote \"\nFour words stay fine!  \n" +
        "typographic curly close”\nand curly apostrophe’")
    assert(r.getAs[Long]("n_lines") == 8L)
    assert(r.getAs[Long]("n_lines_kept") == 5L)
  }

  test("page flags: badword is an exact lowercased token, not a substring") {
    assert(report("my bad word here.", Seq("bad")).getAs[Boolean]("has_badword"))
    assert(!report("badge is not bad-word.", Seq("bad")).getAs[Boolean]("has_badword"),
      "substrings and welded punctuation must not match")
    assert(report("BAD in caps too.", Seq("bad")).getAs[Boolean]("has_badword"))
  }

  test("sentence floor counts kept text only; empty kept text is '' with zero counts") {
    // the javascript line holds 3 periods but dies, so they must not count
    val r = report("js javascript line...\nShort but kept line?")
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.getAs[Boolean]("few_sentences"))
    val empty = report("nothing survives here")
    assert(empty.getAs[String]("kept_text") == "")
    assert(empty.getAs[Long]("n_lines_kept") == 0L)
    assert(empty.getAs[Long]("n_sentences") == 0L)
  }

  test("keep requires every page rule; five one-sentence lines pass the floor") {
    val five = (1 to 5).map(i => s"Good sentence number $i.").mkString("\n")
    assert(report(five).getAs[Boolean]("keep"))
    assert(!report(five + "\nlorem IPSUM dolor sit.").getAs[Boolean]("keep"))
    assert(!report(five + "\ncode { brace here.").getAs[Boolean]("keep"))
    assert(!report(five.replaceFirst("number", "bad")).getAs[Boolean]("keep"))
  }
}
