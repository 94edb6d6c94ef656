package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GopherRepetition

class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def measure(text: String): Map[String, Any] = {
    val row = GopherRepetition.measure(
      Seq((1L, text)).toDF("id", "text"), "id", "text").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("hand-traced n-gram coverage with the count-desc/gram-asc tie-break") {
    // "go go go stop": bigrams = [go go, go go, go stop] → top 'go go' ×2,
    // coverage 2·4 = 8 chars of 10 word chars (3·'go' + 'stop') → 800000 fp
    val m = measure("go go go stop")
    assert(m("word_chars") == 10L)
    assert(m("top2gram") == "go go" && m("top2count") == 2L)
    assert(m("top2gram_char_frac_fp") == 800000L)
    assert(m("r_top2gram") == false, "0.667 > 0.20 fails the published threshold")
    // trigrams all unique (count 1) → repetition fraction 0, rule passes;
    // the tie among count-1 grams resolves to the lexicographically least
    assert(m("top3count") == 1L && m("top3gram") == "go go go")
    assert(m("top3gram_char_frac_fp") == 0L && m("r_top3gram") == true)
  }

  test("duplicate-line character fraction counts ALL copies of a repeated line") {
    // lines: "aaaa" ×2 and "bb" → dup chars 8 of 10 → 800000 fp
    val m = measure("aaaa\nbb\naaaa")
    assert(m("dup_line_char_frac_fp") == 800000L)
    assert(m("r_dup_lines") == false && m("repetition_keep") == false)
    val clean = measure("aaaa\nbb")
    assert(clean("dup_line_char_frac_fp") == 0L && clean("r_dup_lines") == true)
  }

  test("degenerate docs: empty and single-word texts measure zero and keep") {
    Seq("", "word").foreach { t =>
      val m = measure(t)
      assert(m("top2count") == 0L && m("top2gram_char_frac_fp") == 0L)
      assert(m("dup_line_char_frac_fp") == 0L)
      assert(m("repetition_keep") == true, s"'$t' repeats nothing")
    }
  }
}
