package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GopherRules
import org.apache.spark.sql.functions._

/** Hand-computed pins for the Gopher rule-pack — the t59 gate proves
  * cross-engine parity; these prove the MEASUREMENTS mean what the
  * paper says on documents small enough to check by hand.
  */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def measure(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(GopherRules.columns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("hand-traced measurements on a 3-line doc") {
    // lines: "- the cat" (bullet), "went to..." (ellipsis), "#ok"
    val m = measure("- the cat\nwent to...\n#ok")
    assert(m("n_words") == 6L)          // -, the, cat, went, to..., #ok
    // non-ws chars: "-thecatwentto...#ok" = 19 → mean 19/6 = 3.166666
    assert(m("mean_word_len_fp") == 3166666L)
    assert(m("hash_ratio_fp") == 166666L)        // 1 hash / 6 words
    assert(m("ellipsis_ratio_fp") == 166666L)    // 1 '...' / 6 words
    assert(m("bullet_frac_fp") == 333333L)       // 1 of 3 lines
    assert(m("ellipsis_line_frac_fp") == 333333L)
    assert(m("alpha_frac_fp") == 833333L)        // 5 of 6 words have [a-z]
    assert(m("n_stopwords") == 1L)               // the; 'to...' is not the word 'to'
  }

  test("published thresholds: a clean 50-word doc with 2 stop words keeps") {
    val text = (Seq.fill(48)("data") ++ Seq("the", "with")).mkString(" ")
    val m = measure(text)
    assert(m("n_words") == 50L && m("r_word_count") == true)
    assert(m("n_stopwords") == 2L && m("r_stop_words") == true)
    assert(m("gopher_keep") == true)
    // one word fewer → word-count floor trips, keep flips
    val m49 = measure((Seq.fill(47)("data") ++ Seq("the", "with")).mkString(" "))
    assert(m49("r_word_count") == false && m49("gopher_keep") == false)
  }

  test("degenerate docs measure zero and fail loudly-but-exactly") {
    val m = measure("")
    assert(m("n_words") == 0L && m("mean_word_len_fp") == 0L)
    assert(m("gopher_keep") == false)
  }

  test("overlapping ellipses count like a left-to-right literal replace") {
    // "......." = 7 dots → two non-overlapping '...' + one leftover dot
    val m = measure(".......")
    assert(m("ellipsis_ratio_fp") == 2000000L) // 2 ellipses / 1 word
  }
}
