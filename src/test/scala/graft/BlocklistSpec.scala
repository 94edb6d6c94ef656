package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Blocklist

/** Laws for the length-grouped shingle-join blocklist matcher; the t70
  * gate hashes the corpus-scale classes, these pin the mechanism edges.
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pats = Seq("bad" -> "adult", "evil.co" -> "malware", "bd" -> "adult")

  private def run(texts: (Long, String)*) =
    Blocklist.matchCategories(texts.toDF("id", "t"), "id", "t", pats)
      .as[(Long, Seq[String], Long, Boolean)].collect().sortBy(_._1).toSeq

  test("substring semantics, category dedup, distinct-pattern count, zero-match kept") {
    val got = run(
      1L -> "embadded here",            // 'bad' inside a word fires
      2L -> "clean text only",
      3L -> "bad and bd two patterns one category",
      4L -> "evil.co and bad")
    assert(got(0) == ((1L, Seq("adult"), 1L, true)))
    assert(got(1) == ((2L, Seq.empty[String], 0L, false)))
    assert(got(2) == ((3L, Seq("adult"), 2L, true)), "two patterns, one category")
    assert(got(3) == ((4L, Seq("adult", "malware"), 2L, true)))
  }

  test("docs shorter than a pattern length are safe; repeats count once") {
    val got = run(1L -> "b", 2L -> "bad bad bad")
    assert(got(0) == ((1L, Seq.empty[String], 0L, false)))
    assert(got(1)._3 == 1L, "the same pattern matching many times is one pattern")
  }

  test("supplementary-plane patterns bucket by codepoints, not UTF-16 units") {
    // U+1F480 is 1 codepoint / 2 UTF-16 units; a UTF-16 bucketing would
    // put the 2-codepoint pattern in the l=3 bucket where no 2-codepoint
    // shingle can ever equal it — a silent false negative
    val skull = new String(Character.toChars(0x1F480))
    val got = Blocklist.matchCategories(
      Seq((1L, s"a${skull}xb"), (2L, "axb")).toDF("id", "t"),
      "id", "t", Seq(s"${skull}x" -> "emoji"))
      .as[(Long, Seq[String], Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, Seq("emoji"), 1L, true)))
    assert(got(1) == ((2L, Seq.empty[String], 0L, false)))
  }

  test("loud bounds: empty list, empty pattern, too many distinct lengths") {
    val df = Seq((1L, "x")).toDF("id", "t")
    intercept[IllegalArgumentException](Blocklist.matchCategories(df, "id", "t", Seq.empty))
    intercept[IllegalArgumentException](
      Blocklist.matchCategories(df, "id", "t", Seq("" -> "c")))
    intercept[IllegalArgumentException](
      Blocklist.matchCategories(df, "id", "t",
        (1 to 40).map(i => ("x" * i) -> "c"), maxLengths = 32))
  }
}
