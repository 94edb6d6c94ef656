package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.UnicodeNormalize
import org.apache.spark.sql.functions._

/** Laws for the UAX #15 normalizer. NFC is oracled cross-engine by
  * t69; NFKC/NFD/NFKD have no DuckDB twin, so their mappings pin here.
  */
class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("s").select(UnicodeNormalize(col("s"), form)).as[String].collect().head

  test("NFC composes, NFD decomposes, and they invert each other") {
    assert(norm("café", "NFC") == "café")
    assert(norm("café", "NFD") == "café")
    assert(norm(norm("café", "NFD"), "NFC") == "café")
  }

  test("NFKC adds compatibility folding NFC must not do") {
    assert(norm("ﬁne", "NFC") == "ﬁne", "ligature is NFC-invariant")
    assert(norm("ﬁne", "NFKC") == "fine", "ligature folds under NFKC")
    assert(norm("x²", "NFKC") == "x2", "superscript folds under NFKC")
    assert(norm("①", "NFKC") == "1", "circled digit folds under NFKC")
  }

  test("null propagates; an invalid form fails at construction; ASCII is a fixed point") {
    assert(norm("plain", "NFKC") == "plain")
    val got = Seq((null: String)).toDF("s")
      .select(UnicodeNormalize.nfc(col("s"))).as[String].collect()
    assert(got.toSeq == Seq(null))
    intercept[IllegalArgumentException] {
      UnicodeNormalize(col("s"), "NFX")
    }
  }
}
