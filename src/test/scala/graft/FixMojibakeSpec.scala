package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.FixMojibake
import org.apache.spark.sql.functions._

/** Laws for the mojibake repairer. The t66 gate hash-compares five
  * damage classes cross-engine; these pin the mechanism on hand cases
  * including the vetoes the gate fixture can't isolate.
  */
class FixMojibakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def f(s: String): String = FixMojibake.fix(s)

  test("classic single mojibake: Latin-1 and cp1252 renderings both unwind") {
    assert(f("caf\u00C3\u00A9") == "caf\u00E9")
    // cp1252 view of UTF-8 E2 80 99 (right single quote)
    assert(f("a\u00E2\u20AC\u2122b") == "a\u2019b")
    // Latin-1 view of the same bytes (C1 controls instead of specials)
    assert(f("a\u00E2\u0080\u0099b") == "a\u2019b")
    // mixed rendering (cp1252 special + C1 control) maps byte-wise too
    assert(f("a\u00E2\u20AC\u0099b") == "a\u2019b")
  }

  test("double mojibake unwinds in two passes, stops at the fixed point") {
    assert(f("xÃƒÂ©") == "xé")
  }

  test("vetoes: legit Latin-1, pure ASCII, unmappable chars, partial damage") {
    assert(f("naïve café") == "naïve café",
      "real Latin-1 text is not valid UTF-8 and must survive")
    assert(f("plain ascii") == "plain ascii")
    assert(f("日本語 ok") == "日本語 ok",
      "chars with no byte preimage veto the repair")
    // a real em dash beside mojibake: its lone 0x97 byte breaks the
    // strict decode, so the WHOLE string stays (atomicity)
    assert(f("cafÃ© — x") == "cafÃ© — x")
    assert(f("€") == "€", "a lone euro is a lone continuation byte")
    assert(f("") == "")
  }

  test("expression: null propagates, non-string input refuses at analysis") {
    val got = Seq(("cafÃ©"), (null: String)).toDF("s")
      .select(FixMojibake(col("s"))).as[String].collect()
    assert(got.toSeq == Seq("café", null))
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(FixMojibake(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.contains("FixMojibake"), e.getMessage)
  }
}
