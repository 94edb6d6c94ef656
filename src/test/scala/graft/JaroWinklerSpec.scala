package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.JaroWinkler

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("textbook values (and the DuckDB oracle's, probed bitwise)") {
    // classic Winkler examples + values read back from DuckDB 1.x
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // jaro > 0.7 but zero shared prefix: no boost applies
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333333) < 1e-15)
    assert(jw("aaaa", "aaaa") == 1.0)
  }

  test("boost threshold: jaro exactly at the 0.7 knife edge") {
    // jaro = (1 + 0.5 + 0.6)/3 = 0.7000000000000001 in IEEE — strictly
    // above the literal 0.7, so the prefix-1 boost fires (DuckDB agrees
    // bitwise: 0.7300000000000001).
    assert(jw("abcde", "acbedxxxxx") == 0.7300000000000001)
  }

  test("BYTE semantics, not codepoints (the DuckDB pin)") {
    // 'café' is 5 UTF-8 bytes: l1=5, l2=4 — NOT the codepoint 4/4 score
    // (which would be 0.8833…). DuckDB returns 0.8483….
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-15)
    // 2-byte codepoints shift the window too: byte-wise zero matches
    assert(jw("éa", "aé") == 0.0)
  }

  test("prefix boost caps at 4") {
    // 6 shared leading bytes, but only 4 count: 0.8333… + 4·0.1·(1−…) = 0.9
    assert(math.abs(jw("abcdefgh", "abcdefxx") - 0.9) < 1e-15)
  }

  test("empty and null routing") {
    assert(jw("", "") == 0.0) // DuckDB departs from the textbook 1.0
    assert(jw("abc", "") == 0.0)
    val got = Seq(("a", null), (null, "b"), (null, null), ("ab", "ab"))
      .toDF("l", "r")
      .select(JaroWinkler(col("l"), col("r")).as("jw"))
      .as[Option[Double]].collect()
    assert(got.toSeq == Seq(None, None, None, Some(1.0)))
  }

  test("symmetric in its arguments") {
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
    }
  }

  test("column expression matches the static fold on real part names") {
    val p = io.Tables.load(spark, TestSpark.sfDir, "part")
      .select(col("p_name")).limit(50).as[String].collect()
    val pairs = p.zip(p.reverse).toSeq
    val viaExpr = pairs.toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    val viaStatic = pairs.map { case (a, b) => jw(a, b) }
    assert(viaExpr.toSeq == viaStatic.toSeq)
  }
}
