package graft

import graft.functions.TextTokens
import graft.functions.expr.WordNgramStructs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity pin for the r18 native n-gram struct expression: for every
  * order the KN family uses (2, 3, 5) the native stream must be
  * BIT-IDENTICAL to the interpreted HOF formulation it replaced —
  * zip_with over slices (order 2/3) / transform(sequence)+element_at
  * (order N) with the `when(size >= n, …).otherwise(empty)` short-doc
  * guard — on the corpus shapes that historically desynchronize
  * tokenizers: multi-whitespace runs, leading/trailing/UNICODE
  * whitespace (split's "\\s+" is Java-regex whitespace; trim strips
  * SPACES only), empty strings, short docs, case folding, and NULL text
  * (native: null array; HOF: empty array — both explode to the same
  * rows, pinned here through both explode flavors).
  */
class NgramStructParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e",
    "a b c d",       // exactly order-1 short for n=5
    "one two",
    "single",
    "",
    "   ",
    "  padded   runs\tof\nwhitespace  here and more words",
    "MiXeD CaSe TOKENS miXed again and AGAIN words",
    "tab\tseparated\ttokens\tand more tokens",
    " nbsp lead token stream pad pad",  // NBSP is NOT \s: stays glued
    "trailing spaces   ",
    "a  a  a  a  a  a")

  private def hofNgrams(n: Int) = {
    val ts = col("__toks")
    val typ = s"array<struct<${(1 to n).map(k => s"w$k:string").mkString(",")}>>"
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - lit(n - 1)),
        i => struct((1 to n).map(k =>
          element_at(ts, i + lit(k - 1)).as(s"w$k")): _*)))
      .otherwise(array().cast(typ))
  }

  for (n <- Seq(2, 3, 5)) {
    test(s"order-$n native struct stream == interpreted HOF stream") {
      val df = spark.createDataFrame(
        fixtures.map(Tuple1.apply) :+ Tuple1(null.asInstanceOf[String]))
        .toDF("text")
        .withColumn("__toks", TextTokens.tokens(col("text")))
        .withColumn("native", WordNgramStructs(col("text"), n))
        .withColumn("hof", hofNgrams(n))
      // exploded parity through BOTH flavors: explode drops empty/null
      // arrays identically; explode_outer keeps one null row identically
      val inner = df.select(explode(col("native")).as("p")).collect().toSeq
      val innerH = df.select(explode(col("hof")).as("p")).collect().toSeq
      assert(inner == innerH, "explode parity")
      val outer = df.select(explode_outer(col("native")).as("p")).collect().toSeq
      val outerH = df.select(explode_outer(col("hof")).as("p")).collect().toSeq
      assert(outer == outerH, "explode_outer parity")
      assert(inner.nonEmpty, "fixture must produce n-grams")
      assert(outer.size > inner.size, "fixture must exercise the empty path")
    }
  }
}
