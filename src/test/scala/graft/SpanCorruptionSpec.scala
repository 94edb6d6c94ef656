package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpanCorruption
import org.apache.spark.sql.functions._

/** Laws for T5-style span corruption; the t75 gate replays the
  * relational mechanics cross-engine, these pin the worked example from
  * the paper shape and the edges the corpus never hits.
  */
class SpanCorruptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(text: String, maskPos: Seq[Int]) =
    SpanCorruption.corrupt(Seq((1L, text)).toDF("id", "t"), "id", "t",
      col("pos").isin(maskPos.map(lit): _*))
      .as[(Long, Long, Long, Long, String, String)].collect().head

  test("the docstring example: run merge, numbering, terminator") {
    val r = run("a b c d e", Seq(1, 2, 4))
    assert(r == ((1L, 5L, 3L, 2L,
      "a <extra_id_0> d <extra_id_1>",
      "<extra_id_0> b c <extra_id_1> e <extra_id_2>")))
  }

  test("mask-free doc: input is the doc, target is the bare terminator") {
    val r = run("a b c", Seq.empty)
    assert(r == ((1L, 3L, 0L, 0L, "a b c", "<extra_id_0>")))
  }

  test("fully masked doc: input is one sentinel, target holds everything") {
    val r = run("a b c", Seq(0, 1, 2))
    assert(r == ((1L, 3L, 3L, 1L, "<extra_id_0>", "<extra_id_0> a b c <extra_id_1>")))
  }
}
