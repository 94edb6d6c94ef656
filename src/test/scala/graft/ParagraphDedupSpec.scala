package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ParagraphDedup

class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    ParagraphDedup.dedup(rows.toDF("id", "text"), "id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("hand case: corpus-wide first-wins, order-preserving reassembly") {
    val got = run(Seq(
      (1L, "alpha\n\nshared\n\nbeta"),
      (2L, "shared\n\ngamma"),       // 'shared' seen first in doc 1
      (3L, "beta\n\nalpha")))        // both seen — collapses to ""
    assert(got(0) == ((1L, 3L, 3L, "alpha\n\nshared\n\nbeta")))
    assert(got(1) == ((2L, 2L, 1L, "gamma")))
    assert(got(2) == ((3L, 2L, 0L, "")))
  }

  test("within-doc repeats keep only the first copy; empty docs survive as rows") {
    val got = run(Seq(
      (1L, "x\n\nx\n\ny"),
      (2L, "")))
    assert(got(0) == ((1L, 3L, 2L, "x\n\ny")))
    assert(got(1) == ((2L, 0L, 0L, "")))
  }

  test("position, not arrival order, breaks ties inside one doc") {
    // 'z' at pos 0 of doc 5 beats 'z' at pos 1 of doc 5 and pos 0 of doc 6
    val got = run(Seq((5L, "z\n\nz"), (6L, "z")))
    assert(got(0) == ((5L, 2L, 1L, "z")))
    assert(got(1) == ((6L, 1L, 0L, "")))
  }
}
