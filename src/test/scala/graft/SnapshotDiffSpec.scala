package graft

import graft.operators.SnapshotDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.operators.SnapshotDiff: every classification on a handcrafted
  * diff, null-safe value compares, and the d16 normalization pin (unit
  * norm after rounding). */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged; NULL edits are changes") {
    val prev = Seq(
      (1L, Some("a")), // unchanged
      (2L, Some("b")), // changed b → c
      (3L, Some("x")), // removed
      (5L, None: Option[String]), // changed NULL → e (null-safe compare)
      (6L, Some("f")) // unchanged-with-null? no: f == f
    ).toDF("id", "v")
    val next = Seq(
      (1L, Some("a")),
      (2L, Some("c")),
      (4L, Some("d")), // added
      (5L, Some("e")),
      (6L, Some("f"))
    ).toDF("id", "v")
    val got = SnapshotDiff.diff(prev, next, keys = Seq("id"), compare = Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "changed", 6L -> "unchanged"))
  }

  test("NULL-keyed rows keep correct side attribution (null-safe key join)") {
    // A NULL key only in prev must read as removed (not added), one only in
    // next as added, and a NULL key present on both sides must match itself.
    val prev = Seq((Option.empty[Long], "p"), (Some(1L), "x")).toDF("id", "v")
    val next = Seq((Option.empty[Long], "p"), (Some(2L), "y")).toDF("id", "v")
    val got = SnapshotDiff.diff(prev, next, Seq("id"), Seq("v"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(got == Map(None -> "unchanged", Some(1L) -> "removed", Some(2L) -> "added"))
  }

  test("diff output carries both sides' values for audit") {
    val prev = Seq((1L, 10)).toDF("id", "v")
    val next = Seq((1L, 20)).toDF("id", "v")
    val row = SnapshotDiff.diff(prev, next, Seq("id"), Seq("v")).collect()(0)
    assert(row.getAs[Int]("old_v") == 10 && row.getAs[Int]("new_v") == 20)
  }

  test("d16: normalized vectors have unit L2 norm (to rounding)") {
    val out = SparkEntry.queries("d16_embedding_normalize")(spark, TestSpark.sfDir)
      .groupBy("vec_id").agg(sum(col("nv") * col("nv")).as("sq"))
      .collect().map(_.getDouble(1))
    assert(out.nonEmpty && out.forall(s => math.abs(s - 1.0) < 1e-4),
      "sum of squared normalized components must be ~1 per vector")
  }
}
