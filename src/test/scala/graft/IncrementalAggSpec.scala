package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.operators.IncrementalAgg: the maintained state must equal the
  * full recompute exactly, across inserts, multi-step merges, and
  * CDC retractions; fully-retracted groups leave the state.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(r: Range) =
    r.map(i => (s"g${i % 7}", i.toLong)).toDF("k", "v")

  private def agg(df: org.apache.spark.sql.DataFrame, sign: Int = 1) =
    df.groupBy(col("k"))
      .agg((count(lit(1)) * sign).as("n"),
        (sum(col("v").cast("decimal(18,2)")) * sign).as("s"))

  private def snapshot(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n").cast("long"), col("s").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("merge(agg(base), agg(delta)) == agg(base union delta), any split point") {
    val all = rows(0 until 500)
    for (split <- Seq(1, 137, 499)) {
      val merged = IncrementalAgg.merge(
        agg(rows(0 until split)), agg(rows(split until 500)),
        keys = Seq("k"), measures = Seq("n", "s"), countCol = "n")
      assert(snapshot(merged) === snapshot(agg(all)), s"split=$split")
    }
  }

  test("chained merges stay exact (associativity of the decimal state)") {
    var state = agg(rows(0 until 100))
    for (day <- 1 to 4)
      state = IncrementalAgg.merge(state, agg(rows(day * 100 until (day + 1) * 100)),
        keys = Seq("k"), measures = Seq("n", "s"), countCol = "n")
    assert(snapshot(state) === snapshot(agg(rows(0 until 500))))
  }

  test("retraction deltas subtract; fully-retracted groups drop from the state") {
    val base = rows(0 until 200)
    val state = agg(base)
    // retract every g3 row
    val retracted = IncrementalAgg.merge(
      state, agg(base.filter(col("k") === "g3"), sign = -1),
      keys = Seq("k"), measures = Seq("n", "s"), countCol = "n")
    assert(snapshot(retracted) === snapshot(agg(base.filter(col("k") =!= "g3"))))
    assert(!retracted.select("k").as[String].collect().contains("g3"),
      "a zero-count group must leave the state, not linger as a (0, 0) row")
  }

  test("measure-name typos and missing columns fail loudly") {
    val a = agg(rows(0 until 10))
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(a, a, Seq("k"), Seq("n", "s"), countCol = "total")
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(a.drop("s"), a, Seq("k"), Seq("n", "s"), countCol = "n")
    }
  }
}
