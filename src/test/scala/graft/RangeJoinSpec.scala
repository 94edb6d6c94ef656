package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

/** Range-join pins: bucketing must not change results vs the naive theta
  * join — including points on bucket boundaries, interval edges, and
  * intervals spanning many buckets. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0.0), (2L, 3.999), (3L, 4.0), (4L, 6.0), (5L, 10.0), (6L, 25.5), (7L, -1.0)
  ).toDF("pid", "p")
  private lazy val intervals = Seq(
    (10L, 0.0, 6.0),   // spans buckets 0-1 (w=4)
    (11L, 4.0, 4.5),   // inside one bucket
    (12L, 0.0, 30.0),  // spans many buckets
    (13L, 26.0, 27.0)  // matches nothing
  ).toDF("iid", "lo", "hi")

  test("bucketed == naive theta join, half-open intervals") {
    val naive = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 4.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.contains((1L, 10L)) && !naive.contains((4L, 10L)),
      "sanity: lo inclusive, hi exclusive")
  }

  test("bucketed == naive theta join, closed intervals") {
    val naive = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "p", "lo", "hi", 4.0, hiInclusive = true)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.contains((4L, 10L)), "sanity: hi inclusive now matches")
  }

  test("plan: equi-join on bucket, not nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), "range join must plan as an equi-join")
  }
}
