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

  test("FP-rounding edge: hi/w rounds down to N while hi > N*w (no dropped bucket)") {
    // With w=7.272233384392826, hi/w evaluates to exactly 34.0 in doubles
    // even though hi > 34*w — the old ceil(hi/w)-1 bound stopped at bucket
    // 33 and silently dropped any point in bucket 34 below hi.
    val w = 7.272233384392826
    val hi = 247.2559350693561
    val p = java.lang.Math.nextDown(hi) // 247.25593506935607, in bucket 34
    val pts = Seq((1L, p)).toDF("pid", "p")
    val ivs = Seq((10L, 240.0, hi)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)), s"point $p < $hi must match the interval")
  }

  test("FP-rounding edge: intervalOverlap ships the left-edge bucket") {
    val w = 7.272233384392826
    val hi = 247.2559350693561
    val edge = java.lang.Math.nextDown(hi)
    // Right interval starts at the overlap's left edge, inside bucket 34 —
    // reportOnce emits the pair only from that bucket, so dropping it
    // under the old bound lost the pair entirely.
    val l = Seq((1L, 240.0, hi)).toDF("k", "ls", "le")
    val r = Seq((1L, edge, 260.0)).toDF("k", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", w)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "overlapping pair must survive bucket-span bounds")
  }

  test("plan: equi-join on bucket, not nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 4.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), "range join must plan as an equi-join")
  }
}
