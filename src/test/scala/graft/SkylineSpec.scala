package graft

import graft.operators.Skyline
import org.scalatest.funsuite.AnyFunSuite

/** Skyline semantics pinned by hand: strict-dominance filtering, frontier
  * ties all surviving, per-group independence, and the scale contract (one
  * pass over the input; the sweep runs on groupBy-reduced candidates).
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, x, y): frontier is {1 (1,9), 2 (3,4), 3 (7,2)}.
  //   4 (3,5) dominated by 2; 5 (7,3) dominated by 3;
  //   6 (1,9) duplicates 1 — equal pairs do not dominate, both survive;
  //   7 (9,2) dominated by 3 (same y, larger x).
  private lazy val pts = Seq(
    (1L, 1L, 9L), (2L, 3L, 4L), (3L, 7L, 2L), (4L, 3L, 5L),
    (5L, 7L, 3L), (6L, 1L, 9L), (7L, 9L, 2L)).toDF("id", "x", "y")

  test("global frontier keeps exactly the non-dominated rows, dup points included") {
    val got = Skyline.frontier2d(pts, Seq.empty, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("groups compute independent frontiers") {
    val grouped = Seq(
      ("a", 1L, 1L, 9L), ("a", 2L, 3L, 4L), ("a", 4L, 3L, 5L),
      ("b", 8L, 3L, 5L), ("b", 9L, 5L, 9L)).toDF("g", "id", "x", "y")
    val got = Skyline.frontier2d(grouped, Seq("g"), "x", "y")
      .select("g", "id").as[(String, Long)].collect().toSet
    // (b, 9) is dominated inside no group: 8 has smaller y but its x is
    // smaller too, so 8 dominates 9 — b's frontier is {8} alone; a's
    // dominated row 4 falls as in the global case.
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 8L)))
  }

  test("frontier of a frontier is itself (idempotence)") {
    val once = Skyline.frontier2d(pts, Seq.empty, "x", "y")
    val twice = Skyline.frontier2d(once, Seq.empty, "x", "y")
    assert(twice.select("id").as[Long].collect().toSet ==
      once.select("id").as[Long].collect().toSet)
  }

  test("o3's gate plan never self-joins the fact table (one scan of part)") {
    val df = SparkEntry.queries("o3_skyline_frontier")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"skyline should read part for candidates + join-back, got $scans scans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the dominance filter must be the sweep, never a pair join")
  }
}
