package graft

import graft.plans.BucketedRangeJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must be invisible semantically (same rows as the
  * theta join it replaces, nulls included) and decisive physically (the
  * nested-loop join is gone). Conf-gated: everything here toggles
  * `spark.graft.rangeJoin.bucketWidth` and restores it, so the shared
  * test session is untouched for other suites.
  */
class BucketedRangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withWidth[A](w: String)(f: => A): A = {
    BucketedRangeJoinRule.install(spark)
    spark.conf.set(BucketedRangeJoinRule.WidthConf, w)
    try f finally spark.conf.unset(BucketedRangeJoinRule.WidthConf)
  }

  // points: negatives, exact boundaries, a null; intervals: overlapping,
  // empty (lo > hi), null-ended, negative-spanning
  private lazy val points = Seq[(Long, java.lang.Double)](
    (1L, -7.5), (2L, 0.0), (3L, 10.0), (4L, 10.5), (5L, 99.9),
    (6L, 100.0), (7L, null)).toDF("pid", "p")
  private lazy val intervals = Seq[(Long, java.lang.Double, java.lang.Double)](
    (10L, -10.0, 0.0), (11L, 0.0, 10.0), (12L, 10.0, 10.0),
    (13L, 5.0, 105.0), (14L, 50.0, null), (15L, 20.0, 10.0))
    .toDF("iid", "lo", "hi")

  private def naive: DataFrame =
    points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))

  test("rule-rewritten join returns exactly the theta join's rows") {
    val want = naive.collect().toSet
    val got = withWidth("8.0")(naive.collect().toSet)
    assert(got == want, s"rows must be identical; diff=${got.diff(want) ++ want.diff(got)}")
  }

  test("inclusive-upper and strict-lower bound shapes rewrite correctly too") {
    def q = points.join(intervals, col("p") > col("lo") && col("p") <= col("hi"))
    val want = q.collect().toSet
    val got = withWidth("3.0")(q.collect().toSet)
    assert(got == want)
  }

  test("plan: nested loop replaced by an equi join on the bucket") {
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("NestedLoop") || before.contains("Cartesian"),
      s"without the rule this IS a nested-loop shape:\n$before")
    withWidth("8.0") {
      val after = naive.queryExecution.executedPlan.toString
      assert(!after.contains("NestedLoop") && !after.contains("Cartesian"),
        s"with the rule no nested loop may remain:\n$after")
      assert(after.contains("Generate explode"),
        s"intervals must explode to bucket spans:\n$after")
    }
  }

  test("a join that already has an equi key is left alone") {
    val l = Seq((1L, 5.0), (2L, 15.0)).toDF("k", "p")
    val r = Seq((1L, 0.0, 10.0), (2L, 0.0, 10.0)).toDF("k", "lo", "hi")
    withWidth("4.0") {
      val q = l.join(r, l("k") === r("k") && col("p") >= col("lo") && col("p") < col("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate explode"),
        s"an equi conjunct means Spark already hash-joins; no explode:\n$plan")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
    }
  }

  test("disabled (conf unset) leaves plans untouched") {
    BucketedRangeJoinRule.install(spark)
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("NestedLoop") || plan.contains("Cartesian"),
      "without the conf the rule must be a strict no-op")
  }

  // overlap fixtures: touching, nested, disjoint, inverted (start > end),
  // null-ended — the rule must match the theta join on ALL of them,
  // emitting each pair exactly once (multiset compare, not set)
  private lazy val la = Seq[(Long, java.lang.Double, java.lang.Double)](
    (1L, 0.0, 10.0), (2L, 10.0, 20.0), (3L, -5.0, -1.0),
    (4L, 5.0, 3.0), (5L, 7.0, null)).toDF("aid", "as", "ae")
  private lazy val rb = Seq[(Long, java.lang.Double, java.lang.Double)](
    (10L, 9.0, 11.0), (11L, 0.0, 100.0), (12L, -10.0, -6.0),
    (13L, 3.5, 4.0), (14L, null, 50.0)).toDF("bid", "bs", "be")

  private def overlapQ =
    la.join(rb, col("as") < col("be") && col("bs") < col("ae"))

  test("overlap join: identical multiset of pairs, inverted intervals included") {
    val want = overlapQ.collect().toSeq.map(_.toString).sorted
    val got = withWidth("6.0")(overlapQ.collect().toSeq.map(_.toString).sorted)
    assert(got == want,
      s"overlap rewrite must emit the theta join's pairs exactly once each\nwant=$want\ngot=$got")
  }

  test("overlap join plan: both sides explode, no nested loop") {
    withWidth("6.0") {
      val p = overlapQ.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"overlap must become an equi join on the bucket:\n$p")
      assert("Generate explode".r.findAllIn(p).size == 2,
        s"both interval sides must explode to bucket spans:\n$p")
    }
  }

  test("the rewrite reaches SQL-text queries too") {
    points.createOrReplaceTempView("rj_points")
    intervals.createOrReplaceTempView("rj_intervals")
    def q = spark.sql(
      "SELECT pid, iid FROM rj_points JOIN rj_intervals ON p >= lo AND p < hi")
    val want = q.collect().toSet
    withWidth("8.0") {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"the SQL front door gets the same rewrite:\n$p")
      assert(q.collect().toSet == want)
    }
  }
}
