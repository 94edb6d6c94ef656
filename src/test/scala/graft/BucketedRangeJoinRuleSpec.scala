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
}
