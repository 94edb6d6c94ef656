package graft

import graft.operators.GroupedLag
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GroupedLag = `lag(value) over (partition by group order by key, tie)`,
  * minus the one-task-per-group bottleneck. Equality is pinned against
  * the exact window on data with key ties (the tie-break is
  * load-bearing), NULL values mid-stream (must lag through as NULL, not
  * be patched with a slice boundary), skewed groups, empty slices
  * (bucket boundaries from the global key distribution leave some
  * (group, bucket) slices empty — the boundary carry must skip them),
  * and null group keys.
  */
class GroupedLagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed groups; duplicate keys; nulls in the lagged value; group "c"
  // concentrated in a narrow key range so most of its slices are empty
  private lazy val data = spark.range(1500)
    .select(
      when(col("id") % 10 === 0, "b")
        .when(col("id") % 10 === 1, "c").otherwise("a").as("g"),
      when(col("id") % 10 === 1, (col("id") % 7).cast("double"))
        .otherwise((col("id") % 331).cast("double")).as("k"),
      col("id").as("tb"),
      when(col("id") % 13 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 10).as("v"))
    .cache()

  private def naive = data.withColumn("prev",
    lag(col("v"), 1).over(
      Window.partitionBy(col("g")).orderBy(col("k").asc, col("tb").asc)))

  for (buckets <- Seq(1, 16)) {
    test(s"matches the exact window (buckets=$buckets)") {
      val got = GroupedLag.withLag(data, Seq("g"), "k",
          tieBreak = Seq(col("tb")), value = col("v"), out = "prev",
          buckets = buckets)
        .orderBy(col("g"), col("tb")).select(col("prev"))
        .as[Option[Long]].collect().toSeq
      val want = naive.orderBy(col("g"), col("tb")).select(col("prev"))
        .as[Option[Long]].collect().toSeq
      assert(got == want)
    }
  }

  test("null group keys form one group; null values lag through as null") {
    val withNulls = spark.range(400).select(
      when(col("id") % 4 === 0, lit(null).cast("string")).otherwise(lit("x")).as("g"),
      (col("id") % 23).cast("double").as("k"),
      col("id").as("tb"),
      when(col("id") % 5 === 0, lit(null).cast("long")).otherwise(col("id")).as("v"))
    val got = GroupedLag.withLag(withNulls, Seq("g"), "k",
        tieBreak = Seq(col("tb")), value = col("v"), out = "prev", buckets = 8)
      .orderBy(col("tb")).select(col("g"), col("prev"))
      .as[(Option[String], Option[Long])].collect().toSeq
    assert(got.size == 400)
    val want = withNulls.withColumn("prev",
        lag(col("v"), 1).over(
          Window.partitionBy(col("g")).orderBy(col("k").asc, col("tb").asc)))
      .orderBy(col("tb")).select(col("g"), col("prev"))
      .as[(Option[String], Option[Long])].collect().toSeq
    assert(got == want)
  }

  test("plan: every window partitions by the bucket id too") {
    val plan = GroupedLag.withLag(data, Seq("g"), "k",
        tieBreak = Seq(col("tb")), value = col("v"), out = "prev", buckets = 8)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("_gl_pid"), s"group-only window: $w"))
  }

  test("the slice-budget guard fails loudly") {
    val e = intercept[IllegalArgumentException] {
      GroupedLag.withLag(data, Seq("g"), "k", tieBreak = Seq(col("tb")),
        value = col("v"), out = "prev", buckets = 8, maxCollectedSlices = 2L)
    }
    assert(e.getMessage.contains("bounded build contract"))
  }
}
