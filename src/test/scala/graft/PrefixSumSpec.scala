package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum = the naive global window, minus the single-task bottleneck.
  * Equality is pinned against `Window.orderBy` (the semantics oracle) on
  * data with ties, negatives and skew; the plan shape is pinned so the
  * data-scale window can never silently regress to SinglePartition.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame,
                    ordering: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(ordering: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  // ids 0..999 with duplicated keys (ties), negative and zero values
  private lazy val data = spark.range(1000)
    .select((col("id") % 97).as("k"), col("id").as("tb"),
      (when(col("id") % 7 === 0, -col("id")).otherwise(col("id") % 13)).cast("long").as("v"))
    .cache()

  test("ascending running sum matches the naive global window") {
    val got = PrefixSum.withRunningSum(data, "k", descending = false,
        tieBreak = Seq(col("tb")), value = col("v"), out = "cum", buckets = 16)
      .orderBy(col("k"), col("tb")).select(col("cum")).as[Long].collect()
    val want = naive(data, Seq(col("k"), col("tb")))
      .orderBy(col("k"), col("tb")).select(col("cum")).as[Long].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("descending running sum with tie-break matches the naive window") {
    val got = PrefixSum.withRunningSum(data, "k", descending = true,
        tieBreak = Seq(col("tb")), value = col("v"), out = "cum", buckets = 16)
      .orderBy(col("k").desc, col("tb")).select(col("cum")).as[Long].collect()
    val want = naive(data, Seq(col("k").desc, col("tb")))
      .orderBy(col("k").desc, col("tb")).select(col("cum")).as[Long].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("degenerate single-value key still sums correctly") {
    val one = spark.range(100).select(lit(5L).as("k"), col("id").as("tb"),
      lit(1L).as("v"))
    val got = PrefixSum.withRunningSum(one, "k", descending = false,
        tieBreak = Seq(col("tb")), value = col("v"), out = "cum", buckets = 8)
      .orderBy(col("tb")).select(col("cum")).as[Long].collect()
    assert(got.toSeq == (1L to 100L))
  }

  test("decimal values stay exact through the cross-bucket add") {
    val dec = spark.range(200).select(col("id").as("k"), col("id").as("tb"),
      (col("id").cast("decimal(18,2)") / lit(4).cast("decimal(18,2)")).as("v"))
    val got = PrefixSum.withRunningSum(dec, "k", descending = false,
        tieBreak = Seq.empty, value = col("v"), out = "cum", buckets = 8)
      .orderBy(col("k")).select(col("cum").cast("string")).as[String].collect()
    val want = naive(dec, Seq(col("k")))
      .orderBy(col("k")).select(col("cum").cast("string")).as[String].collect()
    // compare numeric values, not precision tags: the distributed add
    // widens decimal(28,6) by one step, values must match exactly
    assert(got.map(BigDecimal(_)).toSeq == want.map(BigDecimal(_)).toSeq)
  }

  test("totalOut attaches the exact grand total from the driver fold") {
    val got = PrefixSum.withRunningSum(data, "k", descending = false,
        tieBreak = Seq(col("tb")), value = col("v"), out = "cum", buckets = 16,
        totalOut = Some("tot"))
      .select(col("tot")).distinct().as[Long].collect()
    val want = data.agg(sum(col("v"))).as[Long].head()
    assert(got.toSeq == Seq(want), "every row carries the one exact total")
  }

  test("plan: data window is pid-partitioned; offsets arrive as a broadcast local relation") {
    val df = PrefixSum.withRunningSum(data, "k", descending = false,
      tieBreak = Seq(col("tb")), value = col("v"), out = "cum", buckets = 16)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(_ps_pid"),
      s"running sum must cluster on the bucket id:\n$p")
    // every Window node summing the data column carries the pid in its
    // partition spec; the only partition-free window sums _ps_tot
    val dataWindows = "Window \\[sum\\(v#[^\n]*".r.findAllIn(p).toList
    assert(dataWindows.nonEmpty && dataWindows.forall(_.contains("_ps_pid")),
      s"data-scale window regressed to a global (single-task) sort:\n$p")
  }

  test("a22/t23: shipped queries ride the bucketed prefix-sum path") {
    for (q <- Seq("a22_pareto_abc", "t23_vocab_growth")) {
      val p = SparkEntry.queries(q)(spark, TestSpark.sfDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("hashpartitioning(_ps_pid"),
        s"$q must bucket its cumulative window")
      assert(!"Window \\[sum\\((rev|new_types)#[^\n]*".r.findAllIn(p).exists(!_.contains("_ps_pid")),
        s"$q has a global-order window over data-scale rows")
    }
  }
}
