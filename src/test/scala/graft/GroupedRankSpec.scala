package graft

import graft.operators.GroupedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GroupedRank = `row_number() over (partition by group order by key)`,
  * minus the one-task-per-group bottleneck (the r16 verdict's weak: a
  * dominant language at 100 TB is a single sort task under the bare
  * window). Equality is pinned against the exact window (the semantics
  * oracle) on data with ties, skewed groups and negatives; the
  * perplexityBuckets rewrite is pinned output-identical to the old
  * exact-window form; and the plan shape is pinned so the data-scale
  * rank can never silently regress to a group-only window partition.
  */
class GroupedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups with extreme skew (one group holds ~90% of rows), duplicate
  // keys (ties resolved by the tie-break), negative keys
  private lazy val data = spark.range(2000)
    .select(
      when(col("id") % 10 === 0, "b").when(col("id") % 10 === 1, "c")
        .otherwise("a").as("g"),
      ((col("id") % 37) - lit(18)).cast("double").as("k"),
      col("id").as("tb"))
    .cache()

  private def naive(descending: Boolean) = {
    val key = if (descending) col("k").desc else col("k").asc
    data.withColumn("rnk",
        row_number().over(Window.partitionBy(col("g")).orderBy(key, col("tb").asc))
          .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
  }

  private def bucketed(descending: Boolean, buckets: Int) =
    GroupedRank.withGroupRank(data, Seq("g"), "k", descending,
      tieBreak = Seq(col("tb").asc), outRank = "rnk", outCount = "n",
      buckets = buckets)

  for (desc <- Seq(false, true); buckets <- Seq(1, 8)) {
    test(s"matches the exact window (descending=$desc, buckets=$buckets)") {
      val got = bucketed(desc, buckets)
        .orderBy(col("g"), col("tb")).select(col("rnk"), col("n"))
        .as[(Long, Long)].collect().toSeq
      val want = naive(desc)
        .orderBy(col("g"), col("tb")).select(col("rnk"), col("n"))
        .as[(Long, Long)].collect().toSeq
      assert(got == want)
    }
  }

  test("every window in the plan partitions by the bucket id too") {
    val plan = bucketed(descending = true, buckets = 8)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("_gr_pid"), s"group-only window: $w"))
  }

  test("null group keys form one group, exactly like Window.partitionBy") {
    // the broadcast rejoin must be null-safe: a plain === would
    // inner-join null-group rows into NOTHING — silent row LOSS
    val withNulls = spark.range(300)
      .select(
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(lit("x")).as("g"),
        (col("id") % 17).cast("double").as("k"),
        col("id").as("tb"))
    val got = GroupedRank.withGroupRank(withNulls, Seq("g"), "k",
        descending = false, tieBreak = Seq(col("tb").asc),
        outRank = "rnk", outCount = "n", buckets = 8)
      .orderBy(col("tb")).select(col("g"), col("rnk"), col("n"))
      .as[(Option[String], Long, Long)].collect().toSeq
    assert(got.size == 300, s"row loss: ${got.size}")
    val want = withNulls.withColumn("rnk",
        row_number().over(Window.partitionBy(col("g"))
          .orderBy(col("k").asc, col("tb").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .orderBy(col("tb")).select(col("g"), col("rnk"), col("n"))
      .as[(Option[String], Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("the slice-budget guard fails loudly, never silently truncates") {
    val e = intercept[IllegalArgumentException] {
      GroupedRank.withGroupRank(data, Seq("g"), "k", descending = false,
        tieBreak = Seq(col("tb").asc), outRank = "rnk", outCount = "n",
        buckets = 8, maxCollectedSlices = 2L)
    }
    assert(e.getMessage.contains("bounded build contract"))
  }

  test("perplexityBuckets matches the exact-window form it replaced") {
    // a scored-shaped frame: langs skewed, unscored rows, tied means
    // (logprob_fp6/n_scored equal for different docs), negative scores
    val nScored = when(col("id") % 11 === 0, lit(0L))
      .otherwise((col("id") % 5) + 1).cast("long")
    val scored = spark.range(600).select(
        col("id").as("doc_id"),
        when(col("id") % 7 === 0, "fr").otherwise("en").as("lang"),
        nScored.as("n_scored"),
        // exact mean ties by construction: mean = -(id%3+1) nats, so many
        // docs share a key and the doc-id tiebreak is load-bearing
        when(nScored === 0, lit(0L))
          .otherwise(-(col("id") % 3 + 1) * lit(1000000L) * nScored)
          .cast("long").as("logprob_fp6"))
      .cache()
    val got = graft.functions.NgramLm.perplexityBuckets(scored, "doc_id", "lang")
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_scored"),
        col("logprob_fp6"), col("bucket"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    // the pre-r17 exact-window form, verbatim
    val flag = col("n_scored") > 0
    val w = Window.partitionBy(col("lang"), flag)
      .orderBy(when(flag, col("logprob_fp6").cast("double") / col("n_scored")).desc,
        col("doc_id").asc)
    val want = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_lang",
        count(lit(1)).over(Window.partitionBy(col("lang"), flag)))
      .withColumn("tertile", expr("(3 * (rnk - 1)) div n_lang"))
      .select(col("doc_id"), col("lang"), col("n_scored"), col("logprob_fp6"),
        when(!flag, "unscored")
          .when(col("tertile") === 0, "head")
          .when(col("tertile") === 1, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(got == want)
    // the fixture exercises every bucket incl. ties and unscored rows
    val buckets = got.map(_._5).toSet
    assert(buckets == Set("head", "middle", "tail", "unscored"))
  }

  test("perplexityBuckets plan carries no group-only window partitions") {
    val scored = spark.range(300).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      ((col("id") % 4) + 1).cast("long").as("n_scored"),
      (-(col("id") % 9 + 1) * 250000L).cast("long").as("logprob_fp6"))
    val plan = graft.functions.NgramLm.perplexityBuckets(scored, "doc_id", "lang")
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("_gr_pid"), s"group-only window: $w"))
  }
}
