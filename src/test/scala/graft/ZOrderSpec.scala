package graft

import graft.functions.ZOrder
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout contracts: the interleave is invertible (bit-exact
  * round trip), the normalization clamps onto the grid, and — the point
  * of the whole exercise — a multi-column box predicate over a z-ordered
  * parquet layout scans a small fraction of the rows the SAME predicate
  * scans over a randomly-laid-out copy of the SAME data, purely from
  * row-group min/max statistics. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deinterleave(z: Long, n: Int, bits: Int): Seq[Long] =
    (0 until n).map { i =>
      (0 until bits).map(b => ((z >> (b * n + i)) & 1L) << b).sum
    }

  test("zValue interleave is invertible for 2 and 3 columns") {
    val df = spark.range(2000).select(
      (col("id") * 2654435761L % 1024).as("a"),
      (col("id") * 40503 % 1024).as("b"),
      (col("id") % 1024).as("c"))
    val rows2 = df.withColumn("z", ZOrder.zValue(Seq(col("a"), col("b")), 10))
      .collect()
    rows2.foreach { r =>
      assert(deinterleave(r.getLong(3), 2, 10) == Seq(r.getLong(0), r.getLong(1)))
    }
    val rows3 = df.withColumn("z", ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 10))
      .collect()
    rows3.foreach { r =>
      assert(deinterleave(r.getLong(3), 3, 10) ==
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)))
    }
  }

  test("normalizeToBits maps [min,max] onto the grid and clamps outliers") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
    val got = df.select(ZOrder.normalizeToBits(col("v"), 0.0, 100.0, 4).as("g"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 8L, 15L, 15L))
  }

  test("box predicate over a z-ordered layout prunes row groups; random layout scans everything") {
    val n = 200000L
    // two independent uniform dimensions
    val data = spark.range(n).select(
      (col("id") * 2654435761L % 1024).cast("long").as("x"),
      (col("id") * 40503 % 1024).cast("long").as("y"))
    val zPath = "/tmp/graft_zorder/clustered"
    val rPath = "/tmp/graft_zorder/random"
    ZOrder.layout(data, Seq(col("x"), col("y")), bits = 10, nFiles = 32)
      .write.mode("overwrite").parquet(zPath)
    // counterfactual: same rows, random order, same file count
    data.repartition(32, col("x") * 0 + rand(seed = 7) * 32)
      .write.mode("overwrite").parquet(rPath)

    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("x") >= 100 && col("x") < 164 && col("y") >= 200 && col("y") < 264)
      q.collect()
      val plan = q.queryExecution.executedPlan
      val exec = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = exec.collectLeaves().collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(fail("no FileSourceScanExec leaf"))
      scan.metrics("numOutputRows").value
    }

    val zScanned = scannedRows(zPath)
    val rScanned = scannedRows(rPath)
    // identical answers first
    val expect = data
      .filter(col("x") >= 100 && col("x") < 164 && col("y") >= 200 && col("y") < 264)
      .count()
    assert(spark.read.parquet(zPath)
      .filter(col("x") >= 100 && col("x") < 164 && col("y") >= 200 && col("y") < 264)
      .count() == expect)
    // the random layout's row groups all span the full domain → nothing
    // prunes; the z-ordered layout confines the box to a few groups. The
    // 4× bar is deliberately loose (row-group size and page stats vary by
    // parquet defaults) — the observed gap is far larger.
    assert(rScanned >= n / 2,
      s"random layout should scan most rows, scanned $rScanned of $n")
    assert(zScanned * 4 <= rScanned,
      s"z-ordered layout should scan ≤ 1/4 of the random layout's rows " +
        s"(z=$zScanned vs random=$rScanned)")
  }
}
