package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.as[(Int, Long, Long)].collect().map(c => (c._1, c._2) -> c._3).toMap

  test("build == buildWeighted over the aggregated stream (identical cells)") {
    val raw = Seq("a", "b", "a", "c", "a", "b").toDF("t")
    val agg = raw.groupBy("t").agg(count(lit(1)).as("w"))
    assert(cells(CountMin.build(raw, "t", 4, 64)) ==
      cells(CountMin.buildWeighted(agg, "t", "w", 4, 64)))
  }

  test("merge law: sketch of a union == cell-wise sum of partial sketches") {
    val p1 = Seq("a", "b", "a").toDF("t")
    val p2 = Seq("b", "c", "c", "a").toDF("t")
    val whole = cells(CountMin.build(p1.unionAll(p2), "t", 3, 32))
    val merged = (cells(CountMin.build(p1, "t", 3, 32)).toSeq ++
        cells(CountMin.build(p2, "t", 3, 32)).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(whole == merged, "counter addition IS the sketch merge")
  }

  test("estimates are exact without collisions, one-sided over with them") {
    val raw = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val df = raw.toDF("t")
    val q = Seq("a", "b", "c", "zz").toDF("t")
    // wide sketch: 3 items in 1024 buckets × 4 rows — exact w.h.p., and
    // deterministically exact for THIS fixed hash (checked here)
    val wide = CountMin.estimate(CountMin.build(df, "t", 4, 1024), q, "t", 4, 1024)
      .as[(String, Long)].collect().toMap
    assert(wide == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "zz" -> 0L), wide.toString)
    // width 2 forces collisions: estimates must never UNDERcount
    val tight = CountMin.estimate(CountMin.build(df, "t", 2, 2), q, "t", 2, 2)
      .as[(String, Long)].collect().toMap
    assert(tight("a") >= 5L && tight("b") >= 3L && tight("c") >= 1L,
      s"one-sided bound violated: $tight")
  }

  test("loud boundaries on depth and width") {
    val df = Seq("a").toDF("t")
    val e = intercept[IllegalArgumentException](CountMin.build(df, "t", 0, 64))
    assert(e.getMessage.contains("depth"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](CountMin.build(df, "t", 4, 1))
    assert(e2.getMessage.contains("width"), e2.getMessage)
  }
}
