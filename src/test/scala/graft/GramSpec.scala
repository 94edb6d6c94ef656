package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.GramMatrix

class GramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gramOf(rows: Seq[Seq[Long]], dim: Int): (Long, Seq[Long], Seq[(Int, Int, Long)]) = {
    val df = rows.toDF("q").agg(GramMatrix.gram(col("q"), dim).as("g"))
      .select(col("g.n"), col("g.sums"), col("g.entries"))
    val r = df.collect().head
    (r.getLong(0), r.getSeq[Long](1).toSeq,
      r.getSeq[org.apache.spark.sql.Row](2).map(e =>
        (e.getInt(0), e.getInt(1), e.getLong(2))).toSeq)
  }

  test("hand-computed 2-dim Gram: sums and upper triangle") {
    // rows (1,2), (3,4), (-5,6):
    //   n=3, sums=(-1, 12)
    //   dot11 = 1+9+25 = 35; dot12 = 2+12-30 = -16; dot22 = 4+16+36 = 56
    val (n, sums, entries) = gramOf(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(-5L, 6L)), 2)
    assert(n == 3L)
    assert(sums == Seq(-1L, 12L))
    assert(entries == Seq((1, 1, 35L), (1, 2, -16L), (2, 2, 56L)))
  }

  test("matches the naive pair-explode recompute on random vectors") {
    val rnd = new scala.util.Random(5)
    val d = 8
    val rows = Seq.fill(200)(Seq.fill(d)(rnd.nextInt(2001) - 1000L))
    val (n, sums, entries) = gramOf(rows, d)
    assert(n == 200L)
    (0 until d).foreach(i => assert(sums(i) == rows.map(_(i)).sum))
    entries.foreach { case (i, j, dot) =>
      assert(dot == rows.map(r => r(i - 1) * r(j - 1)).sum, s"($i,$j)")
    }
    assert(entries.size == d * (d + 1) / 2)
  }

  test("exact integers: identical across repartitionings") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(500)(Seq.fill(4)(rnd.nextInt(1000).toLong))
    val a = rows.toDF("q").repartition(13)
      .agg(GramMatrix.gram(col("q"), 4)).collect().head.toString
    val b = rows.toDF("q").repartition(2)
      .agg(GramMatrix.gram(col("q"), 4)).collect().head.toString
    assert(a == b)
  }

  test("wrong vector length and overflow both refuse loudly") {
    val short = intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("q").agg(GramMatrix.gram(col("q"), 2)).collect()
    }
    assert(short.getMessage.contains("length") ||
      short.getCause != null && short.getCause.getMessage.contains("length"))
    val big = Long.MaxValue / 2
    val over = intercept[Exception] {
      Seq(Seq(big, big), Seq(big, big)).toDF("q")
        .agg(GramMatrix.gram(col("q"), 2)).collect()
    }
    // multiplyExact(big, big) overflows — the loud-refusal contract
    assert(over.getMessage.contains("overflow") ||
      over.getCause != null && over.getCause.getMessage.contains("overflow"))
  }

  test("null vectors are skipped, not zero-counted") {
    val rows = Seq(Some(Seq(1L, 1L)), None, Some(Seq(2L, 2L)))
    val (n, sums, _) = {
      val df = rows.toDF("q").agg(GramMatrix.gram(col("q"), 2).as("g"))
        .select(col("g.n"), col("g.sums"), col("g.entries"))
      val r = df.collect().head
      (r.getLong(0), r.getSeq[Long](1).toSeq, ())
    }
    assert(n == 2L && sums == Seq(3L, 3L))
  }
}
