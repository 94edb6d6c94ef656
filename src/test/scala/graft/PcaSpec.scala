package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pca
import graft.functions.expr.GramMatrix

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gramOf(rows: Seq[Seq[Long]], dim: Int) =
    rows.toDF("q").agg(GramMatrix.gram(col("q"), dim).as("g"))
      .select(col("g.n").as("n"), col("g.sums").as("sums"), col("g.entries").as("entries"))

  test("hand case: variance concentrated on axis 1 points the direction there") {
    // centered data (first coordinate spread ±100, second ±1):
    // C ≈ diag(big, small) ⇒ dominant direction = e1
    val rows = Seq(
      Seq(100L, 1L), Seq(-100L, -1L), Seq(100L, -1L), Seq(-100L, 1L))
    val got = Pca.topDirectionFixedPoint(gramOf(rows, 2), 2, rounds = 6,
        cDiv = 1L, xScale = 100000L)
      .as[(Int, Long)].collect().toMap
    assert(math.abs(got(1)) == 100000L, got.toString) // unit coordinate on axis 1
    assert(math.abs(got(2)) < 200L, got.toString)     // ~1e-3 leakage on axis 2
  }

  test("fixed-point direction matches double-precision power iteration") {
    val rnd = new scala.util.Random(17)
    val d = 6
    // plant a dominant direction (isotropic noise has λ₂/λ₁ ≈ 1 and power
    // iteration converges arbitrarily slowly — a real property, not a bug)
    val axis = Array(5, -3, 4, 1, -2, 2)
    val rows = Seq.fill(300) {
      val t = rnd.nextInt(2001) - 1000
      (0 until d).map(i => axis(i) * t + rnd.nextInt(401) - 200L)
    }
    val got = Pca.topDirectionFixedPoint(gramOf(rows, d), d, rounds = 12,
        cDiv = 1000000000L, xScale = 100000L)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2.toDouble)
    // reference: double power iteration on the exact covariance numerator
    val n = rows.size.toDouble
    val sums = (0 until d).map(i => rows.map(_(i)).sum.toDouble)
    val c = Array.tabulate(d, d)((i, j) =>
      n * rows.map(r => r(i) * r(j)).sum - sums(i) * sums(j))
    var v = Array.fill(d)(1.0)
    (1 to 50).foreach { _ =>
      val y = (0 until d).map(i => (0 until d).map(j => c(i)(j) * v(j)).sum).toArray
      val nn = math.sqrt(y.map(x => x * x).sum)
      v = y.map(_ / nn)
    }
    val dot = got.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.999, s"cosine to the double-precision direction: $cos")
  }

  test("zero-collapse and overflow both refuse loudly") {
    val rows = Seq(Seq(1L, 1L), Seq(1L, 1L)) // zero covariance
    val zero = intercept[IllegalArgumentException] {
      Pca.topDirectionFixedPoint(gramOf(rows, 2), 2, cDiv = 1000000000L)
    }
    assert(zero.getMessage.contains("cDiv"))
    // C₁₁ = (a−b)² = 3.6e13; with cDiv=1 and a 1e12 iterate the first
    // C'·x product is ~3.6e25 ⇒ multiplyExact must throw
    val big = Seq(Seq(3000000L, 1L), Seq(-3000000L, -1L))
    val over = intercept[ArithmeticException] {
      Pca.topDirectionFixedPoint(gramOf(big, 2), 2, cDiv = 1L,
        xScale = 1000000000000L)
    }
    assert(over.getMessage.toLowerCase.contains("overflow"))
  }

  test("dimension mismatch refuses") {
    val err = intercept[IllegalArgumentException] {
      Pca.topDirectionFixedPoint(gramOf(Seq(Seq(1L, 2L)), 2), 3)
    }
    assert(err.getMessage.contains("dims"))
  }
}
