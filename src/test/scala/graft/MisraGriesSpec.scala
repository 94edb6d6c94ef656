package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MisraGries
import org.apache.spark.sql.functions._

class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bounds(stream: Seq[String], summ: Map[String, Long], k: Int): Unit = {
    val n = stream.length.toLong
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    exact.foreach { case (t, c) =>
      val est = summ.getOrElse(t, 0L)
      assert(est <= c, s"$t overcounted: $est > $c")
      assert(est * (k + 1) >= c * (k + 1) - n,
        s"$t undercounted past N/(k+1): est=$est exact=$c n=$n k=$k")
      if (c * (k + 1) > n) assert(summ.contains(t), s"heavy $t missing")
    }
    summ.keys.foreach(t => assert(exact.contains(t), s"phantom item $t"))
  }

  test("local pass: exact below k distinct; decrement-by-one eviction above") {
    // 3 distinct ≤ k=4: exact counting
    val s1 = Seq("a", "b", "a", "c", "a")
    assert(MisraGries.local(s1.iterator, 4) == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    // the decrement-by-min counterexample: k=2, [a,a,b,b,c] — subtracting
    // the full min=2 would empty the table (ĉ(a)=0 < c(a)−N/(k+1)=1/3);
    // the classic decrement-by-one must keep {a:1, b:1}
    val s0 = Seq("a", "a", "b", "b", "c")
    val g0 = MisraGries.local(s0.iterator, 2)
    assert(g0 == Map("a" -> 1L, "b" -> 1L), g0.toString)
    bounds(s0, g0, 2)
    // eviction regime: bounds hold on an adversarial unique tail
    val s2 = Seq.fill(30)("hot") ++ (1 to 60).map("u" + _) ++ Seq.fill(10)("hot")
    bounds(s2, MisraGries.local(s2.iterator, 5), 5)
    assert(MisraGries.local(s2.iterator, 5).contains("hot"),
      "40/100 item must survive k=5 (threshold N/6)")
  }

  test("merge law: merged partials keep the two-sided bound over the whole stream") {
    val p1 = Seq.fill(20)("x") ++ (1 to 40).map("a" + _)
    val p2 = Seq.fill(25)("x") ++ (1 to 35).map("b" + _) ++ Seq.fill(5)("y")
    val k = 6
    val merged = MisraGries.merge(
      MisraGries.local(p1.iterator, k), MisraGries.local(p2.iterator, k), k)
    assert(merged.size <= k)
    bounds(p1 ++ p2, merged, k)
    assert(merged.contains("x"), "45/125 > N/(k+1)=17.9 must survive the merge")
  }

  test("summary: distributed build keeps every guaranteed-heavy item with the bound") {
    val docs = spark.range(400).select(
      when(pmod(col("id"), lit(2L)) === 0,
        concat(lit("hot"), pmod(col("id"), lit(8L))))
        .otherwise(concat(lit("u"), col("id"))).as("t"))
      .repartition(8)
    val got = MisraGries.summary(docs, "t", k = 12)
      .as[(String, Long)].collect().toMap
    // hot0/2/4/6 each have 50 of 400 rows > 400/13: guaranteed present
    Seq("hot0", "hot2", "hot4", "hot6").foreach { h =>
      assert(got.contains(h), s"$h missing from the summary")
      assert(got(h) <= 50L && got(h) * 13 >= 50L * 13 - 400L, got.toString)
    }
    assert(got.size <= 12)
  }

  test("k guard refuses loudly") {
    val e = intercept[IllegalArgumentException](
      MisraGries.summary(Seq("a").toDF("t"), "t", 0))
    assert(e.getMessage.contains("k must be"), e.getMessage)
  }
}
