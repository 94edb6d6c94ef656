package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate contracts: HLL distinct estimates stay within the
  * documented error band of exact counts, and sketches merge associatively
  * (the property that makes them shuffle-light at scale). */
class AggSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hll estimate within 5% of exact distinct on the events corpus") {
    val events = graft.io.Tables.load(spark, TestSpark.sfDir, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("approx percentiles track exact percentiles within 2% of the value range") {
    val events = graft.io.Tables.load(spark, TestSpark.sfDir, "events")
    val ps = array(lit(0.25), lit(0.5), lit(0.75))
    val exact = events.groupBy("event_type")
      .agg(percentile(col("value"), ps).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = events.groupBy("event_type")
      .agg(percentile_approx(col("value"), ps, lit(10000)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val range = events.agg(max("value") - min("value")).head().getDouble(0)
    exact.foreach { case (k, qs) =>
      qs.zip(approx(k)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 0.02 * range, s"$k: approx $a vs exact $e")
      }
    }
  }

  test("sketches merge associatively: union of partial sketches == one-pass sketch") {
    val ids = (1 to 1000).map(i => (i % 7, (i % 331).toLong)).toDF("g", "id")
    val onePass = ids.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id"))).as("n")).head().getLong(0)
    val merged = ids
      .groupBy("g").agg(hll_sketch_agg(col("id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head().getLong(0)
    assert(merged == onePass,
      s"merged partial sketches ($merged) must equal the one-pass sketch ($onePass)")
  }

  test("count-min: overestimate-only, within eps*N, t20 exact column is the truth") {
    val out = SparkEntry.queries("t20_cms_heavy_hitters")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    val total = graft.io.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").count()
    out.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"'$tok': CMS must never underestimate ($est < $exact)")
      assert(est <= exact + (1e-4 * total).toLong + 1,
        s"'$tok': estimate $est beyond eps*N of exact $exact (N=$total)")
      // the t20 DuckDB oracle emits the exact count AS the estimate —
      // valid only while the test corpora stay collision-free at this
      // width (checked at sf0.001/0.01/0.1); this equality is the
      // tripwire that forces the oracle back to rows-only if a denser
      // corpus ever collides every sketch row
      assert(est == exact,
        s"'$tok': estimate $est != exact $exact — t20's exact-mode oracle premise broke")
    }
  }

  test("count-min merge is exact: partition-wise build + merge == one-pass build") {
    import java.io.ByteArrayInputStream
    import org.apache.spark.util.sketch.CountMinSketch
    val words = (1 to 2000).map(i => (i, s"w${i % 97}")).toDF("i", "token")
    val onePass = CountMinSketch.readFrom(new ByteArrayInputStream(
      graft.operators.CountMin.build(words, "token", eps = 1e-3)))
    // the distributed build IS partition-wise + merge; re-derive the same
    // sketch from two disjoint halves merged locally and compare estimates
    val half1 = CountMinSketch.readFrom(new ByteArrayInputStream(
      graft.operators.CountMin.build(words.filter(col("i") <= 1000), "token", eps = 1e-3)))
    val half2 = CountMinSketch.readFrom(new ByteArrayInputStream(
      graft.operators.CountMin.build(words.filter(col("i") > 1000), "token", eps = 1e-3)))
    half1.mergeInPlace(half2)
    (0 until 97).foreach { i =>
      assert(half1.estimateCount(s"w$i") == onePass.estimateCount(s"w$i"),
        s"w$i: merged halves must estimate identically to the one-pass sketch")
    }
  }

  test("cms inner product: join-size estimate is one-sided and tight at small eps") {
    import spark.implicits._
    // known multisets: key k appears (k%7)+1 times in A, (k%5)+1 in B
    val a = (0L until 400L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k)).toDF("k")
    val b = (0L until 400L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k)).toDF("k")
    val exact = (0L until 400L).map(k => ((k % 7) + 1) * ((k % 5) + 1)).sum.toDouble
    val sa = graft.operators.CountMin.build(a, "k", eps = 1e-4)
    val sb = graft.operators.CountMin.build(b, "k", eps = 1e-4)
    val est = graft.operators.CountMin.innerProduct(sa, sb)
    assert(est >= exact, "CMS inner product must never underestimate")
    assert(est <= exact * 1.01 + 1.0,
      s"at eps=1e-4 over ~1.6k/1.2k items the estimate should be tight: est=$est exact=$exact")
    // mismatched sketch geometry is a loud error, not a silent wrong number
    val wrongSeed = spark.range(10).toDF("k")
    val sc = graft.operators.CountMin.build(wrongSeed, "k", eps = 1e-4, seed = 7)
    val e = intercept[IllegalArgumentException] {
      graft.operators.CountMin.innerProduct(sa, sc)
    }
    assert(e.getMessage.contains("same eps/confidence/seed"))
  }
}
