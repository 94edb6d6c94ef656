package graft

import graft.operators.DeterministicShuffle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators/DeterministicShuffle: the budget-derived reshard contract —
  * shard count from ceil(Σweight / budget) (never caller-fixed), stable
  * md5 keys, bounded per-shard windows, loud refusal on negative weights. */
class DeterministicShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int, w: Long) =
    (1 to n).map(i => (i.toLong, w)).toDF("id", "tokens")

  test("shard count derives from the token budget, not the caller") {
    // 10 docs x 10 tokens = 100 total; budget 30 -> ceil(100/30) = 4 shards
    val r4 = DeterministicShuffle.reshardByBudget(docs(10, 10L), "id", "tokens", 30L, "s")
      .select("shard").as[Int].collect()
    assert(r4.forall(s => s >= 0 && s < 4), r4.toSeq.toString)
    assert(r4.distinct.length > 1, "10 hashed docs over 4 shards must spread")
    // budget >= total -> exactly one shard, positions contiguous 1..n
    val r1 = DeterministicShuffle.reshardByBudget(docs(10, 10L), "id", "tokens", 1000L, "s")
      .select("shard", "pos").as[(Int, Int)].collect()
    assert(r1.forall(_._1 == 0))
    assert(r1.map(_._2).sorted.toSeq == (1 to 10))
  }

  test("per-shard positions are contiguous and ordered by (key, id)") {
    val out = DeterministicShuffle
      .reshardByBudget(docs(200, 5L), "id", "tokens", 100L, "seed42")
    val rows = out
      .withColumn("k", md5(concat(col("id").cast("string"), lit(":seed42"))))
      .select("shard", "pos", "k", "id").as[(Int, Int, String, Long)].collect()
    rows.groupBy(_._1).foreach { case (shard, grp) =>
      assert(grp.map(_._2).sorted.toSeq == (1 to grp.length),
        s"shard $shard positions must be contiguous 1..${grp.length}")
      val byPos = grp.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(byPos == byPos.sorted, s"shard $shard must order by (key, id)")
    }
  }

  test("deterministic: re-execution and a rebuilt plan agree exactly") {
    val a = DeterministicShuffle.reshardByBudget(docs(100, 7L), "id", "tokens", 70L, "x")
    val once = a.orderBy("id").collect().toSeq
    spark.catalog.clearCache()
    assert(a.orderBy("id").collect().toSeq == once)
    val b = DeterministicShuffle.reshardByBudget(docs(100, 7L), "id", "tokens", 70L, "x")
    assert(b.orderBy("id").collect().toSeq == once)
  }

  test("plan pin: the position window partitions by shard — never SinglePartition") {
    val out = DeterministicShuffle.reshardByBudget(docs(50, 4L), "id", "tokens", 40L, "s")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"budget reshard must never globally sort/number:\n$plan")
    assert("partitionBy=\\[shard".r.findFirstIn(plan).isDefined ||
      "hashpartitioning\\(shard".r.findFirstIn(plan).isDefined,
      s"the window must partition by the shard id:\n$plan")
  }

  test("negative weights refuse loudly; empty input yields one empty shard plan") {
    val bad = Seq((1L, 5L), (2L, -1L)).toDF("id", "tokens")
    val e = intercept[IllegalArgumentException](
      DeterministicShuffle.reshardByBudget(bad, "id", "tokens", 10L, "s"))
    assert(e.getMessage.contains("negative"), e.getMessage)
    val empty = DeterministicShuffle.reshardByBudget(
      docs(0, 1L), "id", "tokens", 10L, "s")
    assert(empty.count() == 0L)
    val e2 = intercept[IllegalArgumentException](
      DeterministicShuffle.reshardByBudget(docs(1, 1L), "id", "tokens", 0L, "s"))
    assert(e2.getMessage.contains("tokensPerShard"), e2.getMessage)
  }
}
