package graft

import graft.io.{Bucketed, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join's PHYSICAL contract: same bucket count on
  * the join key on both sides → the join plans with ZERO Exchange (each
  * task zips bucket i of both tables), versus the plain parquet join that
  * must shuffle both sides. Values are pinned equal to the plain join, and
  * the j25 gate hashes them against DuckDB — layout is plan-only. */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withNoBroadcast[A](body: => A): A = {
    // Broadcast would hide the property under test (it is ALSO
    // shuffle-free, but we are pinning the bucketed SMJ shape).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("same-bucket-count join: zero Exchange; plain parquet join: shuffles both sides") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_custkey", "o_totalprice")
    val cust = Tables.load(spark, TestSpark.sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
    Bucketed.writeBucketed(orders, "graft_bkt_spec_orders", 8, Seq("o_custkey"))
    Bucketed.writeBucketed(cust, "graft_bkt_spec_customer", 8, Seq("c_custkey"))
    withNoBroadcast {
      val co = Bucketed.colocatedJoin(spark,
        "graft_bkt_spec_orders", "graft_bkt_spec_customer",
        "o_custkey", "c_custkey")
      val coPlan = co.queryExecution.executedPlan.toString
      assert(!coPlan.contains("Exchange"),
        s"co-located join must not shuffle:\n$coPlan")
      assert(coPlan.contains("SortMergeJoin"), coPlan)

      val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plainPlan).length == 2,
        s"the counterfactual plain join shuffles BOTH sides:\n$plainPlan")

      // and the layout changes nothing about the values
      val a = co.groupBy(col("c_mktsegment")).count()
        .orderBy(col("c_mktsegment")).collect().toSeq
      val b = plain.groupBy(col("c_mktsegment")).count()
        .orderBy(col("c_mktsegment")).collect().toSeq
      assert(a == b)
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffling) join — no silent wrong answers") {
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_custkey", "o_totalprice")
    val cust = Tables.load(spark, TestSpark.sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
    Bucketed.writeBucketed(orders, "graft_bkt_spec_o16", 16, Seq("o_custkey"))
    Bucketed.writeBucketed(cust, "graft_bkt_spec_c8", 8, Seq("c_custkey"))
    withNoBroadcast {
      val j = Bucketed.colocatedJoin(spark,
        "graft_bkt_spec_o16", "graft_bkt_spec_c8", "o_custkey", "c_custkey")
      // Spark may shuffle one or both sides here; correctness holds.
      val n = j.count()
      val expected = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    }
  }
}
