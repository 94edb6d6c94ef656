package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Rendezvous

class RendezvousSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("growing n to n+1 moves keys ONLY to the new shard, ~1/(n+1) of them") {
    val keys = spark.range(0, 20000).select(col("id").as("k"))
    val assigned = keys.select(col("k"),
        Rendezvous.assign(col("k"), 10).as("a10"),
        Rendezvous.assign(col("k"), 11).as("a11"))
      .as[(Long, Int, Int)].collect()
    val moved = assigned.filter { case (_, a, b) => a != b }
    assert(moved.forall(_._3 == 10), "a move not landing on the new shard")
    val frac = moved.length.toDouble / assigned.length
    assert(frac > 0.05 && frac < 0.14, s"moved fraction $frac, expected ~1/11")
  }

  test("assignment is balanced within Zipf-free tolerance") {
    val counts = spark.range(0, 30000)
      .select(Rendezvous.assign(col("id"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet == (0 until 8).toSet)
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < mn * 1.2, s"imbalance: min=$mn max=$mx")
  }

  test("single shard is the identity; out-of-range n refuses") {
    val one = spark.range(0, 5).select(Rendezvous.assign(col("id"), 1).as("s"))
      .as[Int].collect()
    assert(one.forall(_ == 0))
    assert(intercept[IllegalArgumentException] {
      Rendezvous.assign(col("id"), 65)
    }.getMessage.contains("nShards"))
  }

  test("stable across repartitionings and reruns (pure expression)") {
    val a = spark.range(0, 5000).select(col("id"), Rendezvous.assign(col("id"), 7).as("s"))
      .as[(Long, Int)].collect().sorted.toSeq
    val b = spark.range(0, 5000).repartition(13)
      .select(col("id"), Rendezvous.assign(col("id"), 7).as("s"))
      .as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
  }
}
