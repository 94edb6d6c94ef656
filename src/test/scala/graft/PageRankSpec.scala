package graft

import graft.operators.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank pins: mass conservation up to floor remainders,
  * symmetry (isomorphic vertices get identical ranks), hub dominance, and
  * the all-dangling degenerate case (uniform ranks, exactly stable).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
    val out = PageRank.run(
      nodes.toDF("v"), edges.toDF("src", "dst"), iters)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.unpersist()
    m
  }

  test("no edges: uniform ranks, stable across rounds") {
    val r = ranks(Seq(1L, 2L, 3L, 4L), Seq.empty)
    assert(r.values.toSet.size == 1)
    assert(r == ranks(Seq(1L, 2L, 3L, 4L), Seq.empty, iters = 1))
  }

  test("mass is conserved up to per-node floor remainders") {
    val n = 4
    val r = ranks(Seq(1L, 2L, 3L, 4L), Seq(1L -> 2L, 2L -> 3L, 3L -> 1L))
    val total = r.values.sum
    // Each of the 5 rounds loses < 1 unit per node per floor division
    // (three divisions per node per round) — tiny against 1e12.
    assert(total <= PageRank.Scale)
    assert(total > PageRank.Scale - 5L * n * 3)
  }

  test("symmetric vertices rank identically; the hub ranks highest") {
    // Star: 1..4 all point at 5; 5 is dangling.
    val r = ranks(Seq(1L, 2L, 3L, 4L, 5L), Seq(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L))
    assert(Seq(r(1L), r(2L), r(3L), r(4L)).toSet.size == 1)
    assert(r(5L) > r(1L))
  }

  test("deterministic across repartitionings (integer arithmetic, no float order)") {
    val nodes = (1L to 20L).toDF("v")
    val edges = (1L to 19L).map(i => (i, i + 1)).toDF("src", "dst")
    val a = PageRank.run(nodes, edges, 3)
    val b = PageRank.run(nodes.repartition(7), edges.repartition(5), 3)
    val av = a.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val bv = b.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    a.unpersist(); b.unpersist()
    assert(av == bv)
  }
}
