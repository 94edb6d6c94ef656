package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PairPacking
import org.apache.spark.sql.functions._

/** Laws for the histogram pair-packing greedy. The t68 gate replays
  * the closed form at corpus scale; these pin the driver greedy on
  * hand histograms (including shapes the fixture's counts never hit)
  * and the end-to-end frame contract.
  */
class PairPackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(hist: (Long, Long)*) =
    PairPacking.planSpans(hist.toMap, budget = 10L)
      .map(s => (s.len, s.fromRank, s.toRank, s.partnerLen))

  test("greedy hand traces: cross bulk, self pairs, odd cascade, alone") {
    // 7+3 exact fit is allowed (n+m == budget)
    assert(plan(7L -> 1L, 3L -> 1L) == Seq((7L, 1L, 1L, Some(3L)), (3L, 1L, 1L, Some(7L))))
    // 8 can only take ≤2: alone; the two 3s self-pair
    assert(plan(8L -> 1L, 3L -> 2L) == Seq((8L, 1L, 1L, None), (3L, 1L, 2L, Some(3L))))
    // odd self-pair leftover cascades to the smaller length
    assert(plan(4L -> 3L, 2L -> 1L) == Seq(
      (4L, 1L, 2L, Some(4L)), (4L, 3L, 3L, Some(2L)), (2L, 1L, 1L, Some(4L))))
    // a final odd singleton with nothing left packs alone
    assert(plan(4L -> 1L, 7L -> 2L) == Seq(
      (7L, 1L, 1L, None), (7L, 2L, 2L, None), (4L, 1L, 1L, None))
      || plan(4L -> 1L, 7L -> 2L) == Seq((7L, 1L, 2L, None), (4L, 1L, 1L, None)))
  }

  test("largest remaining partner wins, not first fit") {
    // 6 pairs with 4 (largest ≤ 4), never with 2
    assert(plan(6L -> 1L, 4L -> 1L, 2L -> 1L) == Seq(
      (6L, 1L, 1L, Some(4L)), (4L, 1L, 1L, Some(6L)), (2L, 1L, 1L, None)))
  }

  test("greedy multi-item: template build, bulk reps, self-repeat cap, remainders") {
    def g(hist: (Long, Long)*) =
      PairPacking.planGreedySpans(hist.toMap, budget = 10L)
        .map(s => (s.len, s.fromRank, s.toRank, s.template.mkString(",")))
    // self-repeat is preferred over a smaller length while supply lasts:
    // [4,4,2] first (NOT [4,3,2] — the greedy takes the largest fit), then
    // the 3s self-pack with the last 2
    assert(g(4L -> 2L, 3L -> 2L, 2L -> 2L) == Seq(
      (4L, 1L, 2L, "4,4,2"), (2L, 1L, 1L, "4,4,2"),
      (3L, 1L, 2L, "3,3,2"), (2L, 2L, 2L, "3,3,2")))
    // self-repeats capped by availability: five 3s → [3,3,3] once, [3,3] tail
    assert(g(3L -> 5L) == Seq((3L, 1L, 3L, "3,3,3"), (3L, 4L, 5L, "3,3")))
    // remainder-1 tail packs alone
    assert(g(3L -> 4L) == Seq((3L, 1L, 3L, "3,3,3"), (3L, 4L, 4L, "3")))
    // a length repeats within a template beside another length: [4,4,2]
    assert(g(4L -> 2L, 2L -> 1L) == Seq((4L, 1L, 2L, "4,4,2"), (2L, 1L, 1L, "4,4,2")))
    // pair greedy is the k=2 shadow: same first template when only 2 fit
    assert(g(7L -> 1L, 3L -> 1L) == Seq((7L, 1L, 1L, "7,3"), (3L, 1L, 1L, "7,3")))
  }

  test("packGreedy(): frame contract matches the spans") {
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 3L), (4L, 2L)).toDF("id", "n")
    val got = PairPacking.packGreedy(docs, "id", "n", budget = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // template [4,4,2] fill 10; then [3] alone
    assert(got(1L) == ((4L, 1L, 3L, 10L, "4,4,2")))
    assert(got(2L) == ((4L, 2L, 3L, 10L, "4,4,2")))
    assert(got(4L) == ((2L, 1L, 3L, 10L, "4,4,2")))
    assert(got(3L) == ((3L, 1L, 1L, 3L, "3")))
  }

  test("pack(): rank-in-doc-order spans, fill arithmetic, loud bounds") {
    val docs = Seq((10L, 7L), (20L, 3L), (30L, 8L), (40L, 3L)).toDF("id", "n")
    val got = PairPacking.pack(docs, "id", "n", budget = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4), r.getLong(5))).toMap
    // 8 alone; 7 pairs the FIRST 3 by id (doc 20); the second 3 (doc 40)
    // self-... has no peer left: alone
    assert(got(30L) == ((8L, 1L, None, 1L, 8L)))
    assert(got(10L) == ((7L, 1L, Some(3L), 2L, 10L)))
    assert(got(20L) == ((3L, 1L, Some(7L), 2L, 10L)))
    assert(got(40L) == ((3L, 2L, None, 1L, 3L)))
    intercept[IllegalArgumentException] {
      PairPacking.pack(docs, "id", "n", budget = 5L) // 7 and 8 exceed it
    }
  }
}
