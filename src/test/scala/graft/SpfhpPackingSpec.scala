package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpfhpPacking

class SpfhpPackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shapes(hist: Map[Long, Long], budget: Long): Map[List[Long], Long] =
    SpfhpPacking.planSpfhp(hist, budget)
      .groupBy(_.comp.sorted(Ordering[Long].reverse))
      .map { case (c, cls) => c -> cls.map(_.count).sum }

  test("hand trace: best fit with cascade, open-pair, open-partial") {
    // budget 10, {6:1, 5:2, 2:3}: [6] opens at r4; 5s open-pair to
    // [5,5]; the three 2s best-fit the [6] — CASCADE a=⌊4/2⌋=2 fills it
    // to [6,2,2], the last 2 opens alone
    val got = shapes(Map(6L -> 1L, 5L -> 2L, 2L -> 3L), 10L)
    assert(got == Map(List(6L, 2L, 2L) -> 1L, List(5L, 5L) -> 1L, List(2L) -> 1L),
      got.toString)
  }

  test("partial fill takes ONE pack and shifts the remainder class's ranks") {
    // budget 10, {6:2, 2:1}: one 2 partial-fills the FIRST [6] pack;
    // 6-rank 1 must land in [6,2], 6-rank 2 in the untouched [6]
    val docs = Seq((10L, 6L), (11L, 6L), (12L, 2L)).toDF("id", "n_tok")
    val got = SpfhpPacking.pack(docs, "id", "n_tok", budget = 10L)
      .select("id", "len", "rank_in_len", "pack_size", "pack_fill", "pack_csv")
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 6L, 1L, 2L, 8L, "6,2"),
      (11L, 6L, 2L, 1L, 6L, "6"),
      (12L, 2L, 1L, 2L, 8L, "6,2")), got.toString)
  }

  test("stride arithmetic: cascaded packs take consecutive rank blocks") {
    // budget 10, {3:7}: two [3,3,3] packs (ranks 1-3 and 4-6), rank 7 alone
    val docs = (1L to 7L).map(i => (i, 3L)).toDF("id", "n_tok")
    val got = SpfhpPacking.pack(docs, "id", "n_tok", budget = 10L)
      .select("rank_in_len", "pack_csv")
      .as[(Long, String)].collect().toMap
    (1L to 6L).foreach(r => assert(got(r) == "3,3,3", s"rank $r"))
    assert(got(7L) == "3")
  }

  test("later shorter lengths enter earlier open packs by best fit") {
    // budget 10, {7:1, 6:1, 3:2}: both opens stay open; the 3s best-fit
    // the tighter [7] (r3) before the looser [6] (r4) — [7,3] and [6,3]
    val got = shapes(Map(7L -> 1L, 6L -> 1L, 3L -> 2L), 10L)
    assert(got == Map(List(7L, 3L) -> 1L, List(6L, 3L) -> 1L), got.toString)
  }

  test("loud boundaries: oversized length refuses; empty histogram is empty") {
    val e = intercept[IllegalArgumentException](
      SpfhpPacking.planSpfhp(Map(11L -> 1L), 10L))
    assert(e.getMessage.contains("lengths must be"), e.getMessage)
    assert(SpfhpPacking.planSpfhp(Map.empty, 10L).isEmpty)
  }
}
