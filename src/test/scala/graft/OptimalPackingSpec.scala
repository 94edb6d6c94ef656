package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{OptimalPacking, PairPacking}
import graft.operators.OptimalPacking.{PatternUse, Rat}

class OptimalPackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Rat: exact arithmetic, reduction, floor/ceil on negatives") {
    val a = Rat.of(6, -4) // -3/2
    assert(a.n == BigInt(-3) && a.d == BigInt(2))
    assert(a.floor == BigInt(-2) && a.ceil == BigInt(-1))
    assert((Rat.of(1, 3) + Rat.of(1, 6)) == Rat.of(1, 2))
    assert((Rat.of(7, 2) * Rat.of(2, 7)) == Rat.One)
    assert(Rat.of(5, 2).floor == BigInt(2) && Rat.of(5, 2).ceil == BigInt(3))
  }

  test("simplex: hand-checked LP — min x+y st x+2y=4, 3x+y=7 has the unique solution") {
    // unique feasible point x=2, y=1 → z=3
    val (z, x) = OptimalPacking.simplexMin(
      Array(Array(Rat.One, Rat(2)), Array(Rat(3), Rat.One)),
      Array(Rat(4), Rat(7)), Array(Rat.One, Rat.One))
    assert(z == Rat(3) && x.toSeq == Seq(Rat(2), Rat.One))
  }

  test("greedy is provably suboptimal on the separating fixture; optimal certifies 3") {
    // budget 10, hist {5:2, 4:2, 3:4}: the only FULL patterns are [5,5]
    // and [4,3,3], so the LP optimum q[5,5]+2q[4,3,3] (here q=1, cost 3)
    // is unique and integral. Greedy builds [5,5],[4,4],[3,3,3],[3] = 4.
    val hist = Map(5L -> 2L, 4L -> 2L, 3L -> 4L)
    val greedyPacks = PairPacking.planGreedySpans(hist, 10L)
      .map(s => (s.template, s.fromRank, s.toRank)).distinct
    val greedyCount = PairPacking.planGreedySpans(hist, 10L)
      .groupBy(_.template).map { case (t, spans) =>
        val perLen = spans.groupBy(_.len).map { case (l, ss) =>
          ss.map(s => s.toRank - s.fromRank + 1).sum / t.count(_ == l)
        }
        perLen.head
      }.sum
    assert(greedyCount == 4L, s"greedy must burn 4 packs here, got $greedyCount")
    val (uses, lpBound) = OptimalPacking.planOptimal(hist, 10L)
    assert(lpBound == 3L)
    assert(uses == Seq(PatternUse(Seq(5L, 5L), 1L), PatternUse(Seq(4L, 3L, 3L), 2L)),
      uses.toString)
  }

  test("fractional LP still certifies through the floor+residual path") {
    // budget 4, hist {3:1, 2:1}: LP can cover the 2 with half of [2,2]
    // → z* = 1.5 fractional; floor drops it, the residual {2} packs in
    // one bin, total 2 = ceil(1.5) → certified.
    val (uses, lpBound) = OptimalPacking.planOptimal(Map(3L -> 1L, 2L -> 1L), 4L)
    assert(lpBound == 2L)
    assert(uses.map(_.mult).sum == 2L)
    assert(uses.flatMap(u => Seq.fill(u.mult.toInt)(u.pattern)).flatten.sorted ==
      Seq(2L, 3L), uses.toString)
  }

  test("residualPack finds the exact minimum where first-fit would not") {
    // budget 10, items 5,4,4,3,3,3,3,5 → the {5,5,4,4,3,3,3,3} instance:
    // optimal partition is [5,5],[4,3,3],[4,3,3] = 3 bins
    val bins = OptimalPacking.residualPack(Seq(5L, 4L, 4L, 3L, 3L, 3L, 3L, 5L), 10L)
    assert(bins.length == 3, bins.toString)
    assert(bins.map(_.sum).forall(_ <= 10L))
    assert(bins.flatten.sorted == Seq(3L, 3L, 3L, 3L, 4L, 4L, 5L, 5L))
  }

  test("pack: end-to-end canonical pack ids on the separating fixture") {
    // ids 0..7 → lens (by id): 5,5,4,4,3,3,3,3; canonical patterns
    // [5,5] (pack 1) then [4,3,3] (packs 2,3)
    val docs = Seq(
      (0L, 5L), (1L, 5L), (2L, 4L), (3L, 4L),
      (4L, 3L), (5L, 3L), (6L, 3L), (7L, 3L)).toDF("id", "n_tok")
    val got = OptimalPacking.pack(docs, "id", "n_tok", budget = 10L)
      .select("id", "len", "rank_in_len", "pack_id", "pack_size", "pack_fill",
        "pack_csv", "n_packs", "lp_bound")
      .as[(Long, Long, Long, Long, Long, Long, String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got.forall(r => r._8 == 3L && r._9 == 3L), "certificate columns")
    assert(got(0) == ((0L, 5L, 1L, 1L, 2L, 10L, "5,5", 3L, 3L)))
    assert(got(1) == ((1L, 5L, 2L, 1L, 2L, 10L, "5,5", 3L, 3L)))
    assert(got(2) == ((2L, 4L, 1L, 2L, 3L, 10L, "4,3,3", 3L, 3L)))
    assert(got(3) == ((3L, 4L, 2L, 3L, 3L, 10L, "4,3,3", 3L, 3L)))
    // 3-ranks 1,2 → pack 2; ranks 3,4 → pack 3
    assert(got(4)._4 == 2L && got(5)._4 == 2L && got(6)._4 == 3L && got(7)._4 == 3L)
  }

  test("loud boundaries: oversized lengths and pattern blow-up refuse by name") {
    val e = intercept[IllegalArgumentException](
      OptimalPacking.planOptimal(Map(11L -> 1L), 10L))
    assert(e.getMessage.contains("lengths must be"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      OptimalPacking.planOptimal((1L to 30L).map(l => l -> 10L).toMap, 1000L,
        maxPatterns = 100))
    assert(e2.getMessage.contains("maxPatterns"), e2.getMessage)
  }
}
