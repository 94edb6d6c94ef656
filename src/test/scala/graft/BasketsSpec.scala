package graft

import graft.operators.Baskets
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-pair mining pinned by hand: support counting, lift arithmetic,
  * duplicate collapse, the support floor, and the hot-basket cap.
  */
class BasketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // b1{1,2,3}, b2{1,2}, b3{1,2,4}, b4{5}; (b2,1) duplicated to pin the
  // distinct collapse. Pair (1,2) appears in 3 of 4 baskets.
  private lazy val items = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (20L, 1L), (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 2L), (30L, 4L),
    (40L, 5L)).toDF("basket", "item")

  test("support and lift match the hand computation") {
    val got = Baskets.frequentPairs(items, "basket", "item", minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only (1,2) reaches support 2: cnt 3, item counts 3 and 3, 4 baskets,
    // lift = 4·3/(3·3) = 1.333333 at 6dp
    assert(got == Seq((1L, 2L, 3L, 3L, 3L, 4L, 1.333333)))
  }

  test("minSupport 1 surfaces every co-occurring pair, a < b ordered") {
    val got = Baskets.frequentPairs(items, "basket", "item", minSupport = 1L)
      .select("item_a", "item_b", "pair_cnt")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (1L, 4L, 1L), (2L, 4L, 1L)))
    got.foreach { case (a, b, _) => assert(a < b) }
  }

  test("hot-basket cap drops oversized baskets before pairing") {
    val got = Baskets.frequentPairs(items, "basket", "item",
      minSupport = 1L, maxBasketItems = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // only b2{1,2} and b4{5} survive the cap: one pair, 2 baskets,
    // lift = 2·1/(1·1) = 2.0
    assert(got == Seq((1L, 2L, 1L, 1L, 1L, 2L, 2.0)))
  }

  test("items in a single basket only never pair with themselves") {
    val solo = Seq((1L, 7L)).toDF("basket", "item")
    assert(Baskets.frequentPairs(solo, "basket", "item", minSupport = 1L).isEmpty)
  }
}
