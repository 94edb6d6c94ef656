package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mis

class MisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mis(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Boolean] =
    Mis.maximalIndependentSet(vs.toDF("id"), "id", es.toDF("src", "dst"), "src", "dst")
      .as[(Long, Boolean)].collect().toMap

  test("independence and maximality on random graphs") {
    val rnd = new scala.util.Random(31)
    (1 to 3).foreach { trial =>
      val n = 30 + trial * 10
      val es = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val vs = (0L until n.toLong).toSeq
      val got = mis(vs, es)
      assert(got.size == n)
      val inSet = got.filter(_._2).keySet
      // independence: no edge inside the set
      es.foreach { case (a, b) =>
        assert(!(inSet(a) && inSet(b)), s"trial $trial: edge $a-$b inside the MIS")
      }
      // maximality: every outside vertex has a neighbor inside
      val nbrs = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      got.filter(!_._2).keys.foreach { v =>
        assert(nbrs.getOrElse(v, Set.empty).exists(inSet),
          s"trial $trial: $v is outside with no MIS neighbor — not maximal")
      }
    }
  }

  test("isolated vertices always join; a triangle admits exactly one") {
    val got = mis(Seq(1L, 2L, 3L, 9L), Seq(1L -> 2L, 2L -> 3L, 3L -> 1L))
    assert(got(9L), "isolated vertex must be in the MIS")
    assert(Seq(got(1L), got(2L), got(3L)).count(identity) == 1)
  }

  test("deterministic across repartitionings") {
    val vs = (0L until 40L).toSeq
    val es = (0L until 39L).map(i => i -> (i + 1))
    val a = mis(vs, es)
    val b = Mis.maximalIndependentSet(
        vs.toDF("id").repartition(7), "id",
        es.toDF("src", "dst").repartition(5), "src", "dst")
      .as[(Long, Boolean)].collect().toMap
    assert(a == b)
  }

  test("adjacent vertices congruent mod 1000003 settle via the id tiebreak") {
    // ids ≡ 1 (mod 1000003) share the per-round priority in EVERY round
    // (the mix reduces mod 1000003 and the round term is common), so
    // before the (p, id) tiebreak this path could only hit the maxRounds
    // refusal; now the smaller id must win round 0 and dominate the rest.
    val vs = Seq(1L, 1000004L, 2000007L)
    val es = Seq(1L -> 1000004L, 1000004L -> 2000007L, 1L -> 2000007L)
    val got = Mis.maximalIndependentSet(
      vs.toDF("id"), "id", es.toDF("src", "dst"), "src", "dst", maxRounds = 2)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 1000004L -> false, 2000007L -> false))
  }

  test("round cap refuses loudly") {
    val err = intercept[IllegalArgumentException] {
      mis(Seq(1L), Seq.empty); Mis.maximalIndependentSet(
        Seq(1L).toDF("id"), "id",
        Seq(1L -> 2L).toDF("src", "dst"), "src", "dst", maxRounds = 0)
    }
    assert(err.getMessage.contains("maxRounds"))
  }
}
