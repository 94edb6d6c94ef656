package graft

import graft.operators.Hits
import org.scalatest.funsuite.AnyFunSuite

/** HITS semantics pinned by hand-computed exact-integer iterates on a
  * fixture, plus the bipartite invariant and the overflow guard's refusal.
  */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Bipartite: hubs {1,2} → authorities {10,11,12}.
  //   1 → 10, 11, 12        (broad hub)
  //   2 → 10                (narrow hub)
  // Round 1: a(10)=2, a(11)=1, a(12)=1; h(1)=4, h(2)=2.
  // Round 2: a(10)=h1+h2=6, a(11)=4, a(12)=4; h(1)=14, h(2)=6.
  private lazy val fixture =
    Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")

  test("two exact-integer rounds match the hand computation") {
    val got = Hits.run(fixture, rounds = 2)
      .orderBy("v").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 14L, 0L), (2L, 6L, 0L),
      (10L, 0L, 6L), (11L, 0L, 4L), (12L, 0L, 4L)))
  }

  test("one round reproduces (in-degree, summed in-degree) exactly") {
    val got = Hits.run(fixture, rounds = 1)
      .orderBy("v").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L), (2L, 2L, 0L),
      (10L, 0L, 2L), (11L, 0L, 1L), (12L, 0L, 1L)))
  }

  test("pure-authority vertices keep hub 0; pure hubs keep authority 0") {
    val rows = Hits.run(fixture, rounds = 3).as[(Long, Long, Long)].collect()
    rows.foreach { case (v, hub, auth) =>
      if (v >= 10L) assert(hub == 0L, s"sink $v grew a hub score")
      else assert(auth == 0L, s"source $v grew an authority score")
    }
  }

  test("overflow guard refuses round counts the degree profile cannot carry") {
    // 2^20-ish degrees on both sides: (din*dout)^rounds overflows fast.
    val wide = (1L to 2048L).flatMap(i => Seq((0L, i), (i + 10000L, 1L)))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException](Hits.run(wide, rounds = 3))
    assert(e.getMessage.contains("exceed Long range"))
  }
}
