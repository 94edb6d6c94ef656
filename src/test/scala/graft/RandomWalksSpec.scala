package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RandomWalks

class RandomWalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val diamond = Seq(1L -> 2L, 1L -> 5L, 2L -> 1L, 5L -> 1L)

  private def walks(es: Seq[(Long, Long)], seeds: Seq[Long],
      length: Int, per: Int = 1): Seq[(Long, Long, Long, Long)] =
    RandomWalks.deepWalks(es.toDF("src", "dst"), seeds.toDF("v"), length, per)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  test("hand-traced walk: the mix picks 5, 1, 5 from seed 1") {
    // deg(1)=2 with dst-sorted neighbors [2, 5]; mix(1,0,step,v) mod deg
    // replayed by hand (and by the d57 oracle's identical arithmetic)
    val got = walks(diamond, Seq(1L), length = 3)
    assert(got == Seq((1L, 0L, 0L, 1L), (1L, 0L, 1L, 5L),
      (1L, 0L, 2L, 1L), (1L, 0L, 3L, 5L)))
  }

  test("walksPerSeed: distinct walk ids diverge via the walk term") {
    val got = walks(diamond, Seq(1L), length = 3, per = 2)
    val w0 = got.filter(_._2 == 0L).map(_._4)
    val w1 = got.filter(_._2 == 1L).map(_._4)
    assert(w0 == Seq(1L, 5L, 1L, 5L))
    assert(w1 == Seq(1L, 2L, 1L, 2L)) // hand-traced: walk 1 picks idx 0
  }

  test("serial endgame == forced distributed walks, including dangling death") {
    // a richer graph with a dangling sink (4): both paths must emit the
    // identical (seed, walk, step, v) rows, truncation included
    val es = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 1L, 3L -> 2L)
    def run(budget: Long) = RandomWalks.deepWalks(
        es.toDF("src", "dst"), Seq(1L, 2L, 3L, 4L).toDF("v"),
        length = 6, walksPerSeed = 2, localFinishMaxRows = budget)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val local = run(4000000L)
    val dist = run(0L)
    assert(local == dist, s"endgame and distributed walks diverged")
    assert(local.exists(r => r._1 == 4L && r._3 == 0L) &&
      !local.exists(r => r._1 == 4L && r._3 > 0L),
      "dangling seed emits only step 0 on both paths")
  }

  test("every consecutive hop is a real edge; step 0 is the seed") {
    val rnd = new scala.util.Random(3)
    val es = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }.distinct
    val seeds = es.map(_._1).distinct.take(5)
    val got = walks(es, seeds, length = 6, per = 2)
    val eset = es.toSet
    val bySeedWalk = got.groupBy(t => (t._1, t._2))
    bySeedWalk.foreach { case ((seed, _), rows) =>
      val path = rows.sortBy(_._3).map(_._4)
      assert(path.head == seed)
      path.sliding(2).foreach {
        case Seq(a, b) => assert(eset.contains(a -> b), s"phantom edge $a->$b")
        case _ =>
      }
    }
  }

  test("a walk dies at a dangling vertex instead of looping or failing") {
    // 1→2, 2 dangling: exactly steps 0 and 1 emitted
    val got = walks(Seq(1L -> 2L), Seq(1L), length = 5)
    assert(got == Seq((1L, 0L, 0L, 1L), (1L, 0L, 1L, 2L)))
  }

  test("deterministic across repartitionings") {
    val es = (1L to 30L).map(i => i -> (i % 30 + 1)) ++ Seq(7L -> 3L, 12L -> 9L)
    val a = RandomWalks.deepWalks(es.toDF("src", "dst"), Seq(1L, 7L).toDF("v"), 8)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val b = RandomWalks.deepWalks(
      es.toDF("src", "dst").repartition(7), Seq(1L, 7L).toDF("v").repartition(3), 8)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(a == b)
  }

  test("negative ids: endgame dies where the distributed join dies, never throws") {
    // a negative vertex id makes the Java-% mix negative; the engine's
    // (src, idx) join matches nothing and the walk truncates — the
    // driver twin must truncate identically (it used to throw AIOOBE;
    // self-review bug)
    val es = Seq(-9L -> 2L, 2L -> -9L, 2L -> 3L)
    def run(budget: Long) = RandomWalks.deepWalks(
        es.toDF("src", "dst"), Seq(-9L, 2L).toDF("v"),
        length = 5, walksPerSeed = 2, localFinishMaxRows = budget)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(run(4000000L) == run(0L), "negative-id parity")
  }

  test("length and fan-out guards refuse loudly") {
    assert(intercept[IllegalArgumentException] {
      walks(diamond, Seq(1L), length = 65)
    }.getMessage.contains("length"))
    assert(intercept[IllegalArgumentException] {
      walks(diamond, Seq(1L), length = 2, per = 129)
    }.getMessage.contains("walksPerSeed"))
  }

  private def n2v(es: Seq[(Long, Long)], seeds: Seq[Long], length: Int,
      wb: Long, wc: Long, wf: Long): Seq[(Long, Long, Long)] =
    RandomWalks.node2vecWalks(es.toDF("src", "dst"), seeds.toDF("v"), length,
      wBack = wb, wCommon = wc, wForward = wf)
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("node2vec: zero forward+back weight forces triangle-closing hops only") {
    // step 1 (no prev) is uniform-hash over out(0) = {1,2,4}:
    // mix(0,0,1,0) = 65599 ≡ 1 (mod 3) → idx 1 = vertex 2 (arithmetic,
    // replayed in the comment). Step 2 from 2 with prev=0 is then FORCED
    // by the weights: candidates {4, 5}, 0→4 exists (triangle-closer,
    // w=1), 5 is forward (w=0) — only 4 is admissible.
    val es = Seq(0L -> 1L, 0L -> 2L, 2L -> 4L, 2L -> 5L, 0L -> 4L)
    val got = n2v(es, Seq(0L), length = 2, wb = 0L, wc = 1L, wf = 0L)
    assert(got == Seq((0L, 0L, 0L), (0L, 1L, 2L), (0L, 2L, 4L)))
  }

  test("node2vec: wBack=0 kills the return hop, stranding a pure pendulum") {
    // 1↔2 only: step 2's sole candidate from 2 is back to 1 with weight 0
    // ⇒ total 0 ⇒ the walker stops (documented contract)
    val got = n2v(Seq(1L -> 2L, 2L -> 1L), Seq(1L), length = 5,
      wb = 0L, wc = 1L, wf = 1L)
    assert(got == Seq((1L, 0L, 1L), (1L, 1L, 2L)))
  }

  test("node2vec: every hop is a real edge and walks replay exactly") {
    val rnd = new scala.util.Random(23)
    val es = Seq.fill(80)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter { case (a, b) => a != b }.distinct
    val seeds = es.map(_._1).distinct.take(6)
    val a = n2v(es, seeds, length = 5, wb = 1L, wc = 2L, wf = 4L)
    val b = n2v(es, seeds, length = 5, wb = 1L, wc = 2L, wf = 4L)
    assert(a == b, "reruns must replay identically")
    val eset = es.toSet
    a.groupBy(_._1).foreach { case (seed, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(path.head == seed)
      path.sliding(2).foreach {
        case Seq(x, y) => assert(eset.contains(x -> y), s"phantom edge $x->$y")
        case _ =>
      }
    }
  }

  test("node2vec: all-zero weights refuse") {
    assert(intercept[IllegalArgumentException] {
      n2v(Seq(1L -> 2L), Seq(1L), 2, 0L, 0L, 0L)
    }.getMessage.contains("weights"))
  }
}
