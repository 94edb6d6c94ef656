package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scc

class SccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sccOf(vs: Seq[Int], es: Seq[(Long, Long)],
      maxOuter: Int = 25, localFinishMaxRows: Long = 4000000L): Map[Long, Long] =
    Scc.components(vs.map(_.toLong).toDF("id"), "id",
      es.toDF("src", "dst"), "src", "dst", maxOuterRounds = maxOuter,
      localFinishMaxRows = localFinishMaxRows)
      .as[(Long, Long)].collect().toMap

  test("two cycles joined by a one-way bridge are distinct SCCs") {
    // 1→2→3→1 and 5→6→7→5, bridge 3→5 (one way: no mutual reach across)
    val got = sccOf(Seq(1, 2, 3, 5, 6, 7),
      Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 5L -> 6L, 6L -> 7L, 7L -> 5L, 3L -> 5L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("a DAG is all singletons (the trim path)") {
    val got = sccOf(Seq(1, 2, 3, 4, 5),
      Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 4L -> 5L))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("figure-eight: two cycles sharing a vertex are ONE SCC") {
    // 1→2→3→1 and 3→4→5→3 share vertex 3 ⇒ everything mutually reaches
    val got = sccOf(Seq(1, 2, 3, 4, 5),
      Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 3L))
    assert(got.values.toSet == Set(1L) && got.size == 5)
  }

  test("ancestor color pollution forces a second extraction round") {
    // SCC {0,1} feeds cycle {5,6,7}: the cycle's forward color is 0 in
    // round 1 (0 reaches it) but it cannot reach pivot 0, so it must
    // survive to round 2 and extract under its own pivot 5.
    val got = sccOf(Seq(0, 1, 5, 6, 7),
      Seq(0L -> 1L, 1L -> 0L, 0L -> 5L, 5L -> 6L, 6L -> 7L, 7L -> 5L))
    assert(got == Map(0L -> 0L, 1L -> 0L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("isolated vertices and self-loops are singleton SCCs") {
    val got = sccOf(Seq(1, 2, 9), Seq(1L -> 2L, 2L -> 1L, 9L -> 9L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("matches a brute-force transitive closure on a random directed graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val es = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vs = (0L until n.toLong).toSeq
    // Floyd–Warshall reachability
    val reach = Array.fill(n, n)(false)
    es.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k); j <- 0 until n)
      if (reach(k)(j)) reach(i)(j) = true
    val expect = vs.map { v =>
      val mutual = vs.filter(u =>
        u == v || (reach(v.toInt)(u.toInt) && reach(u.toInt)(v.toInt)))
      v -> mutual.min
    }.toMap
    assert(sccOf(vs.map(_.toInt), es) == expect)
  }

  test("outer-round guard refuses loudly instead of looping") {
    // chain of 2-cycles with ids ASCENDING along the chain: every cycle's
    // forward color is polluted down to the head's 2, so each round
    // extracts exactly one 2-cycle and k cycles need k outer rounds — cap
    // at 2 with 3 cycles and demand the named knob. localFinishMaxRows = 0
    // forces the all-distributed path (the endgame would just solve it).
    val es = Seq(
      2L -> 3L, 3L -> 2L, 2L -> 6L,
      6L -> 7L, 7L -> 6L, 6L -> 10L,
      10L -> 11L, 11L -> 10L)
    val err = intercept[IllegalStateException] {
      sccOf(Seq(2, 3, 6, 7, 10, 11), es, maxOuter = 2, localFinishMaxRows = 0L)
    }
    assert(err.getMessage.contains("maxOuterRounds"))
  }

  test("local endgame and all-distributed path agree on a random digraph") {
    // the Multistep hybrid's two phases must produce the SAME labeling:
    // default budget (goes local immediately on this size) vs the forced
    // distributed path (localFinishMaxRows = 0) — bit-identical maps.
    val rnd = new scala.util.Random(7)
    val n = 60
    val es = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vs = (0 until n).toSeq
    assert(sccOf(vs, es) == sccOf(vs, es, localFinishMaxRows = 0L))
  }

  test("tarjanMinLabels matches Floyd–Warshall mutual reachability directly") {
    val rnd = new scala.util.Random(99)
    val n = 50
    val es = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val reach = Array.fill(n, n)(false)
    es.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k); j <- 0 until n)
      if (reach(k)(j)) reach(i)(j) = true
    val expect = (0 until n).map { v =>
      v.toLong -> (0 until n).filter(u =>
        u == v || (reach(v)(u) && reach(u)(v))).min.toLong
    }.toMap
    val got = Scc.tarjanMinLabels(
      (0L until n.toLong).toArray, es.toArray).toMap
    assert(got == expect)
  }

  test("tarjanMinLabels survives a deep chain (no recursion: DFS depth = |V|)") {
    // a 200k-vertex path would overflow a recursive Tarjan's JVM stack;
    // the explicit-stack version must not care. All singletons (no cycle).
    val n = 200000
    val ids = Array.tabulate(n)(_.toLong)
    val es = Array.tabulate(n - 1)(i => (i.toLong, (i + 1).toLong))
    val got = Scc.tarjanMinLabels(ids, es)
    assert(got.length == n && got.forall { case (id, scc) => id == scc })
  }

  test("tarjanMinLabels induces on the vertex set (foreign-endpoint edges dropped)") {
    // edge 1→99 with 99 absent must not crash or invent vertex 99
    val got = Scc.tarjanMinLabels(Array(1L, 2L),
      Array((1L, 2L), (2L, 1L), (1L, 99L), (99L, 1L))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  private def levelsOf(es: Seq[(Long, Long)], maxRounds: Int = 60): Map[Long, Long] =
    Scc.topologicalLevels(es.toDF("src", "dst"), "src", "dst", maxRounds)
      .as[(Long, Long)].collect().toMap

  test("condensation collapses SCCs and drops intra-SCC edges") {
    // 1→2→3→1 (SCC 1) → bridge 3→5 → 5→6→7→5 (SCC 5), plus 7→9 (singleton)
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 5L -> 6L, 6L -> 7L, 7L -> 5L,
      3L -> 5L, 7L -> 9L)
    val labels = Scc.components(
      Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("id"), "id",
      es.toDF("src", "dst"), "src", "dst")
    val cond = Scc.condensation(labels, "id", "scc", es.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toSet
    assert(cond == Set(1L -> 5L, 5L -> 9L), s"got $cond")
  }

  test("topological levels: longest path wins over the short route") {
    // diamond with a long arm: 1→2→4, 1→3a→3b→4 — level(4) must be 3
    val es = Seq(1L -> 2L, 2L -> 4L, 1L -> 30L, 30L -> 31L, 31L -> 4L)
    val got = levelsOf(es)
    assert(got == Map(1L -> 0L, 2L -> 1L, 30L -> 1L, 31L -> 2L, 4L -> 3L))
  }

  test("topological levels of an empty edge set return empty, not an NPE") {
    // SUM() over an empty frame is SQL NULL; the convergence test must
    // never reach it (found by self-review: null.compareTo would throw)
    val got = Scc.topologicalLevels(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    assert(got.count() == 0L)
  }

  test("topological levels refuse loudly on a cycle (non-DAG input)") {
    val err = intercept[IllegalStateException] {
      levelsOf(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L), maxRounds = 5)
    }
    assert(err.getMessage.contains("cycle") || err.getMessage.contains("maxRounds"),
      err.getMessage)
  }

  test("condensation of any SCC labeling levels without refusal (DAG by construction)") {
    // random digraph: condense, then level — must never throw, and every
    // condensation edge must go from a lower or equal? strictly anything;
    // the LAW: level(dst) >= level(src) + 1 for every condensation edge.
    val rnd = new scala.util.Random(17)
    val n = 24
    val es = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val vs = (0L until n.toLong).toSeq
    val labels = Scc.components(vs.toDF("id"), "id", es.toDF("src", "dst"), "src", "dst")
    val cond = Scc.condensation(labels, "id", "scc", es.toDF("src", "dst"), "src", "dst")
    val condEdges = cond.as[(Long, Long)].collect()
    if (condEdges.nonEmpty) {
      val lvl = Scc.topologicalLevels(cond, "src", "dst").as[(Long, Long)].collect().toMap
      condEdges.foreach { case (s2, d2) =>
        assert(lvl(d2) >= lvl(s2) + 1, s"edge $s2->$d2 levels ${lvl(s2)}->${lvl(d2)}")
      }
    }
  }
}
