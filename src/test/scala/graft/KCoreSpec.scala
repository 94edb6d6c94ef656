package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KCore = bounded-round peeling; semantics pinned on a fixture whose
  * 2-core is known by hand, convergence pinned as a fixpoint, and the
  * plan pinned hash-join-only (the scale contract: induced-subgraph
  * re-derivation is semi-joins, never nested loops).
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // triangle {1,2,3} + path 3-4-5 + star 6-(7,8,9): the 2-core is exactly
  // the triangle (4 survives round 1 via the path, dies round 2; the hub 6
  // has degree 3 but its leaves die immediately, isolating it).
  private lazy val fixture = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
    (6L, 7L), (6L, 8L), (6L, 9L)).toDF("src", "dst")

  test("2-core of the fixture is exactly the triangle, degree 2 each") {
    val got = KCore.peel(fixture, k = 2, rounds = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("peeling is monotone: round-1 survivors strictly contain the core") {
    val r1 = KCore.peel(fixture, k = 2, rounds = 1)
      .select("id").as[Long].collect().toSet
    assert(r1 == Set(1L, 2L, 3L, 4L, 6L),
      "after one peel only the leaf nodes (5,7,8,9) are gone")
  }

  test("3-core of the fixture is empty") {
    assert(KCore.peel(fixture, k = 3, rounds = 3).isEmpty)
  }

  test("extra rounds past the fixpoint change nothing; d31 members honor k") {
    // d31's oracle unrolls exactly 4 peels — truncated iteration is the
    // true 2-core wherever a further round removes nothing. Pin that
    // fixpoint contract on the fixture, and the degree floor on d31 itself.
    val five = KCore.peel(fixture, k = 2, rounds = 5)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(five == Seq((1L, 2L), (2L, 2L), (3L, 2L)),
      "one extra round changes nothing at the fixpoint")
    val d31 = SparkEntry.queries("d31_kcore_members")(spark, TestSpark.sfDir).collect()
    d31.foreach(r => assert(r.getLong(1) >= 2L, "every core member has degree >= k"))
  }

  test("plan: induced-subgraph rounds are hash semi-joins, never nested loops") {
    // peel's returned plan is a truncated cached leaf (lineage re-rooted
    // per round), so the pin targets the round's own induce() step — the
    // exact frame each peel persists.
    import spark.implicits._
    val live = fixture.select(col("src").as("a"), col("dst").as("b"))
      .union(fixture.select(col("dst").as("a"), col("src").as("b")))
    val survivors = Seq(1L, 2L, 3L, 4L).toDF("a")
    val p = KCore.induce(live, survivors).queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"survivor re-induction must be semi-joins:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"no all-pairs anywhere in the peel:\n$p")
  }
}
