package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bfs

class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def sources(vs: Long*) = vs.toDF("v")

  test("hand-computed hop distances on a small directed graph") {
    // 1→2→3→4, 1→5, 6 isolated, 7→1 (upstream of the source — unreachable)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 5L, 7L -> 1L)
    val got = Bfs.hopDistances(e, sources(1L), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("first discovery wins: a longer path never overwrites the short one") {
    // two routes to 4: 1→2→3→4 (3 hops) and 1→4 (1 hop)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)
    val got = Bfs.hopDistances(e, sources(1L), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(got(4L) == 1L)
  }

  test("maxHops caps the wave; early exit on an exhausted frontier") {
    val chain = edges((1L to 9L).map(i => i -> (i + 1)): _*)
    val capped = Bfs.hopDistances(chain, sources(1L), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // frontier dies at hop 9 < maxHops: loop must exit, result complete
    val full = Bfs.hopDistances(chain, sources(1L), maxHops = 64)
      .as[(Long, Long)].collect().toMap
    assert(full.size == 10 && full(10L) == 9L)
  }

  test("multi-source wave: each vertex takes the nearest seed's distance") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 4L)
    val got = Bfs.hopDistances(e, sources(1L, 10L), maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(got(4L) == 1L && got(2L) == 1L && got(3L) == 2L && got(10L) == 0L)
  }

  test("serial endgame == forced distributed wave, including the maxHops cap") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 4L -> 5L, 5L -> 6L, 9L -> 1L)
    def run(budget: Long) = Bfs.hopDistances(e, sources(1L), maxHops = 2,
        localFinishMaxRows = budget)
      .as[(Long, Long)].collect().toMap
    val local = run(4000000L)
    val dist = run(0L)
    assert(local == dist, s"endgame $local vs distributed $dist")
    assert(local == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("round-count guard refuses an un-unrollable cap") {
    val e = edges(1L -> 2L)
    val err = intercept[IllegalArgumentException] {
      Bfs.hopDistances(e, sources(1L), maxHops = 65)
    }
    assert(err.getMessage.contains("ConnectedComponents"))
  }
}
