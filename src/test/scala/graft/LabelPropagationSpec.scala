package graft

import graft.operators.LabelPropagation
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the deterministic synchronous LPA: exact agreement with a
  * local simulation of the same rule (most-frequent neighbor label, ties
  * to the smallest, isolated vertices keep theirs) on shapes that stress
  * tie-breaking, bridges, and isolation.
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local reference simulation of the exact rule. */
  private def simulate(
      vs: Seq[Long], undirected: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (undirected ++ undirected.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = vs.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = vs.map { v =>
        adj.get(v) match {
          case None => v -> lab(v)
          case Some(ns) =>
            val counts = ns.groupBy(lab).view.mapValues(_.size).toSeq
            val best = counts.minBy { case (l, c) => (-c, l) }._1
            v -> best
        }
      }.toMap
    }
    lab
  }

  private def run(vs: Seq[Long], es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.run(vs.toDF("v"), es.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge keep distinct communities; CC would merge them") {
    val vs = (1L to 6L)
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = run(vs, es, rounds = 3)
    assert(got == simulate(vs, es, 3))
    // both triangles collapse to their own minimum; the bridge does not merge them
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L), "LPA must keep the two dense regions distinct")
    val cc = graft.operators.ConnectedComponents.minLabel(
      vs.toDF("v"), "v", es.toDF("src", "dst"), "src", "dst")
    assert(cc.select("label").distinct().count() == 1, "CC merges across the bridge")
  }

  test("star, isolated vertices, and tie-breaks all match the local simulation") {
    val vs = (1L to 12L)
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), // star on 1
      (6L, 7L), // a lone edge: mutual swap each round
      (8L, 9L), (8L, 10L), (9L, 10L)) // triangle; 11, 12 isolated
    for (r <- 1 to 4) {
      val got = run(vs, es, rounds = r)
      assert(got == simulate(vs, es, r), s"rounds=$r")
      assert(got(11L) == 11L && got(12L) == 12L, "isolated vertices keep their labels")
    }
  }

  test("pseudo-random graph matches the simulation exactly over several rounds") {
    val vs = (0L until 60L)
    val es = vs.flatMap(v => Seq((v, (v * 7 + 3) % 60), (v, (v * 13 + 1) % 60)))
      .filter { case (a, b) => a != b }.distinct
    for (r <- Seq(1, 3)) {
      assert(run(vs, es, r) == simulate(vs, es, r), s"rounds=$r")
    }
  }
}
