package graft

import graft.operators.TreeDepth
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the pointer-doubling hierarchy flattener: exact depths on
  * shapes that stress both extremes (deep chain, flat star), agreement
  * with a local climb on a pseudo-random tree, and the loud failure on
  * cyclic input (instead of an infinite loop or silent wrong depths).
  */
class TreeDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain of 64: logarithmic rounds still resolve depth 63 exactly") {
    val edges = (2L to 64L).map(v => (v, v - 1)).toDF("v", "parent")
    val got = TreeDepth.depths(edges, root = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 64L).foreach(v => assert(got(v) == v - 1, s"node $v"))
  }

  test("star: every leaf at depth 1") {
    val edges = (2L to 50L).map(v => (v, 1L)).toDF("v", "parent")
    val got = TreeDepth.depths(edges, root = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L)
    (2L to 50L).foreach(v => assert(got(v) == 1L))
  }

  test("pseudo-random tree matches a local parent-climb") {
    def parent(v: Long): Long = 1 + (v * 7919) % (v - 1)
    val vs = (2L to 500L)
    val edges = vs.map(v => (v, parent(v))).toDF("v", "parent")
    val got = TreeDepth.depths(edges, root = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def localDepth(v: Long): Long = {
      var (cur, d) = (v, 0L)
      while (cur != 1L) { cur = parent(cur); d += 1 }
      d
    }
    assert(got(1L) == 0L)
    vs.foreach(v => assert(got(v) == localDepth(v), s"node $v"))
  }

  test("ancestor closure == local chain enumeration; subtree counts consistent with depths") {
    def parent(v: Long): Long = 1 + (v * 7919) % (v - 1)
    val vs = (2L to 300L)
    val edges = vs.map(v => (v, parent(v))).toDF("v", "parent")
    val got = TreeDepth.ancestorClosure(edges, root = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = vs.flatMap { v =>
      Iterator.iterate(v)(parent).drop(1).takeWhile(_ != 1L).toSeq :+ 1L match {
        case ancs => ancs.map(a => (v, a))
      }
    }.toSet
    assert(got == want, "closure must be exactly the proper-ancestor pairs")
    // Σ|ancestors(v)| == Σ depth(v): the closure is the depth mass
    val depthSum = TreeDepth.depths(edges, root = 1L)
      .collect().map(_.getLong(1)).sum
    assert(got.size.toLong == depthSum)
  }

  test("root paths: doubled non-commutative composition == local climb order") {
    def parent(v: Long): Long = 1 + (v * 7919) % (v - 1)
    val vs = (2L to 200L)
    val edges = vs.map(v => (v, parent(v))).toDF("v", "parent")
    val got = TreeDepth.rootPaths(edges, root = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "")
    vs.foreach { v =>
      val want = Iterator.iterate(parent(v))(parent)
        .takeWhile(_ != 1L).toSeq :+ 1L
      assert(got(v) == want.mkString("/"), s"node $v climb order")
    }
  }

  test("cyclic input fails loudly instead of looping") {
    val edges = Seq((2L, 3L), (3L, 2L)).toDF("v", "parent")
    val e = intercept[IllegalArgumentException] {
      TreeDepth.depths(edges, root = 1L, maxRounds = 6)
    }
    assert(e.getMessage.contains("unresolved"))
  }

  test("orphan parent (neither root nor listed vertex) fails loudly, not silently dropped") {
    // node 4 points at 99, which is not a vertex: the doubling self-join
    // would silently delete it and return a 2-node "complete" result.
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 99L)).toDF("v", "parent")
    val e = intercept[IllegalArgumentException] {
      TreeDepth.depths(edges, root = 1L)
    }
    assert(e.getMessage.contains("dropped"))
    val e2 = intercept[IllegalArgumentException] {
      TreeDepth.rootPaths(edges, root = 1L)
    }
    assert(e2.getMessage.contains("dropped"))
  }
}
