package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Exact triangle counting over an undirected simple graph — the density /
  * clustering-coefficient primitive for the near-dup pair graphs the dedup
  * family emits (a triangle-rich cluster is a template family; a triangle-
  * free star is one hub document quoted everywhere).
  *
  * Algorithm: orient each edge from its lower-(degree, id) endpoint to its
  * higher-(degree, id) endpoint — a total order, so each triangle keeps
  * exactly one acyclic orientation a→b, b→c, a→c and is enumerated once by
  * the wedge join (a→b)⋈(b→c) closed with the (a,c) composite equi-join.
  * Both joins stay hash joins on edge keys; no nested loop ever appears.
  *
  * The orientation is what makes this survive skew: out-degree under the
  * (degree, id) order is O(√m) for every vertex, so wedge fan-out
  * Σ in(b)·out(b) ≤ √m · Σ in(b) = O(m^1.5) — a hub document quoted
  * everywhere gets ALL its edges pointed inward (out-degree 0) instead of
  * pivoting a quadratic wedge set (TrianglesSpec pins this on a star).
  * Triangle totals are orientation-invariant, so the DuckDB oracle can
  * still replay the count from the canonical edge list.
  */
object Triangles {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Edges oriented lower-(degree, id) → higher-(degree, id). Input must be
    * canonical (src < dst, no duplicates); ties in degree fall back to the
    * id order, so the orientation is deterministic and acyclic. */
  private[graft] def orientByDegree(edges: DataFrame, src: String, dst: String): DataFrame = {
    for (c <- Seq(src, dst)) {
      val t = edges.schema(c).dataType
      require(integral.contains(t),
        s"Triangles needs integral node ids; column '$c' is $t — a silent " +
          "numeric cast would null out non-numeric ids and corrupt the count")
    }
    val e = edges.select(col(src).cast("long").as("__s"), col(dst).cast("long").as("__d"))
    val deg = e.select(col("__s").as("n")).unionAll(e.select(col("__d").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // src < dst by contract, so on equal degrees the id order keeps s→d
    e.join(deg.select(col("n").as("__s"), col("deg").as("__sd")), "__s")
      .join(deg.select(col("n").as("__d"), col("deg").as("__dd")), "__d")
      .select(
        when(col("__sd") <= col("__dd"), col("__s")).otherwise(col("__d")).as("u"),
        when(col("__sd") <= col("__dd"), col("__d")).otherwise(col("__s")).as("v"))
  }

  /** (node, n_triangles) for every node that participates in ≥1 triangle.
    * `edges` must be canonical: src < dst, no duplicates. */
  def perNode(edges: DataFrame, src: String, dst: String): DataFrame = {
    // r18: persisted (bounded registry) — the oriented edge frame is
    // consumed THREE times (both wedge branches + the closure join), and
    // each uncached consumer re-derived the caller's whole edge pipeline
    // (for d24 that is the full shingle pair stage, measured ~3× the
    // query's floor). The frame is edge-scale — output-proportional for
    // the near-dup pair graphs this serves, the same bound
    // ConnectedComponents already persists at.
    val o = graft.engine.BoundedCaches.persist(orientByDegree(edges, src, dst))
    val wedges = o.select(col("u").as("a"), col("v").as("b"))
      .join(o.select(col("u").as("b"), col("v").as("c")), "b")
    val tri = wedges.join(
      o.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
