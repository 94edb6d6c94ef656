package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected simple graph — the density /
  * clustering-coefficient primitive for the near-dup pair graphs the dedup
  * family emits (a triangle-rich cluster is a template family; a triangle-
  * free star is one hub document quoted everywhere).
  *
  * Algorithm: canonical edges (src < dst) enumerate each triangle exactly
  * once as a < b < c — wedge join (a,b)⋈(b,c) then close with the (a,c)
  * composite equi-join. Both joins are hash joins on edge keys; no nested
  * loop ever appears. Scale note: wedge fan-out concentrates on high-degree
  * vertices (Σ deg², the classic skew) — at 100 TB orient each edge from its
  * lower-degree to its higher-degree endpoint first (triangle total is
  * orientation-invariant, wedge work drops to O(m^1.5)); the id-canonical
  * form here is the deterministic baseline the oracle can replay.
  */
object Triangles {

  /** (node, n_triangles) for every node that participates in ≥1 triangle.
    * `edges` must be canonical: src < dst, no duplicates. */
  def perNode(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges.select(col(src).cast("long").as("__s"), col(dst).cast("long").as("__d"))
    val wedges = e.select(col("__s").as("a"), col("__d").as("b"))
      .join(e.select(col("__s").as("b"), col("__d").as("c")), "b")
    val tri = wedges.join(
      e.select(col("__s").as("a"), col("__d").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
