package graft.queries

import graft.io.Tables
import graft.operators.TreeDepth
import org.apache.spark.sql.functions._

/** Hierarchy / recursive-traversal operators — the org-chart / BOM /
  * category-tree family relational engines express with recursive CTEs.
  * Spark has no recursive CTE; the engine's answer is
  * [[graft.operators.TreeDepth]] pointer doubling: O(log depth) self-join
  * rounds, one vertex-scale shuffle each. The ORACLE side uses DuckDB's
  * real `WITH RECURSIVE` — a completely independent formulation, so the
  * doubling algebra itself is under cross-engine test.
  */
object HierarchyQueries {

  val defs: Seq[QueryDef] = Seq(

    // H1: per-node depth in a deterministic irregular tree synthesized
    // over the customer keys (testdata has no hierarchy table): node
    // v = c_custkey+1, parent(v) = 1 + (v·7919) mod (v−1) — a
    // pseudo-random parent strictly below v, so depths are
    // data-dependent (max 17 at sf0.01, no closed form) and the doubling
    // loop genuinely iterates (⌈log₂ depth⌉ ≈ 5 rounds, each ONE
    // vertex-scale equi-join — the scale contrast to one-edge-per-round
    // climbing, which would pay `depth` shuffles).
    QueryDef.sql(
      "h1_hierarchy_depth",
      """WITH RECURSIVE k AS (SELECT c_custkey + 1 AS v FROM customer),
        |r AS (SELECT CAST(1 AS BIGINT) AS v, CAST(0 AS BIGINT) AS depth
        |      UNION ALL
        |      SELECT k.v, r.depth + 1 FROM k JOIN r ON r.v = 1 + (k.v * 7919) % (k.v - 1)
        |      WHERE k.v > 1)
        |SELECT v, depth FROM r""".stripMargin) { (spark, dir) =>
      val edges = Tables.load(spark, dir, "customer")
        .select((col("c_custkey") + 1).as("v"))
        .filter(col("v") > 1)
        .withColumn("parent", lit(1) + (col("v") * 7919) % (col("v") - 1))
      TreeDepth.depths(edges, root = 1L)
    })
}
