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
    },

    // H2: subtree rollup — each node's proper-descendant count and exact
    // account-balance total, the BOM/org-chart aggregation. Built on
    // [[TreeDepth.ancestorClosure]] (closure doubling: ⌈log₂ depth⌉
    // rounds; the Σdepth(v)-row closure IS the aggregation input, so no
    // asymptotic overhead) + ONE groupBy over the ancestor key. Money in
    // exact decimal (the Num doctrine) — float sums over an
    // engine-dependent aggregation order could never hash-match. The
    // oracle derives the same closure with a recursive CTE.
    QueryDef.sql(
      "h2_subtree_rollup",
      """WITH RECURSIVE k AS (SELECT c_custkey + 1 AS v, CAST(c_acctbal AS DECIMAL(18,2)) AS m FROM customer),
        |c AS (SELECT v, 1 + (v * 7919) % (v - 1) AS anc FROM k WHERE v > 1
        |      UNION ALL
        |      SELECT c.v, 1 + (c.anc * 7919) % (c.anc - 1) FROM c WHERE c.anc > 1)
        |SELECT k.v, COALESCE(d.n_desc, 0) AS n_desc,
        |  round(CAST(COALESCE(d.s, 0) AS DOUBLE), 2) AS subtree_bal
        |FROM k LEFT JOIN (
        |  SELECT c.anc AS v, COUNT(*) AS n_desc, SUM(km.m) AS s
        |  FROM c JOIN k km ON c.v = km.v GROUP BY 1) d ON k.v = d.v""".stripMargin) { (spark, dir) =>
      val k = Tables.load(spark, dir, "customer")
        .select((col("c_custkey") + 1).as("v"),
          col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("m"))
      val edges = k.select(col("v")).filter(col("v") > 1)
        .withColumn("parent", lit(1) + (col("v") * 7919) % (col("v") - 1))
      val closure = TreeDepth.ancestorClosure(edges, root = 1L)
      val rolled = closure.join(k.select(col("v"), col("m")), Seq("v"))
        .groupBy(col("anc"))
        .agg(count(lit(1)).as("n_desc"), sum(col("m")).as("s"))
      k.select(col("v"))
        .join(rolled.select(col("anc").as("v"), col("n_desc"), col("s")), Seq("v"), "left")
        .select(col("v"), coalesce(col("n_desc"), lit(0L)).as("n_desc"),
          round(coalesce(col("s"), lit(0)).cast("double"), 2).as("subtree_bal"))
    },

    // H3: materialized root path — the adjacency→path conversion behind
    // prefix-keyed subtree queries ("give every node a sortable key so a
    // subtree is a LIKE range"). Same doubling loop as h1, but the
    // composed state is a NON-commutative monoid (the ancestor trail in
    // climb order, root last) — the thing doubling supports and a
    // commutative aggregate cannot express. The oracle climbs one edge
    // per recursion step; matching its exact string proves the doubled
    // compositions land in identical order.
    QueryDef.sql(
      "h3_root_paths",
      """WITH RECURSIVE k AS (SELECT c_custkey + 1 AS v FROM customer),
        |e AS (SELECT v, 1 + (v * 7919) % (v - 1) AS p FROM k WHERE v > 1),
        |r AS (SELECT v, p AS anc, CAST(p AS VARCHAR) AS path FROM e
        |      UNION ALL
        |      SELECT r.v, 1 + (r.anc * 7919) % (r.anc - 1),
        |             r.path || '/' || CAST(1 + (r.anc * 7919) % (r.anc - 1) AS VARCHAR)
        |      FROM r WHERE r.anc > 1)
        |SELECT v, path FROM r WHERE anc = 1
        |UNION ALL SELECT 1 AS v, '' AS path""".stripMargin) { (spark, dir) =>
      val edges = Tables.load(spark, dir, "customer")
        .select((col("c_custkey") + 1).as("v"))
        .filter(col("v") > 1)
        .withColumn("parent", lit(1) + (col("v") * 7919) % (col("v") - 1))
      TreeDepth.rootPaths(edges, root = 1L)
    })
}
