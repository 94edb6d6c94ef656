package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by POINTER DOUBLING: every node's depth (distance
  * to the root) in O(log depth) rounds instead of O(depth).
  *
  * The engine has no recursive CTE (Spark SQL doesn't either); the naive
  * fixed-point climbs one parent edge per round — a depth-1000 chain costs
  * 1000 shuffles. Doubling keeps, per node, its CURRENT known ancestor and
  * the exact distance to it, and composes the table with ITSELF each
  * round: after round i every node knows its 2^i-th ancestor (or the root,
  * absorbed by the root's (root, root, 0) self-loop, after which the
  * composed distance stops growing). The state never exceeds one row per
  * node; each round is ONE equi-join shuffle of vertex-scale frames; a
  * depth-2^20 hierarchy finishes in 20 rounds.
  *
  * Iteration hygiene matches [[PageRank]]/[[ConnectedComponents]]: each
  * round persists its composed state, materializes it with the SAME action
  * that evaluates the convergence aggregate (one job per round), and
  * releases the predecessor — lineage stays one round deep, so the plan at
  * round 20 is as small as at round 1.
  *
  * `edges` must be (v, parent) with exactly one row per non-root node,
  * parents strictly "above" (acyclic); `root` is its own parent
  * implicitly. Convergence = every node's ancestor pointer reached the
  * root; `maxRounds` bounds a malformed (cyclic) input instead of looping
  * forever.
  */
object TreeDepth {

  /** Re-root a persisted, materialized frame as a leaf over its RDD (the
    * ConnectedComponents.truncateLineage pattern): the DATA stays cached,
    * but the logical plan stops nesting the iteration history — each
    * doubling round references its predecessor TWICE (self-join), so the
    * un-truncated plan tree grows ~3× per round and Catalyst re-analysis
    * alone was costing seconds by round 5 (measured: round times grew
    * 0.3 → 3.3 s while the data size stayed flat). */
  private def truncateLineage(df: DataFrame): DataFrame =
    graft.engine.Lineage.truncate(df)

  /** One action per round: (unresolved-pointer count, total row count).
    * The total detects SILENT node loss — a node whose parent is neither
    * the root nor a listed vertex joins nothing in the doubling self-join
    * and simply vanishes, which would otherwise drive `pending` to 0 and
    * return an incomplete result without tripping any guard. */
  private def probe(reach: DataFrame, root: Long): (Long, Long) = {
    val r = reach.agg(
      sum(when(col("anc") =!= root, 1L).otherwise(0L)).as("pending"),
      count(lit(1)).as("total")).head()
    (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
  }

  def depths(edges: DataFrame, root: Long, maxRounds: Int = 40): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val rootRow = spark.range(1).select(
      lit(root).as("v"), lit(root).as("anc"), lit(0L).as("d"))
    var reach = edges.select(col("v").cast("long").as("v"),
        col("parent").cast("long").as("anc"), lit(1L).as("d"))
      .unionAll(rootRow)
      .persist(MEMORY_AND_DISK)
    // materialize + first convergence probe in one action
    var (pending, total) = probe(reach, root)
    val expected = total
    var round = 0
    while (pending > 0 && round < maxRounds) {
      val prev = reach
      reach = truncateLineage(reach).alias("a")
        .join(truncateLineage(reach).select(col("v").as("bv"), col("anc").as("banc"),
          col("d").as("bd")).alias("b"), col("a.anc") === col("bv"))
        .select(col("a.v").as("v"), col("banc").as("anc"),
          (col("a.d") + col("bd")).as("d"))
        .persist(MEMORY_AND_DISK)
      val p = probe(reach, root); pending = p._1; total = p._2
      prev.unpersist(blocking = false)
      round += 1
    }
    require(total == expected,
      s"TreeDepth: ${expected - total} node(s) dropped — their parent is neither the root nor a listed vertex (disconnected input)")
    require(pending == 0,
      s"TreeDepth: $pending nodes unresolved after $maxRounds doubling rounds — cyclic input")
    // The final state STAYS persisted: the returned frame reads it, and
    // unpersisting here would hand the caller a lineage that is the whole
    // round-chain of joins. One vertex-scale cache entry per distinct
    // input plan; Bench's clearCache between queries (and the session's
    // LRU) retire it — same contract as PageRank's returned ranks.
    reach.select(col("v"), col("d").as("depth"))
  }

  /** Full ancestor closure — every (node, proper ancestor) pair — by
    * CLOSURE DOUBLING: C₁ = the parent edges, C_{i+1} = C_i ∪ (C_i ∘ C_i),
    * distinct-ed (a k-step and an m-step pair compose to the same
    * (k+m)-step pair along several splits). Converges in ⌈log₂ depth⌉
    * rounds; the state is the closure itself — Σ depth(v) rows, which IS
    * the requested output, so no asymptotic overhead. Same per-round
    * persist/materialize/release hygiene as [[depths]]; the convergence
    * probe (row count stable) shares the materialization action.
    *
    * This is the subtree-rollup primitive: aggregate any per-node measure
    * over `anc` and every node gets its proper-descendant total. */
  def ancestorClosure(edges: DataFrame, root: Long, maxRounds: Int = 40): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var c = edges.select(col("v").cast("long").as("v"),
        col("parent").cast("long").as("anc"))
      .persist(MEMORY_AND_DISK)
    var size = c.count()
    var round = 0
    var grown = true
    while (grown && round < maxRounds) {
      val prev = c
      val base = truncateLineage(c)
      c = base.unionAll(
          base.alias("a").join(base.select(col("v").as("bv"), col("anc").as("banc")).alias("b"),
            col("a.anc") === col("bv"))
            .select(col("a.v").as("v"), col("banc").as("anc")))
        .distinct()
        .persist(MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val newSize = c.count()
      if (sys.env.contains("GRAFT_DEBUG_ROUNDS"))
        println(f"[closure] round=$round size=$size -> $newSize ${(System.nanoTime() - t0) / 1e9}%.2f s")
      prev.unpersist(blocking = false)
      grown = newSize != size
      size = newSize
      round += 1
    }
    require(!grown, s"TreeDepth.ancestorClosure: still growing after $maxRounds rounds — cyclic input")
    c
  }

  /** Materialized path to the root ("anc₁/anc₂/…/root" climbing upward) by
    * the same doubling loop as [[depths]], but composing a NON-commutative
    * monoid: state (v, anc, trail) where `trail` lists the ancestors
    * strictly between v (exclusive) and anc (inclusive) in climb order;
    * composition is `trailₐ ++ "/" ++ trail_b` — order matters, which is
    * exactly what doubling (unlike a commutative aggregate) supports. The
    * root's self-loop composes with an EMPTY trail so paths stop growing
    * once resolved. Output: (v, path) with the root-LAST climb order —
    * callers wanting root-first prefix keys reverse the split array. */
  def rootPaths(edges: DataFrame, root: Long, maxRounds: Int = 40): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rootRow = edges.sparkSession.range(1).select(
      lit(root).as("v"), lit(root).as("anc"), lit("").as("trail"))
    var reach = edges.select(col("v").cast("long").as("v"),
        col("parent").cast("long").as("anc"),
        col("parent").cast("long").cast("string").as("trail"))
      .unionAll(rootRow)
      .persist(MEMORY_AND_DISK)
    var (pending, total) = probe(reach, root)
    val expected = total
    var round = 0
    while (pending > 0 && round < maxRounds) {
      val prev = reach
      reach = truncateLineage(reach).alias("a")
        .join(truncateLineage(reach).select(col("v").as("bv"), col("anc").as("banc"),
          col("trail").as("btrail")).alias("b"), col("a.anc") === col("bv"))
        .select(col("a.v").as("v"), col("banc").as("anc"),
          when(col("btrail") === "", col("a.trail"))
            .otherwise(concat(col("a.trail"), lit("/"), col("btrail"))).as("trail"))
        .persist(MEMORY_AND_DISK)
      val p = probe(reach, root); pending = p._1; total = p._2
      prev.unpersist(blocking = false)
      round += 1
    }
    require(total == expected,
      s"TreeDepth.rootPaths: ${expected - total} node(s) dropped — their parent is neither the root nor a listed vertex (disconnected input)")
    require(pending == 0,
      s"TreeDepth.rootPaths: $pending nodes unresolved after $maxRounds rounds — cyclic input")
    reach.select(col("v"),
      when(col("v") === root, lit("")).otherwise(col("trail")).as("path"))
  }
}
