package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an explicit edge list.
  *
  * All arithmetic is 64-bit integer with floor division (`div`) at a fixed
  * 1e12 scale, so ranks are BIT-IDENTICAL across engines, retries, and
  * partitionings — no float summation order anywhere. Damping is 85/100;
  * dangling mass (nodes with no out-edges) is redistributed uniformly each
  * round, which keeps total mass conserved up to per-node floor remainders.
  *
  * Plan shape per round: one edge-keyed join to ship ranks to destinations
  * (the only fact-scale shuffle), a groupBy(dst) with map-side partial sums,
  * and a 1-row dangling-mass aggregate whose scalar folds into the next
  * round's expression driver-side (like the vertex count — a bounded
  * build value, not a data collect).
  * Rounds are synchronous and the iteration count is fixed by the caller —
  * the classic bounded-round formulation (Page et al. 1999; the
  * Spark-idiomatic loop mirrors GraphX's staticPageRank contract without
  * the RDD API).
  *
  * Cache lifecycle: each round's ranks are persisted and materialized, the
  * previous round unpersisted — lineage stays one round deep (same contract
  * as [[ConnectedComponents]]), so the plan does not grow with `iters` and
  * a 100 TB run is `iters` bounded passes. The returned frame is the final
  * (vertex-count × 16 bytes) rank set, still cached; long-lived sessions
  * use [[runWithRelease]] and release after consuming.
  */
object PageRank {

  /** 1e12 — rank mass is tracked in trillionths. */
  val Scale: Long = 1000000000000L

  /** Re-root a persisted, materialized frame as a leaf over its RDD (the
    * TreeDepth/ConnectedComponents/LabelPropagation pattern). PageRank's
    * round plan nests eDeg (which embeds the caller's whole edge
    * pipeline, itself often a self-join) plus the previous round — the
    * catalog's d21 plan text carried 4186 nested scans before truncation,
    * and Catalyst re-analysis of that tree is paid EVERY round even
    * though execution reads the caches. */
  private def truncateLineage(df: DataFrame): DataFrame =
    graft.engine.Lineage.truncate(df)

  /** Hook-less form for one-shot processes; see [[runWithRelease]]. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame =
    runWithRelease(nodes, edges, iters)._1

  /** @param nodes one column `v` (long id), the full vertex set (dangling
    *              vertices included)
    * @param edges columns `src`, `dst` (long ids), directed, duplicates
    *              allowed (parallel edges weight the transition)
    * @param iters number of synchronous rounds (fixed, no convergence test —
    *              deterministic plans beat adaptive stopping for parity)
    * @return ((v, r) with r the fixed-point rank at [[Scale]], release hook
    *         that unpersists the returned frame)
    */
  def runWithRelease(
      nodes: DataFrame, edges: DataFrame, iters: Int): (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Inputs are re-read every round — persist both, or an expensive
    // upstream (e.g. the Jaccard pair self-join) recomputes once per round.
    val e = edges.persist()
    val vs = nodes.persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    // Degree is attached to the edge list ONCE, outside the loop — the
    // rounds previously joined `deg` per round, an edge-scale shuffle
    // join × iters that this single persisted frame replaces. The join
    // output is hash-partitioned by src and the cache RETAINS that
    // partitioning (InMemoryTableScan reports it), so at shuffle-join
    // scale each round's e⋈r probe re-shuffles only the vertex-scale
    // rank frame, never the edges.
    val eDegHandle = e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")).persist()
    // Vertex count once, eagerly: a literal in every round's expression
    // beats re-running even a 1-row aggregate subplan per round.
    val n = vs.count()
    // Materialize eDeg explicitly, then iterate over its RDD leaf: every
    // round references eDeg, and the un-truncated text embeds the whole
    // upstream edge pipeline per round.
    eDegHandle.count()
    val eDeg = truncateLineage(eDegHandle)
    val vsLeaf = truncateLineage(vs) // materialized by the count above
    // deg's cache is materialized by the count above (it feeds eDeg);
    // the dangling probe then reads its RDD leaf so the per-round agg
    // plan doesn't re-embed the caller's edge pipeline via deg's lineage
    val degLeaf = truncateLineage(deg)

    var rHandle = vsLeaf.selectExpr("v", s"$Scale div ${n}L AS r").persist()

    // Dangling mass: ranks of vertices with no out-edges. A 1-row
    // aggregate pulled DRIVER-SIDE (same bounded contract as the vertex
    // count) and folded into the next round's expression as a literal.
    // Two plan economies vs earlier formulations:
    //  - an earlier version shipped it back as crossJoin(broadcast(agg)) —
    //    semantically identical, but the per-round BroadcastExchange +
    //    nested-loop stage cost ~6s/round at local[32];
    //  - the anti-join aggregate doubles as the CACHE MATERIALIZATION of
    //    its argument (it consumes every partition), so each round runs
    //    exactly ONE job — round t's action computes round t's ranks AND
    //    the dangling scalar round t+1 needs, instead of a count() job
    //    followed by a separate dangling job re-scanning the cache.
    def danglingOf(ranks: DataFrame): Long =
      ranks.join(degLeaf, ranks("v") === degLeaf("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
        .head().getLong(0)

    var dang = danglingOf(rHandle) // also materializes r's cache
    var r = truncateLineage(rHandle)

    for (_ <- 1 to iters) {
      // Each vertex ships r div deg along every out-edge; sum at the dst.
      val contrib = eDeg.join(r, col("src") === col("v"))
        .selectExpr("dst", "r div deg AS share")
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      val next = vsLeaf
        .join(contrib, col("v") === col("dst"), "left")
        .selectExpr("v",
          s"(($Scale * 15) div 100) div ${n}L + " +
            s"(85 * (coalesce(contrib, 0) + ${dang}L div ${n}L)) div 100 AS r")
        .persist()
      dang = danglingOf(next) // one job: materializes next + its dangling mass
      rHandle.unpersist()
      rHandle = next
      r = truncateLineage(next)
    }
    eDegHandle.unpersist()
    deg.unpersist()
    e.unpersist()
    vs.unpersist()
    // truncated view over the still-persisted final round (multi-reference
    // callers don't re-nest the round chain); release via the handle
    val handle = rHandle
    (r, () => { handle.unpersist(); () })
  }

  /** Weighted PageRank: [[run]] with per-edge transition mass — each
    * vertex ships `(r · w_e) div W(v)` along edge e, W(v) = Σ w over its
    * out-edges, instead of the uniform `r div deg`. Same exact 64-bit
    * fixed-point discipline, damping, dangling handling, plan shape, and
    * cache lifecycle as [[run]] (a separate loop for the same reason as
    * [[trustRank]]: d21's oracle hash-pins the unweighted formula).
    * Integer weights only; ANSI mode makes any `r·w` overflow THROW
    * loudly rather than wrap (size weights so max r · max w ≪ 2^63 —
    * rank mass is bounded by [[Scale]], so w up to ~10^6 is safe).
    *
    * @param edges columns `src`, `dst`, `w` (positive integer weight;
    *              parallel (src, dst) rows pre-aggregate upstream)
    */
  def runWeighted(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .persist()
    val vs = nodes.persist()
    val wdeg = e.groupBy("src").agg(sum(col("w")).as("sumw")).persist()
    val eDegHandle = e.join(wdeg, "src")
      .select(col("src"), col("dst"), col("w"), col("sumw")).persist()
    val n = vs.count()
    eDegHandle.count()
    val eDeg = truncateLineage(eDegHandle)
    val vsLeaf = truncateLineage(vs)
    val degLeaf = truncateLineage(wdeg)

    var rHandle = vsLeaf.selectExpr("v", s"$Scale div ${n}L AS r").persist()

    def danglingOf(ranks: DataFrame): Long =
      ranks.join(degLeaf, ranks("v") === degLeaf("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
        .head().getLong(0)

    var dang = danglingOf(rHandle)
    var r = truncateLineage(rHandle)

    for (_ <- 1 to iters) {
      val contrib = eDeg.join(r, col("src") === col("v"))
        .selectExpr("dst", "(r * w) div sumw AS share")
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      val next = vsLeaf
        .join(contrib, col("v") === col("dst"), "left")
        .selectExpr("v",
          s"(($Scale * 15) div 100) div ${n}L + " +
            s"(85 * (coalesce(contrib, 0) + ${dang}L div ${n}L)) div 100 AS r")
        .persist()
      dang = danglingOf(next)
      rHandle.unpersist()
      rHandle = next
      r = truncateLineage(next)
    }
    eDegHandle.unpersist()
    wdeg.unpersist()
    e.unpersist()
    vs.unpersist()
    r
  }

  /** Hook-less form for one-shot processes; see [[trustRankWithRelease]]. */
  def trustRank(
      nodes: DataFrame, edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame =
    trustRankWithRelease(nodes, edges, seeds, iters)._1

  /** TrustRank / personalized PageRank (Gyöngyi, Garcia-Molina &
    * Pedersen, VLDB 2004 — public algorithm): [[run]]'s power iteration
    * with the TELEPORT restricted to a trusted seed set — the web-spam
    * demotion pass of corpus curation (trust flows OUT of the whitelist
    * along links; pages unreachable from any seed hold no teleport mass
    * and starve). Same exact 64-bit fixed-point discipline as [[run]]:
    *
    *  - t(v) = Scale div |seeds| for seeds, 0 otherwise; r₀ = t;
    *  - r' (v) = (15·t(v)) div 100
    *             + (85·(contrib(v) + seed(v)·(dang div |seeds|))) div 100
    *    — dangling mass teleports to the SEEDS, the personalized twin of
    *    [[run]]'s uniform redistribution.
    *
    * A separate loop rather than a parameterized [[run]] ON PURPOSE: the
    * uniform formula's floor-division ORDER (`(Scale·15 div 100) div n`)
    * is hash-pinned by d21's driver oracle, and unifying the two would
    * perturb it for no plan-shape gain. Same per-round cost profile and
    * cache lifecycle as [[run]]; seeds outside `nodes` are ignored.
    */
  def trustRankWithRelease(
      nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
      iters: Int): (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.persist()
    val vs = nodes
      .join(seeds.select(col("v")).distinct().withColumn("__s", lit(1L)),
        Seq("v"), "left")
      .select(col("v"), coalesce(col("__s"), lit(0L)).as("s"))
      .persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val eDegHandle = e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")).persist()
    val nSeeds = vs.filter(col("s") === 1L).count() // also materializes vs
    require(nSeeds > 0L, "trustRank needs at least one seed inside `nodes`")
    eDegHandle.count()
    val eDeg = truncateLineage(eDegHandle)
    val vsLeaf = truncateLineage(vs)
    val degLeaf = truncateLineage(deg)

    var rHandle = vsLeaf
      .selectExpr("v", "s", s"s * ($Scale div ${nSeeds}L) AS r").persist()

    def danglingOf(ranks: DataFrame): Long =
      ranks.join(degLeaf, ranks("v") === degLeaf("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
        .head().getLong(0)

    var dang = danglingOf(rHandle)
    var r = truncateLineage(rHandle)

    for (_ <- 1 to iters) {
      val contrib = eDeg.join(r, col("src") === col("v"))
        .selectExpr("dst", "r div deg AS share")
        .groupBy("dst").agg(sum(col("share")).as("contrib"))
      val next = vsLeaf
        .join(contrib, col("v") === col("dst"), "left")
        .selectExpr("v", "s",
          s"(15 * (s * ($Scale div ${nSeeds}L))) div 100 + " +
            s"(85 * (coalesce(contrib, 0) + s * (${dang}L div ${nSeeds}L))) div 100 AS r")
        .persist()
      dang = danglingOf(next)
      rHandle.unpersist()
      rHandle = next
      r = truncateLineage(next)
    }
    eDegHandle.unpersist()
    deg.unpersist()
    e.unpersist()
    vs.unpersist()
    val handle = rHandle
    (r.select(col("v"), col("r")), () => { handle.unpersist(); () })
  }
}
