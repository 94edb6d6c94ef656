package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** DeepWalk-style random-walk corpus generation (Perozzi, Al-Rfou &
  * Skiena, KDD 2014 — public algorithm): fixed-length uniform walks from
  * every seed vertex, the sentence-corpus prep for graph-embedding
  * training (each walk is a "sentence" of vertex tokens for a skip-gram
  * model — node2vec's p/q bias is a different transition rule on the same
  * scaffold).
  *
  * Determinism: the "random" next hop is a HASH-CHOSEN neighbor index —
  * mix(seed, walk, step, v) mod deg(v) over the dst-sorted adjacency —
  * so walks are reproducible across engines, retries, and partitionings
  * (the jlSigns philosophy: pseudo-randomness the oracle can replay).
  * The mix is plain modular integer arithmetic (no engine hash
  * function), with every intermediate bounded ≪ 2^63: DuckDB raises on
  * BIGINT overflow rather than wrapping, so cross-engine parity REQUIRES
  * staying in range, not relying on wraparound.
  *
  * Scale shape per step: ONE vertex-keyed join to fetch the frontier's
  * degree (vertex-scale) and ONE (src, idx) equi-join into the indexed
  * adjacency (edge-keyed, the only fact-scale shuffle); walks at dangling
  * vertices stop (no emissions past the dead end). The adjacency is
  * indexed ONCE (row_number over the src partition) and persisted for
  * the loop; per-step frames are persisted, materialized, and RDD-leaf
  * re-rooted (the d21/PageRank iteration hygiene), so the plan stays one
  * step deep for any length; the step leaves stay cached because the
  * final union reads every one (the Bfs levels contract).
  */
object RandomWalks {

  private def truncateLineage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** The walk's deterministic transition mix — REPLICATED in the d57
    * oracle; change both or neither. Inputs are reduced mod 1e6+3 before
    * the multiplies so every product stays ≪ 2^63 in BOTH engines. */
  private def mix(seed: Column, walk: Column, step: Column, v: Column): Column =
    ((seed % 1000003L) * 2654435761L + walk * 40503L + step * 65599L +
      (v % 1000003L) * 97L) % 1000000007L

  /** @param edges        directed (src, dst) long ids; walk an undirected
    *                     graph by mirroring first
    * @param seeds        one column `v` — walk start vertices (dedup'd)
    * @param length       steps per walk (≤ 64; each walk emits length+1
    *                     rows unless it dies at a dangling vertex)
    * @param walksPerSeed parallel walks per seed, distinct `walk` ids
    * @return (seed, walk, step, v) — step 0 is the seed itself
    */
  def deepWalks(
      edges: DataFrame, seeds: DataFrame,
      length: Int, walksPerSeed: Int = 1): DataFrame = {
    require(length >= 1 && length <= 64,
      s"walk length must be in [1, 64], got $length")
    require(walksPerSeed >= 1 && walksPerSeed <= 128,
      s"walksPerSeed must be in [1, 128], got $walksPerSeed")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // dst-sorted neighbor index + degree, attached once: the step join
    // needs (src, idx) → dst and deg(src) together.
    import org.apache.spark.sql.expressions.Window
    val adjH = e.distinct()
      .withColumn("idx",
        (row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))) - 1)
          .cast("long"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
      .persist(MEMORY_AND_DISK)
    adjH.count()
    val adj = truncateLineage(adjH)
    val degs = adj.select(col("src"), col("deg")).distinct()

    val frontier0 = seeds.select(col("v").cast("long").as("v")).distinct()
      .crossJoin(
        seeds.sparkSession.range(walksPerSeed.toLong).select(col("id").as("walk")))
      .select(col("v").as("seed"), col("walk"), col("v"))
      .persist(MEMORY_AND_DISK)
    var frontierRows = frontier0.count()
    var frontier = truncateLineage(frontier0)
    val levels = scala.collection.mutable.ArrayBuffer(
      frontier.withColumn("step", lit(0L)))
    var step = 1
    while (step <= length && frontierRows > 0L) {
      val nextH = frontier
        .join(degs, frontier("v") === degs("src"))
        .select(col("seed"), col("walk"),
          (mix(col("seed"), col("walk"), lit(step.toLong), col("v")) % col("deg"))
            .as("pick"),
          col("v").as("cur"))
        .join(adj, col("cur") === adj("src") && col("pick") === adj("idx"))
        .select(col("seed"), col("walk"), col("dst").as("v"))
        .persist(MEMORY_AND_DISK)
      frontierRows = nextH.count()
      val next = truncateLineage(nextH)
      // Levels OWN their caches until the final union (the Bfs contract):
      // unpersisting the previous frontier here would force each level to
      // recompute through its whole RDD chain when the union reads it.
      levels += next.withColumn("step", lit(step.toLong))
      frontier = next
      step += 1
    }
    val out = levels.reduce(_ unionAll _)
      .select(col("seed"), col("walk"), col("step"), col("v"))
    adjH.unpersist(blocking = false)
    // levels stay persisted (the Bfs contract): the caller reads the walk
    // corpus from cache; blocks age out via LRU.
    out
  }
}
