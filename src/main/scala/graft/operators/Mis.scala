package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Maximal independent set by Luby's algorithm (Luby 1986 — the public
  * classic for distributed symmetry breaking): each round, every live
  * vertex draws a priority and enters the MIS iff it beats every live
  * neighbor; winners' neighbors are dominated and leave with them.
  * O(log n) rounds in expectation.
  *
  * The data-pipeline reading: an MIS over a CONFLICT graph is the
  * largest-practical batch of mutually-safe items — near-dup pairs you
  * may not keep together, migrations that can't run concurrently,
  * evaluation docs that must not share a cluster. (Greedy keeper
  * election (d33) picks one per component; MIS picks a maximal
  * non-adjacent SET across the whole graph.)
  *
  * Determinism: the per-round priority is the engine-portable modular
  * mix of (vertex, round) — Luby's fresh randomness each round, but
  * replayable, so the gate's oracle unrolls the SAME rounds and the
  * resulting set hashes across engines (the d56/d59/d61 pattern).
  * The win condition compares the LEXICOGRAPHIC pair (p, id), never p
  * alone: the mix reduces ids mod 1000003 before mixing and the round
  * term is shared by both endpoints, so two adjacent vertices with
  * congruent ids tie in EVERY round (structural by pigeonhole for
  * graphs past ~1e6 vertices, not rare) — without the id tiebreak such
  * a pair could survive all rounds and force the maxRounds refusal.
  * The id tiebreak is injective, so every round strictly shrinks the
  * live set wherever an edge remains.
  *
  * Scale shape per round: one edge-keyed join shipping live priorities
  * to neighbors + a map-side-combined min, a vertex-scale winner
  * filter, one more edge join to collect dominated neighbors, and two
  * vertex-scale anti-joins. RDD-leaf re-rooting per round (the
  * PageRank hygiene); winners accumulate as cached leaves (the Bfs
  * levels contract).
  */
object Mis {

  private def truncateLineage(df: DataFrame): DataFrame =
    graft.engine.Lineage.truncate(df)

  /** Round-r priority — REPLICATED in the d63 oracle; change both or
    * neither. */
  private def priority(id: Column, round: Int): Column =
    ((id % 1000003L) * 2654435761L + lit(round.toLong) * 65599L) % 1000000007L

  /** @param vertices one column `idCol` (long ids)
    * @param edges    (srcCol, dstCol) long ids, treated as UNDIRECTED
    *                 (symmetrized internally); self-loops ignored
    * @return (id, in_mis) for every vertex
    */
  def maximalIndependentSet(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 64,
      s"maxRounds must be in [1, 64], got $maxRounds")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val ueH = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    ueH.count()
    val ue = truncateLineage(ueH)

    val allH = vertices.select(col(idCol).cast("long").as("id")).distinct()
      .persist(MEMORY_AND_DISK)
    var liveRows = allH.count()
    val all = truncateLineage(allH)
    var live = all
    var liveH = allH

    val winners = scala.collection.mutable.ArrayBuffer.empty[(DataFrame, DataFrame)]
    var round = 0
    while (liveRows > 0L && round < maxRounds) {
      val pr = live.select(col("id"), priority(col("id"), round).as("p"))
      // Lexicographic (p, id) key — struct ordering in Spark, ROW min in
      // the oracle. REPLICATED in the d63 oracle; change both or neither.
      val nbrMin = ue
        .join(pr.select(col("id").as("src"),
          struct(col("p").as("p"), col("id").as("id")).as("pk")), Seq("src"))
        .groupBy(col("dst")).agg(min(col("pk")).as("np"))
      val candH = pr.join(nbrMin, pr("id") === nbrMin("dst"), "left")
        .filter(col("np").isNull ||
          struct(pr("p").as("p"), pr("id").as("id")) < col("np"))
        .select(pr("id"))
        .persist(MEMORY_AND_DISK)
      candH.count()
      val cand = truncateLineage(candH)
      winners += ((cand, candH))
      val dominated = ue.join(cand.select(col("id").as("src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
      val nextH = live
        .join(cand, Seq("id"), "left_anti")
        .join(dominated, Seq("id"), "left_anti")
        .persist(MEMORY_AND_DISK)
      liveRows = nextH.count()
      if (liveH ne allH) liveH.unpersist(blocking = false) // `all` feeds the final join
      live = truncateLineage(nextH)
      liveH = nextH
      round += 1
    }
    if (liveRows > 0L) {
      winners.foreach(_._2.unpersist(blocking = false))
      if (liveH ne allH) liveH.unpersist(blocking = false)
      allH.unpersist(blocking = false)
      ueH.unpersist(blocking = false)
      throw new IllegalStateException(
        s"Luby MIS did not finish in $maxRounds rounds (raise maxRounds)")
    }
    if (winners.isEmpty) { // no vertices at all
      ueH.unpersist(blocking = false)
      return all.select(col("id"), lit(false).as("in_mis"))
    }
    val mis = winners.map(_._1).reduce(_ unionAll _)
    val outH = all
      .join(mis.select(col("id"), lit(true).as("in_mis")), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_mis"), lit(false)).as("in_mis"))
      .persist(MEMORY_AND_DISK)
    outH.count()
    val out = truncateLineage(outH)
    winners.foreach(_._2.unpersist(blocking = false))
    if (liveH ne allH) liveH.unpersist(blocking = false)
    allH.unpersist(blocking = false)
    ueH.unpersist(blocking = false)
    // out stays persisted (the Bfs contract)
    out
  }
}
