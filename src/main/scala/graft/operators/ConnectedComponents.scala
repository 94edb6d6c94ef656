package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * cluster-assignment stage a dedup pipeline runs AFTER pair detection
  * (pairs → components → one keeper per component). An operator the
  * reference never needed (its dedup is per-row `unique`), but any
  * near-dup pipeline at scale does.
  *
  * Plan shape per round: one neighbor-min aggregation shuffle + one
  * vertex-keyed join — label propagation, driver-coordinated. Labels are
  * monotone non-increasing, so convergence is detected by comparing the
  * label-sum aggregate (decimal — an id-sum overflows a long at billions
  * of vertices) between rounds: strictly smaller iff something changed.
  * Rounds needed ≤ graph diameter; near-dup clusters are clique-like
  * (diameter 1-2). For adversarial long-chain graphs at 100 TB, the
  * alternating large-star/small-star variant converges in O(log n) rounds
  * — this implementation documents that as the scale escape hatch and
  * guards with `maxIters`.
  *
  * Cache lifecycle: each round's labels are persisted, materialized by the
  * convergence aggregate, and the PREVIOUS round is unpersisted — lineage
  * would otherwise deepen by two joins per round and recompute the whole
  * history every action. The returned frame is the final (vertex-count ×
  * 16 bytes) label set, still cached; long-lived sessions use
  * [[minLabelWithRelease]] and release after consuming.
  */
object ConnectedComponents {

  def minLabel(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame =
    minLabelWithRelease(vertices, idCol, edges, srcCol, dstCol, maxIters)._1

  def minLabelWithRelease(
      vertices: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): (DataFrame, () => Unit) = {
    // Persisted for the loop: every round's neighbor-min join reads the
    // edge set, and without the cache each labelSum action would re-run
    // the caller's whole edge-producing subplan (e.g. d13's pair
    // detection) twice per round via the two union branches.
    val undirected = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .persist()

    // NULL on an empty frame (sum over zero rows) — handled below.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)

    var labels = vertices
      .select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("label"))
      .persist()
    var prevSum = labelSum(labels)
    if (prevSum == null) { // no vertices: trivially converged, nothing cached to keep
      undirected.unpersist()
      val empty = labels
      return (empty, () => { empty.unpersist(); () })
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = undirected.join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist()
      val newSum = labelSum(next) // materializes `next`, so the old cache can go
      labels.unpersist()
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    undirected.unpersist() // labels is materialized; the edge cache is done
    if (!converged) {
      labels.unpersist() // failure path hands out no release hook
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds " +
          "(long-chain graph: use a star-contraction variant)")
    }
    val done = labels
    (done, () => { done.unpersist(); () })
  }
}
