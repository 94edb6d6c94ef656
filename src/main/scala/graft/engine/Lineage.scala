package graft.engine

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation helper for the iterative operators
  * (PageRank/ConnectedComponents/Scc/Hits/… round loops and the trainer
  * endgames): re-root a persisted, materialized frame as a LEAF so the
  * per-round plan doesn't re-embed the whole upstream pipeline (Catalyst
  * re-analysis of that tree was paid every round even though execution
  * read the caches).
  *
  * Deliberately the RDD form (`createDataFrame(df.rdd, df.schema)`), NOT
  * [[org.apache.spark.sql.GraftBridge.rerootOnCache]]'s InMemoryRelation
  * leaf: an IMR node renders its cached child plan as innerChildren in
  * every treeString (cache naming, explain, the SQL listener's
  * plan-description), so a ROUND LOOP of IMR-rooted frames — round t's
  * plan embedding round t−1's IMR, referenced more than once per round —
  * makes plan RENDERING grow geometrically with the round count (r18
  * measured: d63 Luby-MIS OOM'd an 8 GB driver building the cache-name
  * string by ~round 20). The RDD leaf (LogicalRDD) renders as one line,
  * so string work stays O(1) per round regardless of iteration count;
  * the price is the InternalRow↔Row conversion on per-round scans, which
  * is linear and bounded. Re-rooting on the cache is right for BOUNDED-
  * depth compositions (BoundedCaches.persist, depth ≈ 5) and wrong for
  * unbounded loops — this helper is the loops' path.
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}
