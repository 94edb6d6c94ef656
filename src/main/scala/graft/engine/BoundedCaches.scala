package graft.engine

import org.apache.spark.sql.DataFrame

/** Bounded registry for DataFrames persisted INSIDE a lazily-returned
  * query (same contract as PrefixSum's private registry): a query that
  * caches an intermediate has no post-execution hook to release it, so
  * repeated invocations (Bench's warm+N loop) would stack cache entries
  * and lean on LRU eviction. Registering keeps only the newest
  * [[MaxLive]] frames, non-blocking-unpersisting the eldest; an evicted
  * frame that is re-executed later just recomputes its lineage —
  * semantics are unaffected.
  */
object BoundedCaches {
  private val MaxLive = 4
  private val live = new java.util.ArrayDeque[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for bounded retire.
    *
    * Re-invocations of the same query build plan-identical frames that
    * all resolve to ONE cacheManager entry — registering each would let
    * the eldest's retirement unpersist the entry newer invocations still
    * rely on (observed as a plan-pin flake when a full test session runs
    * the query more than MaxLive times). `storageLevel` is the
    * cacheManager lookup by canonical plan, so an already-live entry is
    * returned as-is and registered exactly once. */
  def persist(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      live.addLast(df)
      while (live.size > MaxLive)
        live.removeFirst().unpersist(blocking = false)
      df
    }
  }
}
