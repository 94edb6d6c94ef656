package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE copy of the monotone range-bucket construction shared by the
  * bucketed-window operators ([[PrefixSum]], [[GroupedRank]],
  * [[GroupedLag]]) — previously triplicated verbatim, so a fix to the
  * probe or the bucket id (NaN handling, bounds dedup, the descending
  * inversion) could silently miss a sibling.
  *
  * Contract (see PrefixSum's scaladoc for the full rationale):
  *  - boundaries come from ONE distributed `approxQuantile` sketch
  *    (≤ buckets−1 doubles to the driver), deduped and sorted;
  *  - the bucket id is a deterministic MONOTONE function of the key —
  *    equal keys always share a bucket, and ids ascend in scan order
  *    for BOTH directions (the descending form inverts the id), so any
  *    per-bucket computation concatenates back into the global order;
  *  - the id is a nested-CASE binary search (O(log buckets) scalar
  *    compares, whole-stage-codegen friendly; a HOF array scan would
  *    trip Catalyst constraint inference across the rejoin);
  *  - boundary quality affects only balance, never correctness — a
  *    degenerate single-value key collapses to one hot bucket, the
  *    same as a range partitioner.
  */
private[graft] object KeyBuckets {

  /** Boundary probe: ≤ buckets−1 quantiles of `keyCol`, deduped/sorted. */
  def probe(df: DataFrame, keyCol: String, buckets: Int,
      relativeError: Double): Array[Double] = {
    require(buckets > 0, "buckets must be positive")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    if (probes.isEmpty) Array.empty[Double]
    else df.stat.approxQuantile(keyCol, probes, relativeError)
      .distinct.sorted(Ordering.Double.TotalOrdering)
  }

  /** Monotone bucket id of `keyCol` against `bounds`: the count of
    * boundaries strictly passed in scan order (ascending, or inverted
    * for descending). double-cast is monotone over numerics, so a lossy
    * cast can only merge adjacent buckets, never reorder them. */
  def pidExpr(bounds: Array[Double], keyCol: String,
      descending: Boolean): Column = {
    val v = col(keyCol).cast("double")
    // first index in bounds[lo..hi) where `pred(bound)` holds, else hi
    def lowerBound(pred: Double => Column, lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(pred(bounds(mid)), lowerBound(pred, lo, mid))
          .otherwise(lowerBound(pred, mid + 1, hi))
      }
    if (bounds.isEmpty) lit(0)
    else if (descending)
      lit(bounds.length) - lowerBound(b => lit(b) > v, 0, bounds.length)
    else lowerBound(b => lit(b) >= v, 0, bounds.length)
  }
}
