package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: points ⋈ intervals on `lo <= p < hi` (optionally
  * `<= hi`) — the second non-equi join shape (after as-of) that Spark
  * would otherwise plan as BroadcastNestedLoopJoin, which is O(|P|·|I|)
  * and a driver OOM once neither side broadcasts.
  *
  * The bucket trick makes it an equi-join: every interval explodes to the
  * fixed-width buckets it overlaps, every point maps to exactly ONE bucket,
  * and the join runs on the bucket id with the exact range predicate as a
  * post-filter. Because a point has a single bucket, no dedup is needed.
  * Cost: shuffle of |P| + |I|·(avg interval width / bucketWidth) rows —
  * pick `bucketWidth` near the typical interval width so the explode
  * factor stays small. Skewed buckets fall under AQE skew handling or
  * [[graft.transforms.Skew.saltedJoin]].
  */
object RangeJoin {

  /** Explode `df` to one row per bucket its [lo, hi] span touches. The
    * `__bucket` column name is RESERVED (guarded, not silently replaced).
    * The last bucket is always `floor(hi/w)`, even for half-open spans
    * whose aligned end never occupies it: the tighter `ceil(hi/w)-1` bound
    * silently DROPS matches when `hi > N*w` but `hi/w` rounds down to
    * exactly `N` in floating point (then a point `p < hi` lands in bucket
    * `N`, which the interval would no longer ship). The extra aligned-end
    * bucket only ever produces pairs the exact range predicate removes. */
  private def bucketSpans(
      df: DataFrame, lo: String, hi: String, w: Column): DataFrame = {
    require(!df.columns.contains("__bucket"),
      "bucketed range joins reserve the column name __bucket; rename it first")
    val first = floor(col(lo) / w).cast("long")
    val last = floor(col(hi) / w).cast("long")
    df.withColumn("__bucket", explode(sequence(first, last)))
  }

  /** @param hiInclusive false → `lo <= p < hi` (default), true → `<= hi`. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double, hiInclusive: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("__bucket"),
      "bucketed range joins reserve the column name __bucket; rename it first")
    val w = lit(bucketWidth)
    val i2 = bucketSpans(intervals, loCol, hiCol, w)
    val p2 = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val rangePred =
      if (hiInclusive) col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    p2.join(i2, p2("__bucket") === i2("__bucket") && rangePred)
      .select((points.columns.map(points(_)) ++ intervals.columns.map(intervals(_))).toIndexedSeq: _*)
  }

  /** Interval × interval overlap join on half-open intervals: pairs with
    * `lStart < rEnd && rStart < lEnd` (and equal `keys`) — the temporal
    * reconciliation shape (sessions × incidents, visits × campaigns) that
    * a theta join would plan as a nested loop.
    *
    * Both sides explode to their bucket spans, the join runs on
    * (keys, bucket), and a pair is emitted ONLY from the bucket containing
    * `max(lStart, rStart)` — the overlap's left edge — so each pair
    * appears exactly once with NO distinct pass. Cost: shuffle of
    * |L|+|R| × (avg span / bucketWidth) rows on an equi key.
    *
    * `keys` must exist on both sides (one copy survives, from the left);
    * all other column names must be distinct across the two frames.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val l2 = bucketSpans(left, lStart, lEnd, w)
    val r2 = bucketSpans(right, rStart, rEnd, w)
    val overlap = l2(lStart) < r2(rEnd) && r2(rStart) < l2(lEnd)
    val reportOnce =
      floor(greatest(l2(lStart), r2(rStart)) / w).cast("long") === l2("__bucket")
    val cond = (keys.map(k => l2(k) === r2(k)) :+
      (l2("__bucket") === r2("__bucket")) :+ overlap :+ reportOnce).reduce(_ && _)
    val lCols = left.columns.map(l2(_))
    val rCols = right.columns.filterNot(keys.contains).map(r2(_))
    l2.join(r2, cond).select((lCols ++ rCols).toIndexedSeq: _*)
  }
}
