package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** @param hiInclusive false → `lo <= p < hi` (default), true → `<= hi`. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double, hiInclusive: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val i2 = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val p2 = points.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val rangePred =
      if (hiInclusive) col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    p2.join(i2, p2("__bucket") === i2("__bucket") && rangePred)
      .select((points.columns.map(points(_)) ++ intervals.columns.map(intervals(_))).toIndexedSeq: _*)
  }
}
