package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter summaries (Misra & Gries 1982; the merge is
  * Agarwal et al. 2012, "Mergeable Summaries" — public algorithms): the
  * DETERMINISTIC-bound counterpart of [[graft.functions.CountMin]] —
  * where the sketch overestimates probabilistically, an MG summary of k
  * counters guarantees, for every item x over a stream of N rows,
  *
  *   c(x) − N/(k+1)  ≤  ĉ(x)  ≤  c(x)
  *
  * (ĉ = 0 for items absent from the summary), so every item with
  * frequency above N/(k+1) is GUARANTEED present — the classic
  * frequent-elements pre-filter when the exact vocabulary (t16's route)
  * no longer fits an aggregate.
  *
  * Distributed shape: one mapPartitions pass builds a k-counter summary
  * per partition (O(k) state, the classic decrement-by-one eviction), and the
  * driver merges the ≤ k·partitions partial counters with the paper's
  * merge — add counters, subtract the (k+1)-th largest value, drop the
  * non-positive — which preserves the bound across any merge tree.
  * CAVEAT, documented: which NON-heavy items survive (and their exact
  * ĉ) depends on partition layout and row order, so gates must hash the
  * INVARIANTS (heavy-item presence, the two-sided bound — the a31/a32
  * sketch-audit pattern), never raw summary rows.
  */
object MisraGries {

  /** One partition's (or stream's) MG pass — exposed for the spec. */
  private[graft] def local(items: Iterator[String], k: Int): Map[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters(x) = c + 1
        case None if counters.size < k => counters(x) = 1L
        case None =>
          // classic decrement-by-ONE: the k resident counters AND the
          // arriving singleton all lose 1 (the arrival dies at 0, so it
          // is never inserted) and zeros drop. Each evicting arrival
          // removes exactly k+1 units of stream mass, which is what the
          // c(x) − N/(k+1) ≤ ĉ(x) bound counts; subtracting the full
          // minimum m>1 per single arrival would shed m·k+1 units for
          // one unit of error budget and break the bound (k=2 stream
          // [a,a,b,b,c] would empty the table while c(a)=2 > N/3).
          val dead = counters.collect { case (t, 1L) => t }.toSeq
          counters.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }

  /** The paper's summary merge: sum counters; if more than k remain,
    * subtract the (k+1)-th largest value and drop the non-positive. */
  private[graft] def merge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val kth = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c - kth > 0 => t -> (c - kth) }
    }
  }

  /** Build the merged summary over `items(itemCol)` (one count per row):
    * (item, count_est) rows, ≤ k of them. Per-partition O(k) state, one
    * count-scale driver merge. */
  def summary(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")
    val spark = items.sparkSession
    // each PARTITION'S map is a valid MG(k) summary of its sub-stream —
    // the paper's merge applies to summaries, so the fold must run over
    // per-partition maps (collect order is partition-index order), not
    // over per-item rows
    val partials = items.select(col(itemCol).cast("string").as("t")).rdd
      .mapPartitions(rows => Iterator(local(rows.map(_.getString(0)), k)))
      .collect()
    val merged = partials.foldLeft(Map.empty[String, Long])((a, b) => merge(a, b, k))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merged.toSeq.sorted.map { case (t, c) => Row(t, c) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("count_est",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
