package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PER-GROUP lag ([[GroupedRank]]'s doctrine applied to
  * `lag(value) over (partition by group order by key, tie)`): a lag
  * window partitioned by a low-cardinality group over a fact table is
  * one task per group — the t87 class. Lag has a SEQUENTIAL data
  * dependency, but only of depth one across any cut: bucket the key
  * range (equal keys never split — [[PrefixSum]]'s monotone bucket id),
  * lag WITHIN each (group, bucket) slice, and fix each slice's first
  * row with the PREVIOUS non-empty slice's last value, folded on the
  * driver from a ≤ |groups|·buckets aggregate and broadcast back (the
  * GroupedRank offsets shape, carrying a value instead of a count).
  *
  * The slice-first row is identified POSITIONALLY (`row_number == 1`
  * inside the slice), never by `coalesce(lag, prev)`: a legitimately
  * NULL value mid-slice must lag through as NULL, not be papered over
  * with the previous slice's tail.
  *
  * Requirements: `keyCol` numeric non-null ([[GroupedRank]]'s
  * contract), ascending order, (keyCol, tieBreak) total per group; the
  * tie-break columns are plain ascending columns (they feed a
  * lexicographic `max_by` struct). Group columns may be null (the
  * rejoin is null-safe).
  */
object GroupedLag {

  /** Adds `out` = the previous row's `value` under the per-group order
    * (`keyCol` asc, then `tieBreak` asc); null for each group's first
    * row, exactly like the window form. */
  def withLag(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      tieBreak: Seq[Column],
      value: Column,
      out: String,
      buckets: Int = 128,
      relativeError: Double = 0.01,
      maxCollectedSlices: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(buckets > 0, "buckets must be positive")
    // sibling-contract trap, made loud: GroupedRank takes DIRECTION-
    // BEARING sort columns (col(x).asc), this operator takes PLAIN
    // ascending columns — they feed a lexicographic max_by struct, where
    // a SortOrder is not a value expression
    require(!tieBreak.exists(c => org.apache.spark.sql.GraftBridge
        .expression(c).isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.SortOrder]),
      "GroupedLag tieBreak takes PLAIN columns (ascending implied), " +
        "not .asc/.desc sort orders — unlike GroupedRank")
    val pid = "_gl_pid"
    val prevCol = "_gl_prev"
    val rnCol = "_gl_rn"
    val valCol = "_gl_val"

    val cached = graft.engine.BoundedCaches.persist(df.withColumn(valCol, value))

    val bounds = KeyBuckets.probe(cached, keyCol, buckets, relativeError)
    val pidExpr = KeyBuckets.pidExpr(bounds, keyCol, descending = false)

    val slice = groupCols.map(col) :+ col(pid)
    val parted = graft.engine.BoundedCaches.persist(
      cached.withColumn(pid, pidExpr).repartition(slice: _*))
    val ordering = (col(keyCol).asc +: tieBreak.map(_.asc)) // ascending order
    val wSlice = Window.partitionBy(slice: _*).orderBy(ordering: _*)
    val local = parted
      .withColumn(out, lag(col(valCol), 1).over(wSlice))
      .withColumn(rnCol, row_number().over(wSlice))

    // per-slice LAST value under the slice order (≤ |groups|·buckets
    // rows), folded on the driver into "previous non-empty slice's last"
    val orderStruct = struct(col(keyCol) +: tieBreak: _*)
    val lasts = parted.groupBy(slice: _*)
      .agg(max_by(col(valCol), orderStruct).as(valCol))
      .limit(math.min(maxCollectedSlices, Int.MaxValue - 1L).toInt + 1)
      .collect()
    require(lasts.length <= maxCollectedSlices,
      s"GroupedLag: more than $maxCollectedSlices (group, bucket) slices — " +
        "the boundary fold is a bounded build contract; raise the budget " +
        "only if the driver can hold the slice table")
    val g = groupCols.length
    val offRows = new scala.collection.mutable.ArrayBuffer[Row]
    lasts
      .map(r => (Seq.tabulate(g)(r.get), r.getInt(g), r.get(g + 1)))
      .groupBy(_._1)
      .foreach { case (groupVals, slices) =>
        var carry: Any = null
        var first = true
        for ((_, p, last) <- slices.sortBy(_._2)) {
          if (!first) offRows += Row.fromSeq(groupVals ++ Seq[Any](p, carry))
          carry = last
          first = false
        }
      }
    val partedSchema = parted.schema
    val offSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => partedSchema(c).copy(name = "_gl_" + c)) ++ Seq(
        org.apache.spark.sql.types.StructField(pid,
          org.apache.spark.sql.types.IntegerType, nullable = false),
        partedSchema(valCol).copy(name = prevCol, nullable = true)))
    val offsets = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows.toSeq: _*), offSchema)

    val joinCond = (groupCols.map(c => local(c) <=> offsets("_gl_" + c)) :+
      (local(pid) === offsets(pid))).reduce(_ && _)
    local.join(broadcast(offsets), joinCond, "left")
      .withColumn(out,
        when(col(rnCol) === 1, col(prevCol)).otherwise(col(out)))
      .drop(offsets(pid))
      .drop(groupCols.map("_gl_" + _) :+ pid :+ prevCol :+ rnCol :+ valCol: _*)
  }
}
