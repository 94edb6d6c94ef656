package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PER-GROUP dense ranking ([[PrefixSum]]'s doctrine applied
  * to `row_number() over (partition by group order by key)`).
  *
  * `Window.partitionBy(group)` puts every row of a group in ONE task.
  * That is exactly right when groups are small and numerous, and exactly
  * wrong when one group dominates the frame — the t87 CCNet case: a
  * single language holding most of a 100 TB corpus becomes a single
  * sort task over billions of rows (the SinglePartition-window class
  * this repo bans everywhere else; see PrefixSum's scaladoc). This
  * operator keeps `row_number`'s exact semantics with no task ever
  * holding more than one (group, key-range-bucket) slice:
  *
  *  1. probe `approxQuantile` boundaries of the GLOBAL key distribution
  *     (one distributed sketch aggregate, ≤ `buckets`−1 doubles to the
  *     driver). Boundaries are shared across groups — per-group
  *     boundaries would only improve balance, never correctness, since
  *     the bucket id is a deterministic monotone function of the key:
  *     equal keys always share a bucket, and bucket order follows scan
  *     order (ascending pid in both directions — [[PrefixSum]]'s
  *     construction), so rank(row) = (rows of the same group in earlier
  *     buckets) + (local rank inside its bucket) exactly.
  *  2. ONE hash shuffle on (group…, bucket); the per-slice `row_number`
  *     window reuses that clustering — no further full-data exchange
  *     and no slice larger than group∩bucket.
  *  3. per-(group, bucket) counts — a distributed aggregate returning
  *     ≤ |groups|·buckets rows — come back to the driver (a bounded
  *     build contract like PrefixSum's offsets; `maxCollectedSlices`
  *     guards it loudly), fold into per-group exclusive prefix offsets
  *     AND the per-group total, and rejoin as a broadcast LocalRelation
  *     (fresh lineage for the same constraint-inference reason as
  *     PrefixSum).
  *
  * The input is persisted through [[graft.engine.BoundedCaches]] BEFORE
  * the quantile probe: the probe is an action, and without the cache a
  * caller whose lineage is expensive (t87's Kneser-Ney scoring subtree)
  * would compute it once for the probe, once for the counts, and once
  * for the output — the single-pass discipline the exact-window form had
  * must survive the rewrite.
  *
  * Requirements (the PrefixSum contract): `keyCol` must be numeric and
  * non-null (callers pre-coalesce; a NaN would bucket deterministically
  * but sort NaN-last vs NaN-greatest differently across engines — no
  * current caller can produce one), and `tieBreak` must make the
  * per-group order total — `row_number` over a non-total order is not
  * deterministic under ANY implementation, windowed or bucketed. Group
  * columns MAY be null: the rejoin is null-safe (`<=>`), so null keys
  * form one group exactly like `Window.partitionBy` would.
  *
  * CONSTRUCT-TIME SNAPSHOT (PrefixSum-family doctrine): this method runs
  * driver ACTIONS while building the plan — the quantile probe and the
  * slice-count fold — and bakes their results into the returned lazy
  * frame as literals / a broadcast LocalRelation. The returned frame is
  * therefore correct for execution over the input AS IT WAS at
  * construction: re-executing it after the underlying source changed
  * (a pure `Window.partitionBy` would silently re-derive) computes ranks
  * against STALE offsets with no error. Callers hold the usual repo
  * contract — immutable parquet inputs, plan built and executed within
  * one query — and must not retain the frame across source rewrites.
  * [[GroupedLag]] and [[PrefixSum]] share this semantics.
  */
object GroupedRank {

  /** Adds `outRank` = 1-based rank of each row within its group over
    * (`keyCol` asc/desc, then `tieBreak`) and `outCount` = the group's
    * row count, both BIGINT.
    *
    * @param buckets key-range buckets; ~4× target parallelism so the
    *                (group, bucket) hash balances (balls-in-bins)
    * @param maxCollectedSlices loud guard on the driver-side offsets
    *                fold: |groups|·buckets rows must stay a bounded
    *                build artifact (t87: languages × 2 flags × 128)
    */
  def withGroupRank(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      descending: Boolean,
      tieBreak: Seq[Column],
      outRank: String,
      outCount: String,
      buckets: Int = 128,
      relativeError: Double = 0.01,
      maxCollectedSlices: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(buckets > 0, "buckets must be positive")
    val pid = "_gr_pid"
    val poff = "_gr_off"

    val cached = graft.engine.BoundedCaches.persist(df)

    val bounds = KeyBuckets.probe(cached, keyCol, buckets, relativeError)
    val pidExpr = KeyBuckets.pidExpr(bounds, keyCol, descending)

    val slice = groupCols.map(col) :+ col(pid)
    // persisted post-shuffle: the clustered frame feeds BOTH the counts
    // aggregate (eager, below) and the windowed output (lazy), and the
    // repartition should run once, not per consumer
    val parted = graft.engine.BoundedCaches.persist(
      cached.withColumn(pid, pidExpr).repartition(slice: _*))
    val ordering =
      (if (descending) col(keyCol).desc else col(keyCol).asc) +: tieBreak
    val wLocal = Window.partitionBy(slice: _*).orderBy(ordering: _*)
    val local = parted.withColumn(outRank, row_number().over(wLocal).cast("long"))

    // per-(group, bucket) counts → driver fold → offsets + group totals.
    // The limit is the loud budget guard: the fold is a bounded build
    // contract, never data-scale.
    val countRows = parted.groupBy(slice: _*).agg(count(lit(1)).as("_gr_cnt"))
      .limit(math.min(maxCollectedSlices, Int.MaxValue - 1L).toInt + 1)
      .collect()
    require(countRows.length <= maxCollectedSlices,
      s"GroupedRank: more than $maxCollectedSlices (group, bucket) slices — " +
        "the offsets fold is a bounded build contract; raise the budget " +
        "only if the driver can hold the slice table")
    val g = groupCols.length
    val offRows = new scala.collection.mutable.ArrayBuffer[Row]
    countRows
      .map(r => (Seq.tabulate(g)(r.get), r.getInt(g), r.getLong(g + 1)))
      .groupBy(_._1)
      .foreach { case (groupVals, slices) =>
        val total = slices.iterator.map(_._3).sum
        var acc = 0L
        // pid ascends in scan order for BOTH directions (PrefixSum's
        // descending construction reverses the id), so a plain pid sort
        // is the group's traversal order
        for ((_, p, cnt) <- slices.sortBy(_._2)) {
          // Seq[Any], not Seq(p, acc, total): mixed Int/Long literals
          // numerically WIDEN p to Long, corrupting the IntegerType slot
          offRows += Row.fromSeq(groupVals ++ Seq[Any](p, acc, total))
          acc += cnt
        }
      }
    val partedSchema = parted.schema
    val offSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => partedSchema(c).copy(name = "_gr_" + c)) ++ Seq(
        org.apache.spark.sql.types.StructField(pid,
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField(poff,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(outCount,
          org.apache.spark.sql.types.LongType, nullable = false)))
    val offsets = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offRows.toSeq: _*), offSchema)

    // NULL-SAFE group equality: Window.partitionBy groups null keys
    // together, so the broadcast rejoin must too — a plain === here
    // would inner-join null-group rows into NOTHING (silent row loss,
    // not even a wrong rank)
    val joinCond = (groupCols.map(c => local(c) <=> offsets("_gr_" + c)) :+
      (local(pid) === offsets(pid))).reduce(_ && _)
    local.join(broadcast(offsets), joinCond)
      .withColumn(outRank, col(outRank) + col(poff))
      .drop(offsets(pid))
      .drop(groupCols.map("_gr_" + _) :+ pid :+ poff: _*)
  }
}
