package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other row,
  * where row b dominates row a iff b.x ≤ a.x ∧ b.y ≤ a.y with at least one
  * strict (both dimensions minimized; flip signs upstream to maximize).
  *
  * Spark-first formulation — never the O(n²) dominance anti-join:
  *  1. reduce to one candidate per distinct x: `groupBy(x).agg(min(y))`
  *     (map-side combine, fully distributed — at 100 TB this is the only
  *     pass over the fact table);
  *  2. sweep the candidates in x order with a running strict-predecessor
  *     min over y: x survives iff min(y | x' < x) > y(x). Sorting by x and
  *     using `rowsBetween(unboundedPreceding, -1)` over DISTINCT x gives
  *     exactly the strictly-smaller-price prefix;
  *  3. join the surviving (x, ymin) pairs back (broadcast — the frontier
  *     is ≤ |distinct x| and typically tiny) and keep rows with y = ymin
  *     (ties on the frontier point all survive: equal pairs do not
  *     dominate each other).
  *
  * The sweep's window partitions by `groupCols` — per-group frontiers
  * (the production shape: skyline per brand / per source) are fully
  * distributed. With no group columns the sweep is a single-partition
  * window over the stage-1 candidates, i.e. over |distinct x| pre-reduced
  * rows, not the input — the documented bounded step (same class as a
  * global scalar fold).
  */
object Skyline {

  /** Frontier rows of `df` minimizing (`x`, `y`) within each value of
    * `groupCols` (empty = one global frontier). Returns the original rows
    * (all columns) that lie on the frontier. */
  def frontier2d(df: DataFrame, groupCols: Seq[String], x: String, y: String): DataFrame = {
    val gc: Seq[Column] = groupCols.map(col)
    val candidates = df.groupBy((gc :+ col(x)): _*).agg(min(col(y)).as("__ymin"))
    val sweep = Window.partitionBy(gc: _*).orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = candidates
      .withColumn("__prev", min(col("__ymin")).over(sweep))
      .filter(col("__prev").isNull || col("__ymin") < col("__prev"))
      .drop("__prev")
    df.join(broadcast(frontier), groupCols :+ x)
      .filter(col(y) === col("__ymin"))
      .drop("__ymin")
      .select(df.columns.map(col): _*)
  }
}
