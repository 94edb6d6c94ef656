package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-column data-skipping layout.
  *
  * A single sort column can only cluster ONE dimension: a 100 TB table
  * sorted by time prunes nothing for a user-id predicate. Interleaving
  * the bits of k normalized columns into one z-value and range-sorting by
  * it gives every output file a TIGHT min/max envelope in ALL k
  * dimensions at once, so parquet row-group statistics prune multi-column
  * box predicates (the Delta/Iceberg OPTIMIZE ZORDER recipe, built here
  * from public bit arithmetic — `shiftright`/`&`/`shiftleft`/`|` — inside
  * whole-stage codegen; no UDF).
  *
  * `ZOrderSpec` pins the interleave inverse and the pruning effect
  * (z-ordered layout's scan emits a fraction of the rows the same
  * predicate scans in a random layout); `s12_zorder_interleave` hash-gates
  * the bit math against a DuckDB closed form.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (non-negative longs;
    * values ≥ 2^bits are masked) into one z-value: column i's bit b lands
    * at output position `b * n + i`, so bit significance stays balanced
    * across dimensions. 2 cols × 31 bits or 3 × 21 fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-ordering one column is just sorting it")
    require(bits >= 1 && bits * n <= 62, s"bits=$bits × $n columns overflows a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear map of a numeric column from [min, max] onto the z-grid
    * [0, 2^bits): the normalization step for non-integer or wide-range
    * dimensions. min/max come from stats the caller already has (a 100 TB
    * layout job reads them from table metadata, not a scan). */
  def normalizeToBits(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    require(maxV > minV)
    val cells = (1L << bits) - 1
    least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(minV)) / lit(maxV - minV) * lit(cells + 1))
        .cast("long")))
  }

  /** Cluster `df` into `nFiles` z-ordered ranges: range-partition on the
    * z-value then sort within partitions, so every output file covers a
    * contiguous z-range = a tight k-dimensional box. One shuffle, once,
    * at layout time; every later box predicate prunes at the row-group
    * level for free. */
  def layout(df: DataFrame, cols: Seq[Column], bits: Int, nFiles: Int): DataFrame = {
    val z = zValue(cols, bits)
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
  }
}
