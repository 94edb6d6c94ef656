package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cast/parse builders.
  *
  * Reference: `src/utils.py:579-619` (`handle_year`, `handle_datetime`) and
  * the `strict=False` casts at `src/core.py:1750-1752`. Spark's `try_cast`
  * already has the null-on-error semantics Polars gets from `strict=False`;
  * unsigned widths (`pl.UInt16`) have no Spark analogue and land on
  * `IntegerType` per the target DDL (`sql/init_core.sql:324-327`).
  */
object Casts {

  /** Year column: trim then strict-null int parse ("1999 " → 1999, "x" → null).
    * Reference: `src/utils.py:579-597`. */
  def handleYear(c: Column): Column = tryToInt(trim(c))

  /** Null-on-error cast to int (Polars `cast(strict=False)`). */
  def tryToInt(c: Column): Column = c.try_cast(IntegerType)

  /** Null-on-error cast to a non-negative int; negatives (which Polars'
    * UInt16 cast would reject) become null — the documented divergence pin
    * from SURVEY §7.2. */
  def tryToUInt(c: Column): Column = {
    val i = c.try_cast(IntegerType)
    when(i >= 0, i)
  }

  /** Datetime normalize: cast to timestamp, null on garbage.
    * Reference: `src/utils.py:600-619`. */
  def handleDatetime(c: Column): Column = c.try_cast(TimestampType)
}
