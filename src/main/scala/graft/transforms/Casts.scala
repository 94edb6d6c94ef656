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

  /** Null-on-error cast pinned to the UInt16 domain: negatives AND values
    * above 65535 become null, matching what Polars' `UInt16`
    * `cast(strict=False)` does on BOTH out-of-range sides (SURVEY §7.2
    * documents the type mapping; a one-sided guard would silently accept
    * 70000 where the reference yields null). */
  def tryToUInt(c: Column): Column = {
    val i = c.try_cast(IntegerType)
    when(i >= 0 && i <= 65535, i)
  }

  /** Datetime normalize: cast to timestamp, null on garbage.
    * Reference: `src/utils.py:600-619`. */
  def handleDatetime(c: Column): Column = c.try_cast(TimestampType)
}
