package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-column builders (reference list ops, `src/core.py:1334-1451`),
  * all higher-order functions — no UDFs.
  */
object Arrays {

  /** Per-element enum rewrite inside an array (`src/core.py:1336-1351`). */
  def transformElements(arr: Column, f: Column => Column): Column =
    transform(arr, f)

  /** Per-element char cleanup: spaces and dots → underscores
    * (`src/core.py:1365-1373`; also fixes the reference's `auac.py:256`
    * regex-dot bug by quoting the "."). */
  def elementCleanup(arr: Column): Column =
    transform(arr, x => regexp_replace(regexp_replace(x, " ", "_"), "\\.", "_"))

  /** Null array → empty array (`src/core.py:1391-1394`). */
  def nullToEmpty(arr: Column): Column = coalesce(arr, array())

  /** Array of strings → PostgreSQL text[] literal `{"a","b"}`
    * (`src/core.py:1432-1451`). Empty array → `{}`.
    *
    * Produces VALID literals for arbitrary text, which the reference's
    * naive join does not: backslashes and double quotes are escaped
    * (PG array-literal quoting rules), and a null ELEMENT renders as
    * unquoted NULL instead of being silently dropped by concat_ws's
    * null-skipping (which would also shift every later position). */
  def toPgTextArrayLiteral(arr: Column): Column = {
    def esc(x: Column): Column =
      regexp_replace(regexp_replace(x, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    concat(
      lit("{"),
      concat_ws(",", transform(arr, x =>
        when(x.isNull, lit("NULL"))
          .otherwise(concat(lit("\""), esc(x), lit("\""))))),
      lit("}"))
  }
}
