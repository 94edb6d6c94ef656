package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gates — the reference's scattered runtime invariants
  * (cardinality guard `src/core.py:633-638`, join-completeness assert
  * `src/core.py:1012`, FK validation `src/core.py:1770-1786`) unified as
  * reusable, fail-fast checks. Each computes its violation count in ONE
  * aggregate job (never a collect of the offending rows to the driver) and
  * returns the input DataFrame so checks chain inside a pipeline.
  */
object Checks {

  final case class CheckFailed(check: String, violations: Long)
    extends RuntimeException(s"$check: $violations violating rows")

  /** No duplicate values of the key columns. (The count alias is
    * namespaced: `.count()`'s literal "count" column would be ambiguous
    * whenever a key column is itself named "count".) */
  def requireUnique(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dups = df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
      .filter(col("__graft_cnt") > 1).count()
    if (dups > 0) throw CheckFailed(s"unique(${cols.mkString(",")})", dups)
    df
  }

  /** No nulls in the given columns. */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pred = cols.map(col(_).isNull).reduce(_ || _)
    val n = df.filter(pred).count()
    if (n > 0) throw CheckFailed(s"nonNull(${cols.mkString(",")})", n)
    df
  }

  /** Every child FK value must exist in the parent key set (left-anti
    * count — the distributed form of the reference's collect-and-isin). */
  def requireFkCoverage(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col(childKey) === col("__pk"), "left_anti")
      .count()
    if (orphans > 0) throw CheckFailed(s"fk($childKey -> $parentKey)", orphans)
    child
  }

  /** Exactly `n` rows match the predicate (the reference's single-row
    * guards, parameterized). */
  def requireExactly(df: DataFrame, n: Long, predicate: org.apache.spark.sql.Column): DataFrame = {
    val got = df.filter(predicate).count()
    if (got != n) throw CheckFailed(s"exactly($n)", got)
    df
  }
}
