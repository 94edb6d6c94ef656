package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join — an operator the reference never
  * needed (its joins are all equi-joins, SURVEY §2.5) but a time-series /
  * feature-store pipeline cannot live without: each left row picks up the
  * most recent right row with `right.ts <= left.ts` for the same key.
  *
  * Spark-first plan, not a range join: both sides union into one stream
  * tagged by side, one hash shuffle on the key, one sort by (ts, side), and
  * a running `last(payload, ignoreNulls)` window carries the latest right
  * payload forward into every left row. Cost is sort-shuffle linear in
  * |L|+|R| — the naive `l.ts >= r.ts` theta-join explodes quadratically
  * per key, and Spark would plan it as BroadcastNestedLoopJoin.
  *
  * Left-outer semantics: a left row with no prior right match keeps null
  * payload columns (matches DuckDB `ASOF LEFT JOIN`, the oracle).
  * Rows where `right.ts == left.ts` DO match (>= semantics, side tag
  * orders right before left at equal timestamps).
  */
object AsOfJoin {

  /** @param payload right-column → output-name map (ordered);
    *                 all other right columns are dropped.
    * @param rightTiebreak right columns ordering right rows that share the
    *                 same (key, ts): the row greatest under the tiebreak
    *                 wins. Without it, multiple right rows at an identical
    *                 (key, ts) make the matched payload retry-dependent —
    *                 callers with possibly-duplicate right timestamps MUST
    *                 pass one to keep the repo's determinism contract.
    */
  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[(String, String)],
      rightTiebreak: Seq[String] = Nil): DataFrame = {
    require(payload.map(_._2).forall(a => !left.columns.contains(a)),
      s"payload aliases ${payload.map(_._2)} must not collide with left columns")
    val keyCols = keys.map(col)
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val pStruct = struct(payload.map { case (c, a) => col(c).as(a) }: _*)
    val lType = left.select(leftStruct.as("__l")).schema("__l").dataType
    val tbNames = rightTiebreak.indices.map(i => s"__tb$i")
    val tbTypes = rightTiebreak.map(c => right.schema(c).dataType)
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType

    // ASOF equi-key semantics: a NULL right key or NULL right ts can never
    // satisfy (r.key = l.key AND r.ts <= l.ts) — without this filter the
    // nulls-first sort would carry a null-ts payload into every left row
    // and pool all null-key rows into one matching partition. Null-KEY/ts
    // LEFT rows need no filter: they sort before any (filtered) right row
    // and correctly pick up a null payload, keeping left-outer semantics.
    val r2 = right
      .filter((col(rightTs) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))
      .select(
        keyCols ++ Seq(
          col(rightTs).as("__ts"), lit(0).as("__side"),
          pStruct.as("__p"), lit(null).cast(lType).as("__l")) ++
          rightTiebreak.zip(tbNames).map { case (c, n) => col(c).as(n) }: _*)
    val l2 = left.select(
      keyCols ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(pType).as("__p"), leftStruct.as("__l")) ++
        tbNames.zip(tbTypes).map { case (n, t) => lit(null).cast(t).as(n) }: _*)

    // Order is (__ts, __side, tiebreak…): right rows at an equal (key, ts)
    // all share __side=0 and are ordered by tiebreak asc, so the running
    // last() picks the greatest one deterministically; left rows still sort
    // after right rows via __side before tiebreak is consulted.
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts") +: col("__side") +: tbNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // getField, not col("__l.name"): a left column named "user.id" would
    // otherwise be parsed as a nested-field path.
    r2.unionByName(l2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
          payload.map { case (_, a) => col("__m").getField(a).as(a) }: _*)
  }
}
