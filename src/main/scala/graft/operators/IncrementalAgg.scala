package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a grouped rollup current under
  * daily deltas WITHOUT re-scanning the base fact table.
  *
  * The 100 TB shape this exists for: a corpus/fact table receives a
  * delta (new crawl, new day's events) that is orders of magnitude
  * smaller than the accumulated base. Recomputing `groupBy(keys).agg(...)`
  * re-shuffles the full history every day; maintaining a mergeable STATE
  * costs one delta-sized aggregation plus a state-keyed merge — work
  * proportional to |delta| + |distinct keys|, independent of |base|.
  *
  * Contract: every measure column must be ADDITIVE — counts and exact
  * decimal sums merge by `sum`; averages derive from (sum, count) at read
  * time. Retractions are negative-delta rows (CDC deletes aggregate to
  * (-1, -value) contributions), which additivity absorbs for free.
  * Non-additive aggregates (min/max/distinct) are NOT maintainable this
  * way under deletes — keep those on sketches (HLL merges) or recompute;
  * the API takes explicit measure names so a non-additive column can't
  * slip through silently.
  *
  * Keep sums in DECIMAL until the final read: merging exact decimals is
  * associative, so the maintained state equals the full recompute
  * bit-for-bit no matter how many merge steps produced it (the engine's
  * oracle-exact money-sum rule, `queries.Num`).
  */
object IncrementalAgg {

  /** Merge an aggregate `state` with a same-schema `deltaAgg` (the delta
    * batch already aggregated to the state's grain): union at state+delta
    * key cardinality, one hash-agg summing each measure. Groups whose
    * merged count reaches 0 (fully retracted) drop out of the state, so
    * repeated maintenance never accretes dead keys. `countCol` names the
    * measure holding the group's row count.
    *
    * OVER-retraction (deleting a row twice) is NOT absorbed: the group's
    * count goes negative and stays visibly negative in the state rather
    * than being silently clamped — callers that need the invariant add a
    * `state.filter(col(countCol) < 0)`-is-empty assertion at their sink,
    * where one aggregate action is already being paid. */
  def merge(
      state: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], measures: Seq[String], countCol: String): DataFrame = {
    require(measures.contains(countCol), s"countCol '$countCol' must be one of $measures")
    val cols = keys ++ measures
    require(cols.forall(state.columns.contains) && cols.forall(deltaAgg.columns.contains),
      s"state/delta must both carry $cols")
    state.select(cols.map(col): _*)
      .unionByName(deltaAgg.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(measures.head).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
      .filter(col(countCol) =!= 0)
  }
}
