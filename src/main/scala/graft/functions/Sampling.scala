package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation.
  *
  * Training-data pipelines subsample per stratum (source, language,
  * quality band) with fixed per-stratum rates. Sampling here is a PURE
  * FUNCTION of (row identity, seed) — `xxhash64(id, seed)` mapped to
  * [0,1) — not `rand()`: the same row is kept or dropped on every run,
  * every retry, and every executor, so downstream joins against a sample
  * stay consistent and incremental reprocessing sees a stable subset.
  */
object Sampling {

  /** Uniform keep-decision: hash of the id columns → [0, 1).
    *
    * PRECONDITION: the id columns identify rows (distinct, non-null).
    * xxhash64 SKIPS null inputs, so all null-id rows share one hash and
    * are kept or dropped as a single block — the unavoidable face of
    * determinism (content-identical rows cannot be split by any pure
    * function of content). Assign surrogate ids upstream if null ids are
    * possible. */
  def hashFraction(seed: Long, ids: Column*): Column =
    (pmod(xxhash64((lit(seed) +: ids): _*), lit(1000000L)).cast("double") / 1000000.0)

  /** Keep each row with probability `fraction`, deterministically by id. */
  def sample(df: DataFrame, fraction: Double, seed: Long, ids: Column*): DataFrame =
    df.filter(hashFraction(seed, ids: _*) < fraction)

  /** Per-stratum rates: `rates(stratum) -> fraction`; strata absent from
    * the map are dropped (rate 0). */
  def stratifiedSample(
      df: DataFrame, stratumCol: Column, rates: Map[String, Double],
      seed: Long, ids: Column*): DataFrame = {
    val rate = coalesce(
      element_at(typedLit(rates), stratumCol.cast("string")), lit(0.0))
    df.filter(hashFraction(seed, ids: _*) < rate)
  }
}
