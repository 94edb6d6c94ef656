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

  /** Weighted sample WITHOUT replacement, k rows, inclusion probability
    * proportional to `weight` — Efraimidis–Spirakis A-ES: each row draws
    * the deterministic uniform u = hash(id, seed) and competes with key
    * u^(1/w); the k largest keys win. Pure function of (id, seed, weight):
    * retry/rerun-stable like every sampler here, and weight-SCALE-invariant
    * (w → c·w applies the monotone map x → x^(1/c) to all keys, preserving
    * order — pinned in SamplingChecksSpec). The top-k is a TakeOrdered
    * (O(k) heap per partition + k-row driver merge), never a full sort.
    * Rows with weight ≤ 0 or null are excluded by contract. */
  def weightedSample(
      df: DataFrame, k: Int, seed: Long, weight: Column, ids: Column*): DataFrame = {
    // u STRICTLY inside (0, 1) at full double resolution: 52 hash bits
    // (>>> 12), so x + 0.5 stays exactly representable for EVERY x — with
    // 53 bits the maximal x has (2^53-1) + 0.5 round half-even UP to 2^53
    // and u hits exactly 1.0, pinning key = 1.0 regardless of weight. The
    // half-shift keeps both endpoints out (u in [2^-53, 1 - 2^-53]); a
    // coarser grid (e.g. 1e6 levels) makes equal-weight rows collide on u
    // past ~1e6 rows, and the ascending-id tie-break then biases the
    // top-k boundary toward low ids.
    val u = (shiftrightunsigned(xxhash64((lit(seed) +: ids): _*), 12).cast("double") + 0.5) /
      4503599627370496.0
    df.filter(weight > 0)
      .withColumn("__wkey", pow(u, lit(1.0) / weight))
      .orderBy(col("__wkey").desc, struct(ids: _*))
      .limit(k)
      .drop("__wkey")
  }
}
