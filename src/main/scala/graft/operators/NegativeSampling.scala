package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative sampling for embedding training — the word2vec draw
  * (Mikolov et al. 2013, public method): each positive (center, context)
  * pair gets `k` negatives drawn from the unigram distribution raised to
  * 3/4, via the UNIGRAM TABLE quantization the published implementation
  * uses (a T-slot table where each item owns slots proportional to its
  * weight; a draw picks a slot uniformly). This is the last stage of the
  * embedding-prep chain: d57/d61 walks → d62 skip-gram pairs → training
  * file of (center, context, negative) triples.
  *
  * Determinism (the d61/d63 stochastic-replay discipline):
  *  - weight(v) = floor(sqrt(sqrt(cnt³)) · 1e6) as BIGINT — cnt^(3/4)
  *    computed as two CORRECTLY-ROUNDED IEEE sqrts over an exactly-
  *    representable integer cube (sqrt is the one libm op both engines
  *    round identically; pow is not), so the fixed-point weights are
  *    bit-equal cross-engine;
  *  - each item's slot range is CLOSED-FORM: v owns slots
  *    [⌈cum·T/W⌉, ⌈(cum+w)·T/W⌉) over the id-ordered cumulative weight
  *    line — the ceil-division quantization partitions [0, T) exactly,
  *    so the table needs no range join, just arithmetic + one bounded
  *    explode (T slots total);
  *  - a draw's slot is the engine-portable (center, context, draw) hash
  *    mix mod T — REPLICATED in the d67 oracle; change both or neither.
  *
  * Scale shape: the cumulative line runs through [[PrefixSum]] (bucketed,
  * never a SinglePartition window — vocab can be billions of tokens);
  * the table is T rows (config-sized, broadcastable), so attaching
  * negatives is ONE equi-join of the exploded draw stream against a
  * broadcast table + nothing else. Positives-as-negatives collisions are
  * kept, exactly like the published implementation (they are rare and
  * training-neutral; filtering would add a pair-keyed anti-join for no
  * measured benefit).
  */
object NegativeSampling {

  /** @param pairs      positive pairs (one row per (center, context))
    * @param counts     unigram counts: (vCol, cntCol ≥ 1)
    * @param k          negatives per pair
    * @param tableSize  T, the unigram-table quantization (word2vec ships
    *                   1e8; gates use a small T — resolution only affects
    *                   which items a draw can hit, never determinism)
    * @return (centerCol, contextCol, draw_idx, negative) — k rows per pair
    */
  def negativeSamples(
      pairs: DataFrame, centerCol: String, contextCol: String,
      counts: DataFrame, vCol: String, cntCol: String,
      k: Int, tableSize: Long = 4096L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(tableSize >= 1L, s"tableSize must be >= 1, got $tableSize")
    val wts = counts.select(
      col(vCol).cast("long").as("v"),
      floor(sqrt(sqrt((col(cntCol) * col(cntCol) * col(cntCol)).cast("double"))) *
        lit(1000000.0)).cast("long").as("w"))
    // id-ordered cumulative weight line, bucketed (PrefixSum), grand
    // total attached per row — cum-BEFORE is the inclusive sum minus own w
    val cum = PrefixSum.withRunningSum(
      wts, "v", descending = false, tieBreak = Seq.empty,
      value = col("w"), out = "cw", totalOut = Some("tw"))
    val t = lit(tableSize)
    // ceil-div via (a + tw - 1) div tw, computed in DECIMAL(38,0): cum·T
    // with both factors BIGINT-valued is ≤ ~8.5e37, which a 38-digit
    // decimal holds EXACTLY (a raw BIGINT product overflows once total
    // weight W exceeds Long.MaxValue/T — at word2vec's T=1e8 that is a
    // toy-corpus W of ~9e10); `div` on decimals is still integral and
    // returns BIGINT, and the quotients are slot indices ≤ T, so the
    // narrow result type is safe by construction
    val table = cum
      .select(col("v").as("negative"),
        expr(s"(cast(cw - w as decimal(38,0)) * $tableSize + tw - 1) div tw").as("s0"),
        expr(s"(cast(cw as decimal(38,0)) * $tableSize + tw - 1) div tw").as("s1"))
      .filter(col("s1") > col("s0"))
      .select(col("negative"), explode(sequence(col("s0"), col("s1") - 1)).as("slot"))
    val draws = pairs
      .select(col(centerCol).cast("long").as(centerCol),
        col(contextCol).cast("long").as(contextCol))
      .withColumn("draw_idx", explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn("slot",
        ((col(centerCol) % 1000003L) * 2654435761L +
          (col(contextCol) % 1000003L) * 97003L +
          col("draw_idx") * 65599L) % 1000000007L % t)
    draws.join(table, Seq("slot"))
      .select(col(centerCol), col(contextCol), col("draw_idx"), col("negative"))
  }
}
