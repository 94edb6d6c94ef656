package graft.operators

import java.io.ByteArrayOutputStream

import graft.functions.expr.CmsEstimateString
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketching over a string column — the one-pass,
  * fixed-memory answer to "how often does each of these items occur in a
  * 100 TB stream" when the full exact counter table would itself be huge.
  *
  * Build is a distributed aggregate (executor-side partial sketches merged
  * by counter addition — CMS merge is exact and associative, so the result
  * is independent of partition order and identical to a single-pass build
  * with the same seed). The probe embeds the sketch bytes in a codegen'd
  * expression ([[CmsEstimateString]]) — no shuffle, no per-row
  * deserialization.
  *
  * Accuracy contract: estimate ≥ true count always (counters only
  * increment); estimate ≤ true + ε·N with probability 1−δ, where N is the
  * stream length. `AggSketchSpec` pins both plus merge associativity.
  *
  * The reference has no sketch family at all (its aggregations are exact
  * in-memory, SURVEY §2.6); this extends the engine's mergeable-sketch set
  * (HLL `a11`, GK `a13`, Bloom `j14`) to frequency estimation.
  */
object CountMin {

  /** Serialized CMS of `df(key)` (strings; nulls are skipped by the
    * aggregate). Eager: runs one aggregate job, like any sketch build. */
  def build(df: DataFrame, key: String,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42): Array[Byte] = {
    val cms = df.stat.countMinSketch(col(key), eps, confidence, seed)
    val bos = new ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  /** Estimated stream frequency of `key` under a built sketch. */
  def estimate(key: Column, cmsBytes: Array[Byte]): Column =
    CmsEstimateString.estimate(key, cmsBytes)
}
