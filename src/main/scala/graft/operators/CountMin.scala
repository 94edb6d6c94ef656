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

  /** CMS inner product — the classic sketch JOIN-SIZE estimator
    * (AGMS/CMS): for sketches of streams A and B built with the SAME
    * (eps, confidence, seed) — same depth/width/hash family, enforced —
    * `min_i Σ_j tableA[i][j]·tableB[i][j]` estimates
    * Σ_key f_A(key)·f_B(key), which IS |A ⋈ B| on that key. One-sided
    * like the point estimate: every cell product carries the true
    * colliding mass plus non-negative cross terms, so estimate ≥ exact
    * always, and ≤ exact + ε·N_A·N_B with probability 1−δ. Lets an
    * operator price a 100 TB join from two fixed-memory sketches without
    * touching per-key counts (q4's exact estimator is key-cardinality
    * work; this is O(sketch)).
    *
    * Parses Spark's versioned CMS serialization (version 1:
    * int version, long totalCount, int depth, int width, long hashA[depth],
    * long table[depth][width], big-endian — the stable cross-version
    * interchange format `CountMinSketch.readFrom` documents). */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Double = {
    case class Parsed(total: Long, depth: Int, width: Int,
        hashA: Array[Long], rows: Array[Array[Long]])
    def parse(bytes: Array[Byte]): Parsed = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val version = in.readInt()
      require(version == 1, s"unsupported CMS serialization version $version")
      val total = in.readLong()
      val depth = in.readInt()
      val width = in.readInt()
      val hashA = Array.fill(depth)(in.readLong())
      val rows = Array.fill(depth)(Array.fill(width)(in.readLong()))
      Parsed(total, depth, width, hashA, rows)
    }
    val (pa, pb) = (parse(a), parse(b))
    require(pa.depth == pb.depth && pa.width == pb.width &&
      java.util.Arrays.equals(pa.hashA, pb.hashA),
      "join-size inner product needs sketches built with the same eps/confidence/seed")
    var best = Double.PositiveInfinity
    var i = 0
    while (i < pa.depth) {
      var acc = BigInt(0)
      var j = 0
      while (j < pa.width) {
        acc += BigInt(pa.rows(i)(j)) * pb.rows(i)(j)
        j += 1
      }
      best = math.min(best, acc.toDouble)
      i += 1
    }
    best
  }
}
