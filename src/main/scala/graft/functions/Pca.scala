package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Driver-side PCA stage over the [[expr.GramMatrix]] sufficient
  * statistics — the promised second half of d58's contract ("eigen work
  * happens driver-side on the d×d result, bounded by dimension, never by
  * data"): the only thing collected is the d(d+1)/2-entry Gram row.
  *
  * [[topDirectionFixedPoint]] runs POWER ITERATION on the exact-integer
  * covariance numerator C = n·dot − s·sᵀ in 64-bit FIXED POINT, so the
  * dominant principal direction is bit-identical across engines, runs,
  * and hardware — the d21/PageRank determinism discipline applied to
  * linear algebra:
  *
  *  - C is divided by `cDiv` (TRUNCATING division — Scala's `Long./`,
  *    DuckDB's `//`, and Spark's `div` all truncate toward zero, probed)
  *    to make room for the iteration's products;
  *  - x₀ = xScale for every coordinate; each round y = C'·x, then
  *    x ← (y·xScale) / max|y| (truncating), renormalizing to ≤ xScale;
  *  - every add/multiply is `Math.addExact`/`multiplyExact` — overflow
  *    REFUSES loudly with the knob names instead of wrapping.
  *
  * The fixed-point direction converges to the dominant eigenvector of C
  * at the usual power-iteration rate (|λ₂/λ₁|ᵏ), with coordinates held
  * to xScale resolution; PcaSpec pins cosine ≥ 0.999 against a
  * double-precision reference after a handful of rounds. Float eigen
  * (for callers who want eigenvalues/orthogonal bases) belongs
  * driver-side on the same collected row — by then it is a 64×64
  * problem, not a data problem.
  */
object Pca {

  /** @param gram   1-row frame shaped like [[expr.GramMatrix]]'s output
    *               (struct columns n, sums, entries) — pass the d58
    *               aggregate's result
    * @param dim    vector dimension (must match the aggregate's)
    * @param rounds power-iteration rounds (each sharpens the direction
    *               by |λ₂/λ₁|)
    * @param cDiv   pre-scale divisor for C (truncating); size it so
    *               max|C|/cDiv · xScale · dim stays ≪ 2^63/xScale
    * @param xScale fixed-point scale of the iterate (and the output)
    * @return (i, x_fp): 1-based coordinate index, fixed-point component
    *         of the dominant principal direction (sign = whichever the
    *         iteration converged to; flip by x_fp of coordinate 1 if a
    *         canonical sign is needed)
    */
  def topDirectionFixedPoint(
      gram: DataFrame, dim: Int, rounds: Int = 4,
      cDiv: Long = 100000000000L, xScale: Long = 100000L): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    require(cDiv >= 1L && xScale >= 1L, "cDiv and xScale must be positive")
    val row: Row = gram.select(col("n"), col("sums"), col("entries")).head()
    val n = row.getLong(0)
    val sums = row.getSeq[Long](1).toArray
    require(sums.length == dim, s"gram row has ${sums.length} dims, expected $dim")
    // full symmetric C' from the upper triangle, exact then truncated
    val c = Array.ofDim[Long](dim, dim)
    row.getSeq[Row](2).foreach { e =>
      val i = e.getInt(0) - 1
      val j = e.getInt(1) - 1
      val cij = Math.subtractExact(
        Math.multiplyExact(n, e.getLong(2)),
        Math.multiplyExact(sums(i), sums(j))) / cDiv
      c(i)(j) = cij
      c(j)(i) = cij
    }
    var x = Array.fill(dim)(xScale)
    for (_ <- 1 to rounds) {
      val y = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var acc = 0L
        var j = 0
        while (j < dim) {
          acc = Math.addExact(acc, Math.multiplyExact(c(i)(j), x(j)))
          j += 1
        }
        y(i) = acc
        i += 1
      }
      val m = y.map(math.abs).max
      require(m > 0L,
        "power iteration collapsed to zero — cDiv too large for this Gram (lower it)")
      x = y.map(v => Math.multiplyExact(v, xScale) / m)
    }
    val spark = gram.sparkSession
    import spark.implicits._
    x.zipWithIndex.map { case (v, i) => (i + 1, v) }.toSeq.toDF("i", "x_fp")
  }
}
