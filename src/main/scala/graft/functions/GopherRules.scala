package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher document-shape quality rules (Rae et al. 2021, Appendix A1 —
  * the published rule-pack every modern curation stack runs beside a
  * model filter: MassiveText, RefinedWeb, FineWeb all start here).
  * Implemented as pure Catalyst columns over one text column — no UDFs,
  * no shuffle; the whole pack rides the scan.
  *
  * Exact-integer discipline (the oracle-safe-math rule): every ratio
  * ships as a 1e-6 fixed-point BIGINT (`num·1e6 div den`), and every
  * threshold compares integers — no IEEE boundary cliff between the
  * engines. The published thresholds:
  *
  *  - word count in [50, 100 000]
  *  - mean word length in [3, 10]
  *  - symbol-to-word ratio ≤ 0.1 (for '#' and for '…' spelt "...")
  *  - ≤ 90% of lines start with a bullet ("- ")
  *  - ≤ 30% of lines end with an ellipsis ("...")
  *  - ≥ 80% of words contain an alphabetic character
  *  - ≥ 2 DISTINCT of the 8 Gopher stop words present
  *
  * Words are the whitespace split of lower(trim(text)); lines are the
  * '\n' split of the RAW text (bullets/ellipses are line-shape
  * properties, case-insensitive folding would not change them). Empty
  * docs measure 0 everywhere and fail the word-count rule.
  */
object GopherRules {

  /** The paper's stop-word list (presence-of-structure test, not a
    * frequency filter). */
  val stopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val M = 1000000L

  /** All measurements + per-rule booleans + the overall keep, as
    * (name, column) pairs in output order. `text` must be materialized
    * under a name by the caller if referenced repeatedly (the HOF rule);
    * these columns reference it many times but each is cheap. */
  def columns(text: Column): Seq[(String, Column)] = {
    // exact INTEGRAL division (Column `/` on longs widens to double,
    // whose floor can disagree with DuckDB's `//` on near-integer
    // quotients) — the native IntegralDivide via the bridge
    def intDiv(l: Column, r: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(l),
          org.apache.spark.sql.GraftBridge.expression(r)))
    val words = filter(split(lower(trim(text)), "\\s+"), w => w =!= "")
    val lines = split(text, "\n")
    val nW = size(words).cast("long")
    val nL = size(lines).cast("long")
    // Σ word length == non-whitespace char count — no per-word fold
    val sumLen = length(regexp_replace(lower(trim(text)), "\\s", "")).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val nStop = size(array_distinct(
      filter(words, w => w.isin(stopWords.map(lit): _*)))).cast("long")
    val nHash = (length(text) - length(translate(text, "#", ""))).cast("long")
    // non-overlapping left-to-right literal replace in both engines
    val nEllipsis = intDiv((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))).cast("long"), lit(3L))
    val nBulletLines = size(filter(lines, l => l.startsWith("- "))).cast("long")
    val nEllipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    def fp(num: Column, den: Column): Column =
      when(den > 0L, intDiv(num * M, den)).otherwise(0L).cast("long")
    val meanLenFp = fp(sumLen, nW)
    val hashRatioFp = fp(nHash, nW)
    val ellipsisRatioFp = fp(nEllipsis, nW)
    val bulletFracFp = fp(nBulletLines, nL)
    val ellipsisLineFracFp = fp(nEllipsisLines, nL)
    val alphaFracFp = fp(nAlpha, nW)
    val rWordCount = nW.between(50L, 100000L)
    val rMeanLen = meanLenFp.between(3L * M, 10L * M)
    val rSymbol = hashRatioFp <= M / 10 && ellipsisRatioFp <= M / 10
    val rBullet = bulletFracFp <= M * 9L / 10L
    val rEllipsis = ellipsisLineFracFp <= M * 3L / 10L
    val rAlpha = alphaFracFp >= M * 8L / 10L
    val rStop = nStop >= 2L
    Seq(
      "n_words" -> nW,
      "mean_word_len_fp" -> meanLenFp,
      "hash_ratio_fp" -> hashRatioFp,
      "ellipsis_ratio_fp" -> ellipsisRatioFp,
      "bullet_frac_fp" -> bulletFracFp,
      "ellipsis_line_frac_fp" -> ellipsisLineFracFp,
      "alpha_frac_fp" -> alphaFracFp,
      "n_stopwords" -> nStop,
      "r_word_count" -> rWordCount,
      "r_mean_word_len" -> rMeanLen,
      "r_symbol_ratio" -> rSymbol,
      "r_bullet_lines" -> rBullet,
      "r_ellipsis_lines" -> rEllipsis,
      "r_alpha_words" -> rAlpha,
      "r_stop_words" -> rStop,
      "gopher_keep" -> (rWordCount && rMeanLen && rSymbol && rBullet &&
        rEllipsis && rAlpha && rStop))
  }
}
