package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The REPETITION half of the Gopher quality rules (Rae et al. 2021,
  * Appendix A1's second table — [[GopherRules]] covers the document-
  * shape half): what fraction of a document is one phrase said over and
  * over. Published thresholds, published measurements:
  *
  *  - duplicate-LINE character fraction ≤ 0.20 — characters living in
  *    lines whose exact text appears more than once, over all line
  *    characters;
  *  - top word-2-gram character fraction ≤ 0.20, top-3-gram ≤ 0.18,
  *    top-4-gram ≤ 0.16 — characters covered by the occurrences of the
  *    doc's MOST FREQUENT n-gram (occurrences × the gram's non-space
  *    character length), over all word characters.
  *
  * Exact-integer discipline throughout: fractions are 1e-6 fixed-point
  * BIGINTs via native IntegralDivide; the top gram breaks count ties by
  * the lexicographically smallest gram (total, both engines). A top
  * n-gram needs ≥ 2 occurrences to count as repetition (a unique gram
  * repeats nothing — its fraction reports 0, the published intent).
  *
  * Scale shape: one explode + doc-keyed count + per-doc argmax window
  * per n (grams ride the t8 shingle machinery), one line-keyed count
  * for the duplicate-line pass — all doc-bounded partitions, linear at
  * corpus scale.
  */
object GopherRepetition {

  private val M = 1000000L

  private def intDiv(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(l),
        org.apache.spark.sql.GraftBridge.expression(r)))

  /** One row per input row: (idCol, word_chars, per-n top gram + frac,
    * dup-line char frac, rule booleans, repetition_keep). */
  def measure(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
      lower(trim(col(textCol))).as("__t"),
      split(col(textCol), "\n").as("__lines"))
      .withColumn("__wc",
        length(regexp_replace(col("__t"), "\\s", "")).cast("long"))

    // top word-n-gram per doc: explode → count → argmax window
    def topGram(n: Int): DataFrame = {
      val grams = base.select(col(idCol), col("__wc"),
        explode_outer(graft.functions.expr.WordShingleStrings(
          col("__t"), n, distinct = false)).as("g"))
        .filter(col("g").isNotNull)
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("c").desc, col("g").asc)
      grams.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col(idCol), col("g").as(s"top${n}gram"),
          col("c").as(s"top${n}count"),
          (col("c") * length(regexp_replace(col("g"), " ", "")).cast("long"))
            .as(s"__cov$n"))
    }

    // duplicate-line characters: lines whose exact text repeats
    val lineChars = base.select(col(idCol),
      explode_outer(col("__lines")).as("l"))
      .filter(col("l").isNotNull && col("l") =!= "")
      .groupBy(col(idCol), col("l")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(length(col("l")).cast("long") * col("c")).as("__lineChars"),
        sum(when(col("c") > 1, length(col("l")).cast("long") * col("c"))
          .otherwise(0L)).as("__dupLineChars"))

    def fp(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0L, intDiv(num * M, den)).otherwise(0L).cast("long")

    val joined = base.select(col(idCol), col("__wc"))
      .join(topGram(2), Seq(idCol), "left")
      .join(topGram(3), Seq(idCol), "left")
      .join(topGram(4), Seq(idCol), "left")
      .join(lineChars, Seq(idCol), "left")
    def gramFrac(n: Int) = fp(
      when(col(s"top${n}count") >= 2L, coalesce(col(s"__cov$n"), lit(0L)))
        .otherwise(0L), col("__wc")).as(s"top${n}gram_char_frac_fp")
    val out = joined.select(
      col(idCol), col("__wc").as("word_chars"),
      col("top2gram"), coalesce(col("top2count"), lit(0L)).as("top2count"),
      gramFrac(2),
      col("top3gram"), coalesce(col("top3count"), lit(0L)).as("top3count"),
      gramFrac(3),
      col("top4gram"), coalesce(col("top4count"), lit(0L)).as("top4count"),
      gramFrac(4),
      fp(coalesce(col("__dupLineChars"), lit(0L)),
        coalesce(col("__lineChars"), lit(0L))).as("dup_line_char_frac_fp"))
    out.select(col(idCol) +: out.columns.filter(_ != idCol).map(col) :+
      (col("top2gram_char_frac_fp") <= M / 5).as("r_top2gram") :+
      (col("top3gram_char_frac_fp") <= M * 18L / 100L).as("r_top3gram") :+
      (col("top4gram_char_frac_fp") <= M * 16L / 100L).as("r_top4gram") :+
      (col("dup_line_char_frac_fp") <= M / 5).as("r_dup_lines"): _*)
      .withColumn("repetition_keep",
        col("r_top2gram") && col("r_top3gram") && col("r_top4gram") &&
          col("r_dup_lines"))
  }
}
