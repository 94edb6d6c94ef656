package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern SUBSTRING blocklist matching — the category-blocklist
  * curation stage every published web pipeline runs (C4's bad-word
  * list, RefinedWeb/FineWeb's UT1 URL blocklists): which of a list of
  * (pattern, category) strings occur ANYWHERE in each document —
  * substring occurrence, not token equality, so an embedded match
  * inside a longer word still fires (the evasion the token-level t65
  * badword rule documents as out of scope).
  *
  * Scale mechanism — the length-grouped SHINGLE JOIN, not a per-pattern
  * scan: patterns group by length ℓ (a bounded, loud set of distinct
  * lengths); for each ℓ every doc contributes its DISTINCT character
  * ℓ-shingles (one higher-order transform + array_distinct, linear in
  * |doc| per length), and one broadcast equi-join against the pattern
  * table finds all matches. Cost is O(Σ_ℓ |doc|) independent of the
  * PATTERN COUNT per length — the property that lets a 100k-entry
  * blocklist run at the price of a 10-entry one, where a regex
  * alternation or per-pattern contains() scan multiplies by |patterns|.
  *
  * Output keeps zero-match docs: (idCol, categories array<string>
  * sorted distinct, n_patterns matched distinct, blocked).
  */
object Blocklist {

  def matchCategories(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String)], maxLengths: Int = 32): DataFrame = {
    require(patterns.nonEmpty, "empty blocklist")
    require(patterns.forall(_._1.nonEmpty), "empty pattern in blocklist")
    // bucket by CODEPOINT count, not Java's UTF-16 length — Spark's
    // length()/substr() cut codepoints, so a supplementary-plane char
    // (emoji, rare ideograph) counted as 2 here would put the pattern in
    // a bucket whose shingles can never equal it: a silent false
    // negative in a safety filter
    def cp(s: String): Int = s.codePointCount(0, s.length)
    val lens = patterns.map(p => cp(p._1)).distinct
    require(lens.size <= maxLengths,
      s"${lens.size} distinct pattern lengths exceed maxLengths=$maxLengths " +
        "— bucket patterns into fewer lengths or raise the bound explicitly")
    val spark = docs.sparkSession
    import spark.implicits._
    val patDf = patterns.toDF("__shingle", "category")
    val shingles = lens.map { l =>
      docs.select(col(idCol),
        explode(array_distinct(
          when(length(col(textCol)) >= l,
            transform(sequence(lit(1), length(col(textCol)) - (l - 1)),
              i => col(textCol).substr(i, lit(l))))
            .otherwise(array().cast("array<string>")))).as("__shingle"))
    }.reduce(_ unionAll _)
    val hits = shingles.join(broadcast(patDf), Seq("__shingle"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("category"))).as("categories"),
        countDistinct(col("__shingle")).as("n_patterns"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("categories"), array().cast("array<string>")).as("categories"),
        coalesce(col("n_patterns"), lit(0L)).as("n_patterns"))
      .withColumn("blocked", col("n_patterns") > 0)
  }
}
