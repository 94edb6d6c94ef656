package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup — the CCNet preprocessing stage (public
  * method: CCNet dedups at PARAGRAPH granularity before document-level
  * work, which is what actually strips boilerplate — nav bars, cookie
  * banners, license footers — that document-level fingerprints can't
  * see because every page differs somewhere else).
  *
  * Semantics: split each doc on the separator, fingerprint every
  * paragraph, keep the corpus-wide FIRST occurrence of each fingerprint
  * (min (doc_id, position) — the a3 deterministic first-wins rule at
  * paragraph grain), and REASSEMBLE each doc from its surviving
  * paragraphs in original order. A doc whose every paragraph was seen
  * earlier collapses to the empty string (kept as a row — the caller
  * decides whether empty docs drop).
  *
  * Scale shape: one explode (linear in paragraphs), ONE fingerprint-
  * keyed window shuffle for first-wins, one doc-keyed reassembly
  * aggregate with sort_array(struct(pos, …)) restoring order — the
  * tokenizeCorpus reassembly idiom. No driver-side state.
  */
object ParagraphDedup {

  /** @return (idCol, n_paragraphs, n_kept, clean_text) — one row per
    *         input row, clean_text = surviving paragraphs joined by
    *         `sep` in original order */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = docs
      .select(col(idCol), posexplode_outer(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
      .filter(col("para").isNotNull && col("para") =!= "")
    val w = Window.partitionBy(col("__fp"))
      .orderBy(col(idCol).asc, col("pos").asc)
    val kept = paras
      .withColumn("__fp", md5(col("para")))
      .withColumn("__rn", row_number().over(w))
    val assembled = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paragraphs"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          sort_array(collect_list(
            when(col("__rn") === 1, struct(col("pos"), col("para")))))
            .getField("para"), sep).as("clean_text"))
    docs.select(col(idCol))
      .join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_paragraphs"), lit(0L)).as("n_paragraphs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
