package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style SPAN CORRUPTION (Raffel et al. 2020 §3.1.4 — the denoising
  * objective's data prep): contiguous runs of masked tokens collapse to
  * ONE sentinel in the input, and the target lists each sentinel
  * followed by the tokens it hid, closed by a final sentinel — the
  * published input/target shape for encoder-decoder pretraining.
  *
  *   tokens:  a b c d e     mask: - X X - X
  *   input:   "a <extra_id_0> d <extra_id_1>"
  *   target:  "<extra_id_0> b c <extra_id_1> e <extra_id_2>"
  *
  * The mask DECISION is the caller's column over (doc, pos, tok) —
  * production uses a seeded random rate (deterministic via hash, the
  * Sampling discipline); the gate uses a positional rule so the oracle
  * can replay it. The mechanics here are the published invariants:
  * run-merging (adjacent masked tokens share a sentinel), per-doc
  * 0-based sentinel numbering in order, the trailing terminator
  * sentinel, and mask-free docs yielding the bare terminator.
  *
  * Shape: one posexplode + ONE doc-keyed window pass (lag + running
  * sum — run heads via the gaps-and-islands trick) + two doc-keyed
  * aggregates with in-order array_sort reassembly. Partitions are
  * doc-bounded; no global structure.
  *
  * @param mask boolean Column over the exploded frame; may reference
  *             `pos` (0-based) and `tok`
  * @return (idCol, n_tokens, n_masked, n_spans, input_text, target_text)
  */
object SpanCorruption {

  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      mask: Column): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextTokens.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val marked = toks
      .withColumn("msk", mask)
      .withColumn("rh",
        (col("msk") && !coalesce(lag(col("msk"), 1).over(w), lit(false))).cast("long"))
      .withColumn("span_id", sum(col("rh")).over(w))
    val sentinel = (i: Column) => concat(lit("<extra_id_"), i, lit(">"))
    val inputAgg = marked
      .withColumn("piece",
        when(!col("msk"), col("tok"))
          .when(col("rh") === 1, sentinel(col("span_id") - 1)))
      .groupBy(col(idCol).as("__iid"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("msk").cast("long")).as("n_masked"),
        coalesce(max(col("span_id")), lit(0L)).as("n_spans"),
        array_join(
          array_sort(collect_list(when(col("piece").isNotNull,
            struct(col("pos"), col("piece"))))).getField("piece"),
          " ").as("input_text"))
    val runs = marked.filter(col("msk"))
      .groupBy(col(idCol).as("__rid"), col("span_id"))
      .agg(concat(sentinel(col("span_id") - 1), lit(" "),
        array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok"), " ")).as("seg"))
    val targetAgg = runs.groupBy(col("__rid"))
      .agg(array_join(array_sort(collect_list(struct(col("span_id"), col("seg"))))
        .getField("seg"), " ").as("__tgt"))
    docs.select(col(idCol))
      .join(inputAgg, col(idCol) === col("__iid"), "left")
      .join(targetAgg, col(idCol) === col("__rid"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        concat(
          when(col("__tgt").isNotNull, concat(col("__tgt"), lit(" "))).otherwise(lit("")),
          sentinel(coalesce(col("n_spans"), lit(0L)))).as("target_text"))
  }
}
