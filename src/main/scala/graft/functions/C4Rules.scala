package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rule-pack (Raffel et al. 2020 §2.2 — the published
  * heuristics that produced C4 from Common Crawl), completing the
  * quality family beside the Gopher document-shape and repetition rules:
  * C4 filters at LINE granularity first, then at PAGE granularity.
  *
  * Line rules (a line survives iff ALL hold):
  *  - ends in a terminal punctuation mark (`.` `!` `?` or a closing
  *    quotation mark), trailing whitespace ignored;
  *  - has at least 3 whitespace words;
  *  - does not contain the word "javascript" (case-insensitive).
  *
  * Page rules (computed over the ORIGINAL page, flags + a final keep):
  *  - no word from the bad-word list (whitespace tokens, lowercased,
  *    exact match — punctuation-welded words are outside the subset,
  *    documented);
  *  - no "lorem ipsum" (case-insensitive);
  *  - no `{` (the code tripwire);
  *  - at least 5 sentences, counted as `.` `!` `?` occurrences in the
  *    KEPT text (the published pipeline counts tokenized sentences; the
  *    terminal-punct proxy is this implementation's documented stand-in
  *    and is exact on corpora whose sentences end with one mark).
  *
  * Everything is Catalyst higher-order functions and regexps riding the
  * scan — filter() over split lines, array_join reassembly in original
  * order, ZERO shuffles and zero UDFs. The 3-sentence-span dedup C4
  * also ran is [[ParagraphDedup]]'s shape, deliberately separate.
  */
object C4Rules {

  /** The line-survival predicate. The terminal class includes the curly
    * end quotation mark ” and apostrophe ’ — the typographic forms web
    * text actually uses — alongside ASCII `.` `!` `?` `"` (Raffel §2.2's
    * rule names the "end quotation mark"). */
  def lineKeep(line: Column): Column =
    rtrim(line).rlike("[.!?\"”’]$") &&
      size(split(trim(line), "\\s+")) >= 3 &&
      !lower(line).contains("javascript")

  /** Line-filtered text: surviving lines in original order, newline-joined. */
  def cleanText(text: Column): Column =
    array_join(filter(split(text, "\n"), lineKeep _), "\n")

  /** Terminal-punctuation sentence count over (kept) text. */
  def sentenceCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?]", ""))).cast("long")

  /** Full per-page report: line filtering + every page flag + keep. */
  def report(docs: DataFrame, idCol: String, textCol: String,
      badwords: Seq[String]): DataFrame = {
    require(badwords.nonEmpty, "empty bad-word list")
    val body = col(textCol)
    val kept = cleanText(body)
    docs.select(col(idCol),
        body.as("__body"), kept.as("kept_text"))
      .select(col(idCol), col("kept_text"),
        size(split(col("__body"), "\n")).cast("long").as("n_lines"),
        when(col("kept_text") === "", lit(0L))
          .otherwise(size(split(col("kept_text"), "\n")).cast("long")).as("n_lines_kept"),
        sentenceCount(col("kept_text")).as("n_sentences"),
        arrays_overlap(split(lower(col("__body")), "\\s+"),
          array(badwords.map(w => lit(w.toLowerCase)): _*)).as("has_badword"),
        lower(col("__body")).contains("lorem ipsum").as("has_lorem"),
        col("__body").contains("{").as("has_brace"))
      .withColumn("few_sentences", col("n_sentences") < 5)
      .withColumn("keep",
        !col("has_badword") && !col("has_lorem") && !col("has_brace") &&
          !col("few_sentences"))
  }
}
