package graft.queries

import graft.functions.TextAnalysis
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID, quality scoring,
  * token counting, fingerprinting — the curation half of a training-data
  * pipeline. Everything is a closed-form expression, so each query is one
  * parquet scan, no shuffle (except noted).
  */
object TextQueries {

  private val enStop = Seq("the", "a", "of", "and", "is")

  val defs: Seq[QueryDef] = Seq(

    // Language ID: marker-word argmax with fixed tie priority.
    QueryDef.sql(
      "t1_language_id",
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS ts FROM documents),
        |c AS (SELECT doc_id, lang,
        |  len(list_filter(ts, x -> x IN ('the','a','of','and','is'))) AS en,
        |  len(list_filter(ts, x -> x IN ('el','la','de','y','es'))) AS es,
        |  len(list_filter(ts, x -> x IN ('der','die','das','und','ist'))) AS de,
        |  len(list_filter(ts, x -> x IN ('le','la','de','et','est'))) AS fr
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN en + es + de + fr = 0 THEN 'und'
        |       WHEN fr > en AND fr > es AND fr > de THEN 'fr'
        |       WHEN de > en AND de > es THEN 'de'
        |       WHEN es > en THEN 'es'
        |       ELSE 'en' END AS predicted_lang,
        |  CAST(en AS INT) AS en_markers, CAST(es AS INT) AS es_markers,
        |  CAST(de AS INT) AS de_markers, CAST(fr AS INT) AS fr_markers
        |FROM c""".stripMargin) { (spark, dir) =>
      val toks = graft.functions.TextTokens.tokens(col("text"))
      val counts = TextAnalysis.markerCounts(toks)
      Tables.load(spark, dir, "documents").select(
        Seq(
          col("doc_id"),
          col("lang").as("labeled_lang"),
          TextAnalysis.languageId(col("text")).as("predicted_lang")) ++
          counts.map { case (lang, c) => c.as(s"${lang}_markers") }: _*)
    },

    // Quality scoring: length/punctuation/stopword heuristics + keep flag.
    QueryDef.sql(
      "t2_quality_score",
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS n_tokens,
        |  round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(string_split_regex(lower(trim(text)), '\s+')), 4) AS avg_token_len,
        |  round(CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ('the','a','of','and','is'))) AS DOUBLE) / len(string_split_regex(lower(trim(text)), '\s+')), 6) AS stopword_ratio,
        |  (len(string_split_regex(lower(trim(text)), '\s+')) BETWEEN 10 AND 100000)
        |    AND round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ('the','a','of','and','is'))) AS DOUBLE) / len(string_split_regex(lower(trim(text)), '\s+')), 6) >= 0.01 AS quality_ok
        |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "documents").select(
        col("doc_id") +:
          TextAnalysis.qualityColumns(col("text"), enStop).map { case (n, c) => c.as(n) }: _*)
    },

    // Token counting: whitespace + BPE-ish regex tokenizer.
    QueryDef.sql(
      "t3_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS regex_tokens
        |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("ws_tokens"),
        TextAnalysis.tokenCountRegex(col("text")).as("regex_tokens"))
    },

    // Fingerprinting: canonical md5, order-insensitive token-set md5, and a
    // rolling polynomial hash (mod 1e9+7 — overflow-free in both engines).
    QueryDef.sql(
      "t4_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_canon,
        |  md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS fp_token_set,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |        i -> CAST(ascii(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')[i+1]) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_rolling
        |FROM documents""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_canon"),
        TextAnalysis.fingerprintTokenSet(col("text")).as("fp_token_set"),
        TextAnalysis.rollingHash(col("text")).as("fp_rolling"))
    },

    // Deterministic stratified sampling (graft.functions.Sampling): fixed
    // per-source rates, keep-decision a pure function of (doc_id, seed) so
    // retries and re-runs select the identical subset. rows-only (xxhash64
    // family); rate/determinism pinned in SamplingChecksSpec.
    QueryDef.rowsOnly("t6_stratified_sample") { (spark, dir) =>
      graft.functions.Sampling.stratifiedSample(
        Tables.load(spark, dir, "documents"),
        col("source"),
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        seed = 7, col("doc_id"))
        .select("doc_id", "source")
    })
}
