package graft.queries

import graft.io.Tables
import graft.transforms.{Arrays, Audit, Casts, EnumMap, JsonCols, Text}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-expression operators (SURVEY §2.3, P1-P28). Each query builds the
  * operator from the transform library and is hash-verified against a DuckDB
  * oracle. All expressions are built-in Catalyst functions — no UDFs —
  * so every one of these stays inside whole-stage codegen.
  */
object ProjectionQueries {

  val defs: Seq[QueryDef] = Seq(

    // P1: rename/alias projection (src/core.py:138-144).
    QueryDef.sql(
      "p01_alias_projection",
      "SELECT n_nationkey AS id, n_name AS name, n_regionkey AS region_id FROM nation") { (spark, dir) =>
      Tables.load(spark, dir, "nation").select(
        col("n_nationkey").as("id"),
        col("n_name").as("name"),
        col("n_regionkey").as("region_id"))
    },

    // P2/P3/P4/P19: trim, case-normalize, whitespace collapse, NUL strip
    // (src/utils.py:444-576). Dirt is synthesized identically on both sides.
    QueryDef.sql(
      "p02_text_clean",
      """SELECT c_custkey AS id,
        |  trim(regexp_replace(regexp_replace('  ' || c_name || chr(9) || chr(10) || c_mktsegment || '  ', '\x00', '', 'g'), '\s+', ' ', 'g')) AS cleaned,
        |  lower(regexp_replace(c_mktsegment, '^[\t-\r\x{0085}\p{Z}]+|[\t-\r\x{0085}\p{Z}]+$', '', 'g')) AS seg_norm,
        |  upper(c_name) AS name_upper
        |FROM customer""".stripMargin) { (spark, dir) =>
      val dirty = concat(lit("  "), col("c_name"), lit("\t\n"), col("c_mktsegment"), lit("  "))
      Tables.load(spark, dir, "customer").select(
        col("c_custkey").as("id"),
        Text.handleText(dirty).as("cleaned"),
        Text.handleId(col("c_mktsegment")).as("seg_norm"),
        upper(col("c_name")).as("name_upper"))
    },

    // P5: literal replace, FIRST occurrence only (src/core.py:189 — Polars
    // str.replace). DuckDB regexp_replace without 'g' is first-only; the
    // Spark side is the instr/substring pin from Text.replaceFirst.
    // P6: strip suffix.
    QueryDef.sql(
      "p05_replace_first_strip_suffix",
      """SELECT o_orderkey AS id,
        |  regexp_replace(o_orderpriority, '-', ' - ') AS spaced,
        |  regexp_replace(o_orderpriority, 'URGENT$', '') AS nosuffix
        |FROM orders""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey").as("id"),
        Text.replaceFirst(col("o_orderpriority"), "-", " - ").as("spaced"),
        Text.stripSuffix(col("o_orderpriority"), "URGENT").as("nosuffix"))
    },

    // P7: concat with literals + null propagation (src/core.py:836-844 —
    // any null input nulls the whole concat; DuckDB's || matches, its
    // concat() would not).
    QueryDef.sql(
      "p07_concat_nullprop",
      """SELECT l_orderkey, l_linenumber,
        |  (CASE WHEN l_returnflag <> 'N' THEN l_returnflag END) || '-' || l_linestatus || ' [' || CAST(l_orderkey AS VARCHAR) || ']' AS label
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      val rf = when(col("l_returnflag") =!= "N", col("l_returnflag"))
      Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat(rf, lit("-"), col("l_linestatus"), lit(" ["),
          col("l_orderkey").cast(StringType), lit("]")).as("label"))
    },

    // P8/P21: casts — strict round-trip, null-on-error try_cast, the
    // negative-to-null UInt pin (SURVEY §7.2), year parse (src/utils.py:579-597).
    QueryDef.sql(
      "p08_casts",
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS roundtrip_int,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_int,
        |  CAST(NULL AS INT) AS neg_uint,
        |  CAST(trim(' ' || CAST(year(o_orderdate) AS VARCHAR) || ' ') AS INT) AS year_parsed,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl
        |FROM orders""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast(StringType).cast(IntegerType).as("roundtrip_int"),
        col("o_orderpriority").try_cast(IntegerType).as("bad_int"),
        Casts.tryToUInt(lit(-5)).as("neg_uint"),
        Casts.handleYear(concat(lit(" "), year(col("o_orderdate")).cast(StringType), lit(" "))).as("year_parsed"),
        col("o_orderkey").cast(DoubleType).as("key_dbl"))
    },

    // P9/P10: fill_null with literal / with column fallback chain
    // (src/utils.py:302,341-343).
    QueryDef.sql(
      "p09_fill_null_chain",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderstatus <> 'P' THEN o_orderstatus END, '?') AS status_filled,
        |  coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate END, o_orderdate, TIMESTAMP '2024-06-01 00:00:00') AS ts_filled
        |FROM orders""".stripMargin) { (spark, dir) =>
      val statusNull = when(col("o_orderstatus") =!= "P", col("o_orderstatus"))
      val lastMod = when(col("o_orderstatus") =!= "O", col("o_orderdate"))
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey"),
        coalesce(statusNull, lit("?")).as("status_filled"),
        coalesce(lastMod, col("o_orderdate"), lit("2024-06-01 00:00:00").cast(TimestampType)).as("ts_filled"))
    },

    // P11/P13: boolean flags via when/otherwise + is_in (src/core.py:261-265,1229).
    QueryDef.sql(
      "p11_bool_flags",
      """SELECT l_orderkey, l_linenumber,
        |  l_returnflag IN ('R','A') AS is_returned,
        |  CASE WHEN lower(l_linestatus) = 'o' THEN true ELSE false END AS is_open
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").isin("R", "A").as("is_returned"),
        when(lower(col("l_linestatus")) === "o", true).otherwise(false).as("is_open"))
    },

    // P12/P20: enum/dictionary mapping with default, normalized keys —
    // the reference's biggest UDF family, as a native map literal
    // (src/utils.py:468-522, dicts at src/core.py:203-240).
    QueryDef.sql(
      "p12_enum_mapping",
      """SELECT o_orderkey,
        |  CASE lower(trim(o_orderstatus)) WHEN 'o' THEN 'OPEN' WHEN 'f' THEN 'FULFILLED' WHEN 'p' THEN 'PENDING' ELSE 'UNKNOWN' END AS status_label,
        |  CASE lower(trim(o_orderpriority)) WHEN '1-urgent' THEN '1' WHEN '2-high' THEN '2' WHEN '3-medium' THEN '3' ELSE '0' END AS prio_code
        |FROM orders""".stripMargin) { (spark, dir) =>
      val statusMap = Map("o" -> "OPEN", "f" -> "FULFILLED", "p" -> "PENDING")
      val prioMap = Map("1-urgent" -> "1", "2-high" -> "2", "3-medium" -> "3")
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey"),
        EnumMap.handleEnumMapping(col("o_orderstatus"), statusMap, "UNKNOWN").as("status_label"),
        EnumMap.handleEnumMapping(col("o_orderpriority"), prioMap, "0").as("prio_code"))
    },

    // P14: literal columns including typed nulls (src/core.py:618-627).
    QueryDef.sql(
      "p14_typed_literals",
      "SELECT r_regionkey, CAST(NULL AS INT) AS x, 42 AS y, 'k' AS tag, r_name FROM region") { (spark, dir) =>
      Tables.load(spark, dir, "region").select(
        col("r_regionkey"),
        lit(null).cast(IntegerType).as("x"),
        lit(42).as("y"),
        lit("k").as("tag"),
        col("r_name"))
    },

    // P15/P16: struct → JSON envelope, "{}" when all fields null
    // (src/core.py:396-409) — to_json + when, replacing the reference's
    // per-row json.dumps lambda.
    QueryDef.sql(
      "p16_json_envelope",
      """SELECT o_orderkey AS id,
        |  CASE WHEN o_orderstatus <> 'F' THEN '{}'
        |       ELSE CAST(to_json(struct_pack(priority := o_orderpriority, okey := o_orderkey)) AS VARCHAR) END AS extra
        |FROM orders""".stripMargin) { (spark, dir) =>
      val flag = col("o_orderstatus") === "F"
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey").as("id"),
        JsonCols.jsonEnvelope(
          "priority" -> when(flag, col("o_orderpriority")),
          "okey" -> when(flag, col("o_orderkey"))).as("extra"))
    },

    // P17: timezone localize then drop tz (src/utils.py:300-306). Oracle uses
    // a fixed +02:00 offset so both engines agree exactly; the Europe/Rome
    // DST-ambiguity pin lives in AuditSpec.
    QueryDef.sql(
      "p17_tz_normalize",
      "SELECT event_id, ts - INTERVAL 2 HOUR AS ts_utc FROM events") { (spark, dir) =>
      Tables.load(spark, dir, "events").select(
        col("event_id"),
        to_utc_timestamp(col("ts"), "+02:00").as("ts_utc"))
    },

    // P18: the audit triple created_at/updated_at/disabled_at
    // (src/utils.py:276-441) with a deterministic load-time default.
    QueryDef.sql(
      "p18_audit_triple",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderkey % 10 <> 0 THEN o_orderdate END, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
        |  coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 1 DAY END,
        |           CASE WHEN o_orderkey % 10 <> 0 THEN o_orderdate END,
        |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 1 DAY END,
        |                     CASE WHEN o_orderkey % 10 <> 0 THEN o_orderdate END) END AS disabled_at
        |FROM orders""".stripMargin) { (spark, dir) =>
      val creation = when(col("o_orderkey") % 10 =!= 0, col("o_orderdate"))
      val lastMod = when(col("o_orderstatus") =!= "O", col("o_orderdate") + expr("INTERVAL 1 DAY"))
      val default = lit("2024-06-01 00:00:00").cast(TimestampType)
      Tables.load(spark, dir, "orders").select(
        col("o_orderkey") +:
          Audit.handleTimestamps(creation, lastMod, col("o_orderstatus"), "F", default): _*)
    },

    // P22: datetime normalization — truncation + date cast (src/utils.py:600-619).
    QueryDef.sql(
      "p22_datetime_trunc",
      """SELECT event_id, date_trunc('hour', ts) AS ts_hour, CAST(ts AS DATE) AS day FROM events""") { (spark, dir) =>
      Tables.load(spark, dir, "events").select(
        col("event_id"),
        date_trunc("hour", col("ts")).as("ts_hour"),
        col("ts").cast(DateType).as("day"))
    },

    // P23: per-element enum rewrite inside an array (src/core.py:1336-1351).
    // Output boundary flattens the array with a  delimiter (cannot occur
    // in the enum values, which are also non-null) so the harness can sort the
    // cell; the array transform itself is the operator under test.
    QueryDef.sql(
      "p23_array_transform",
      """SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_transform([l_returnflag, l_linestatus], x -> CASE x WHEN 'A' THEN 'ACCEPTED' WHEN 'R' THEN 'RETURNED' WHEN 'N' THEN 'NONE' WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FINISHED' END), chr(1)) AS mapped
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws("", Arrays.transformElements(
          array(col("l_returnflag"), col("l_linestatus")),
          x => when(x === "A", "ACCEPTED").when(x === "R", "RETURNED")
            .when(x === "N", "NONE").when(x === "O", "OPEN")
            .when(x === "F", "FINISHED"))).as("mapped"))
    },

    // P24/P25/P26: array char cleanup, null→empty, PG text[] literal
    // (src/core.py:1365-1451; also fixes the auac.py:256 regex-dot bug).
    QueryDef.sql(
      "p24_array_clean_pg_literal",
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(p_type || ' v1.0', ' '), x -> regexp_replace(regexp_replace(x, ' ', '_', 'g'), '\.', '_', 'g')), chr(1)) AS cleaned,
        |  coalesce(array_to_string(coalesce(CASE WHEN p_size >= 10 THEN string_split(p_type, ' ') END, []), chr(1)), '') AS arr_filled,
        |  '{' || coalesce(array_to_string(list_transform(coalesce(CASE WHEN p_size >= 10 THEN string_split(p_type, ' ') END, []), x -> '"' || x || '"'), ','), '') || '}' AS pg_literal
        |FROM part""".stripMargin) { (spark, dir) =>
      // Array outputs flattened with  at the boundary (elements are
      // non-null p_type tokens, delimiter-free) — harness can't sort array
      // cells; the Arrays.* operators remain the thing under test.
      val toks = split(col("p_type"), " ")
      val maybeArr = when(col("p_size") >= 10, toks)
      Tables.load(spark, dir, "part").select(
        col("p_partkey"),
        concat_ws("",
          Arrays.elementCleanup(split(concat(col("p_type"), lit(" v1.0")), " "))).as("cleaned"),
        concat_ws("", Arrays.nullToEmpty(maybeArr)).as("arr_filled"),
        Arrays.toPgTextArrayLiteral(Arrays.nullToEmpty(maybeArr)).as("pg_literal"))
    },

    // P28: conditional null-out by provenance (src/core.py:1500,1881).
    QueryDef.sql(
      "p28_conditional_nullout",
      """SELECT c_custkey, CASE WHEN c_mktsegment = 'MACHINERY' THEN NULL ELSE c_nationkey END AS nation_fk
        |FROM customer""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "customer").select(
        col("c_custkey"),
        when(col("c_mktsegment") === "MACHINERY", lit(null))
          .otherwise(col("c_nationkey")).as("nation_fk"))
    },

    // P30: array set algebra — intersect/except/sort over per-doc distinct
    // token sets vs a literal vocabulary. Both engines' intersect leaves
    // element ORDER unspecified, so every emitted array goes through an
    // explicit sort (ASCII corpus → identical binary collation), then is
    // SERIALIZED to a comma-joined string: the correctness harness
    // canonicalizes frames through pandas, which cannot hash array cells
    // (same boundary as the p24 gate). Elements come from the 5-word
    // stopword vocabulary, so ',' is delimiter-safe. Empty intersect is ''
    // on both sides (DuckDB array_to_string([]) is NULL → coalesce; Spark
    // concat_ws never returns NULL). All codegen'd array
    // expressions, no explode: the row count never changes, so there is
    // no shuffle at all.
    QueryDef.sql(
      "p30_array_set_ops",
      """WITH t AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS ts
        |  FROM documents)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_intersect(ts, ['the','a','of','and','is'])), ','), '') AS stop_hits,
        |  CAST(len(ts) AS INT) AS n_unique,
        |  CAST(len(list_filter(ts, x -> NOT x IN ('the','a','of','and','is'))) AS INT) AS n_nonstop
        |FROM t""".stripMargin) { (spark, dir) =>
      val stops = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(filter(graft.functions.TextTokens.tokens(col("text")),
            t => t =!= "")).as("ts"))
        .select(col("doc_id"),
          concat_ws(",", array_sort(array_intersect(col("ts"), stops))).as("stop_hits"),
          size(col("ts")).as("n_unique"),
          size(array_except(col("ts"), stops)).as("n_nonstop"))
    })
}
