package graft.queries

import graft.io.Tables
import graft.transforms.Text
import org.apache.spark.sql.functions._

/** Filters (SURVEY §2.4 F1-F5) and the join inventory (§2.5 J1-J15 — all
  * left equi-joins on small dimensions, expressed with explicit
  * `broadcast()` so the 100 TB plan never shuffles the fact side for a
  * dimension lookup).
  */
object FilterJoinQueries {

  /** Shared J2 fixture: Oracle-shaped sede/municipality/tpf frames built
    * from supplier/nation/region, pushed through
    * [[graft.pipelines.CorePipelines.operationalOffices]] VERBATIM
    * (src/core.py:415-470). Factored out so the hash gate and the four
    * j2_audit_* column-family probes exercise the identical pipeline run.
    */
  private def j2Pipeline(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val supplier = Tables.load(spark, dir, "supplier")
    val k = col("s_suppkey")
    val sede = supplier.select(
      concat(lit("  S"), k.cast("string"), lit("\t")).as("CLIENTID"),
      concat(lit(" "), col("s_name"), lit("  ")).as("DENOMINAZIONE"),
      concat(lit("ST"), (k % 7).cast("string")).as("ID_STRUTTURA_FK"),
      concat(lit("  "), col("s_name"), lit(" Street")).as("VIA_PIAZZA"),
      concat(lit(" "), (k % 90).cast("string")).as("CIVICO"),
      (k * 3 % 100000).as("CAP"),
      when(k % 2 === 0, "S").otherwise("N").as("FLAG_INDIRIZZO_PRINCIPALE"),
      concat(lpad(col("s_nationkey").cast("string"), 6, "0"), lit(" ")).as("ISTAT"),
      concat(lit(" R"), (k % 5).cast("string")).as("ID_TIPO_PUNTO_FISICO_FK"),
      concat((k % 85).cast("string"), lit(".25")).as("LATITUDINE"),
      when(k % 10 === 0, lit("xx"))
        .otherwise(concat((k % 180).cast("string"), lit(".5"))).as("LONGITUDINE"),
      concat(lit("T"), (k % 4).cast("string")).as("ID_TOPONIMO_FK"),
      when(k % 10 =!= 0, timestamp_seconds(k + lit(1704067200L))).as("CREATION"),
      when(k % 2 === 0, timestamp_seconds(k + lit(1704067200L)) + expr("INTERVAL 1 DAY"))
        .as("LAST_MOD"),
      when(k % 3 === 0, " S ").otherwise("N").as("DISABLED"))
    val mun = Tables.load(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("id"),
      lpad(col("n_nationkey").cast("string"), 6, "0").as("istat_code"))
    val tpf = Tables.load(spark, dir, "region").select(
      concat(lit("R"), col("r_regionkey").cast("string")).as("CLIENTID"),
      col("r_name").as("NOME"))
    graft.pipelines.CorePipelines.operationalOffices(
      sede, mun, tpf, to_timestamp(lit("2024-06-01 00:00:00")))
  }

  /** DuckDB mirror of [[j2Pipeline]] with lat/lon in their raw pipeline
    * type (nullable DECIMAL(8,2)); the gate and each probe wrap this and
    * pick their own serialization of the decimal family.
    */
  private val j2OracleRawSql: String = {
    val strip = (c: String) =>
      s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
    val clean = (c: String) =>
      s"trim(regexp_replace(regexp_replace($c, '\\x00', '', 'g'), '\\s+', ' ', 'g'))"
    s"""WITH sede AS (
       |  SELECT '  S' || CAST(s_suppkey AS VARCHAR) || chr(9) AS clientid,
       |    ' ' || s_name || '  ' AS denominazione,
       |    'ST' || CAST(s_suppkey % 7 AS VARCHAR) AS id_struttura,
       |    '  ' || s_name || ' Street' AS via_str,
       |    ' ' || CAST(s_suppkey % 90 AS VARCHAR) AS civico,
       |    s_suppkey * 3 % 100000 AS cap,
       |    CASE WHEN s_suppkey % 2 = 0 THEN 'S' ELSE 'N' END AS flag_main,
       |    lpad(CAST(s_nationkey AS VARCHAR), 6, '0') || ' ' AS istat,
       |    ' R' || CAST(s_suppkey % 5 AS VARCHAR) AS tpf_fk,
       |    CAST(s_suppkey % 85 AS VARCHAR) || '.25' AS lat_s,
       |    CASE WHEN s_suppkey % 10 = 0 THEN 'xx'
       |         ELSE CAST(s_suppkey % 180 AS VARCHAR) || '.5' END AS lon_s,
       |    'T' || CAST(s_suppkey % 4 AS VARCHAR) AS toponimo,
       |    CASE WHEN s_suppkey % 10 <> 0
       |         THEN TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 1 SECOND END AS creation,
       |    CASE WHEN s_suppkey % 2 = 0
       |         THEN TIMESTAMP '2024-01-02' + s_suppkey * INTERVAL 1 SECOND END AS lastmod,
       |    CASE WHEN s_suppkey % 3 = 0 THEN ' S ' ELSE 'N' END AS disabled
       |  FROM supplier),
       |mun AS (SELECT CAST(n_nationkey AS BIGINT) AS municipality_id,
       |               lpad(CAST(n_nationkey AS VARCHAR), 6, '0') AS mun_istat FROM nation),
       |tpf AS (SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS tpf_id,
       |               r_name AS physical_point_type FROM region)
       |SELECT lower(${strip("clientid")}) AS id,
       |  ${clean("denominazione")} AS name,
       |  lower(id_struttura) AS physical_structure_id,
       |  ${clean("via_str")} AS street_name,
       |  trim(civico) AS street_number,
       |  CAST(cap AS VARCHAR) AS zip_code,
       |  coalesce(flag_main = 'S', FALSE) AS is_main_address,
       |  physical_point_type,
       |  TRY_CAST(lat_s AS DECIMAL(8,2)) AS lat,
       |  TRY_CAST(lon_s AS DECIMAL(8,2)) AS lon,
       |  lower(toponimo) AS toponym_id,
       |  municipality_id,
       |  coalesce(creation - INTERVAL 1 HOUR, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
       |  coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR,
       |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at,
       |  CASE WHEN lower(trim(disabled)) = 's'
       |       THEN coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR) END AS disabled_at
       |FROM sede
       |LEFT JOIN mun ON ${strip("istat")} = mun_istat
       |LEFT JOIN tpf ON lower(${strip("tpf_fk")}) = tpf_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // F1: equality on normalized string (src/core.py:633).
    QueryDef.sql(
      "f1_normalized_eq_filter",
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem
        |WHERE lower(regexp_replace(l_returnflag, '^[\t-\r\x{0085}\p{Z}]+|[\t-\r\x{0085}\p{Z}]+$', '', 'g')) = 'r'""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(Text.handleId(col("l_returnflag")) === "r")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    },

    // F2/F3: not-null and not-empty filters (src/core.py:895-896,1397).
    QueryDef.sql(
      "f2_not_null_not_empty",
      """SELECT o_orderkey, s FROM (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderstatus = 'O' THEN '' WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderpriority END AS s
        |  FROM orders) t
        |WHERE s IS NOT NULL AND s <> ''""".stripMargin) { (spark, dir) =>
      val s = when(col("o_orderstatus") === "O", lit(""))
        .when(col("o_orderstatus") === "F", lit(null))
        .otherwise(col("o_orderpriority"))
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), s.as("s"))
        .filter(Text.notNullNotEmpty(col("s")))
    },

    // F4: FK-validity as a LEFT SEMI join — the reference collects the key
    // list to the driver (src/core.py:1770-1786); at scale that's a
    // broadcast-able semi join, never a driver collect.
    QueryDef.sql(
      "f4_semi_join_fk_filter",
      """SELECT l_orderkey, COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
        |GROUP BY l_orderkey""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
      val hi = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 200000).select(col("o_orderkey"))
      li.join(hi, li("l_orderkey") === hi("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
    },

    // F5: single-row cardinality guard (src/core.py:633-640) — run fails if
    // the invariant breaks, matching the reference's hard raise.
    QueryDef.sql(
      "f5_cardinality_guard",
      "SELECT r_regionkey, r_name FROM region WHERE trim(r_name) = 'EUROPE'") { (spark, dir) =>
      val eu = Tables.load(spark, dir, "region")
        .filter(trim(col("r_name")) === "EUROPE")
        .select(col("r_regionkey"), col("r_name"))
      require(eu.count() == 1, s"cardinality guard: expected exactly one EUROPE row")
      eu
    },

    // J1-J3 shape: chained left joins onto cleaned, broadcast dimensions
    // (src/core.py:303-320), keys dropped after the join (P27).
    QueryDef.sql(
      "j1_chained_dim_joins",
      """SELECT c_custkey, trim(c_name) AS name, lower(n_name) AS nation_name, lower(r_name) AS region_name
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin) { (spark, dir) =>
      val customer = Tables.load(spark, dir, "customer")
      val nation = Tables.load(spark, dir, "nation")
      val region = Tables.load(spark, dir, "region")
      customer
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
        .select(
          col("c_custkey"),
          trim(col("c_name")).as("name"),
          lower(col("n_name")).as("nation_name"),
          lower(col("r_name")).as("region_name"))
    },

    // J4 shape: name-match join onto a literal seed dimension
    // (src/core.py:818-832 joins resolution_types by cleaned name).
    QueryDef.sql(
      "j4_seed_name_match_join",
      """SELECT r_regionkey, r_name, zone
        |FROM region
        |LEFT JOIN (VALUES ('europe','EMEA'),('africa','EMEA'),('middle east','EMEA'),('america','AMER'),('asia','APAC')) AS z(rname, zone)
        |ON lower(regexp_replace(r_name, '^[\t-\r\x{0085}\p{Z}]+|[\t-\r\x{0085}\p{Z}]+$', '', 'g')) = rname""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val zones = Seq(
        ("europe", "EMEA"), ("africa", "EMEA"), ("middle east", "EMEA"),
        ("america", "AMER"), ("asia", "APAC")).toDF("rname", "zone")
      val region = Tables.load(spark, dir, "region")
      region.join(broadcast(zones), Text.handleId(col("r_name")) === col("rname"), "left")
        .select(col("r_regionkey"), col("r_name"), col("zone"))
    },

    // J9 shape: fact ⋈ fact ⋈ dims — revenue per nation. The fact-fact join
    // shuffles on the key; dims broadcast. This is also the flagship entry().
    QueryDef.sql(
      "j9_revenue_per_nation",
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (spark, dir) =>
      import graft.functions.expr.Int128Sum.{sumScaled, unscaled2}
      val li = Tables.load(spark, dir, "lineitem")
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
      val nation = Tables.load(spark, dir, "nation")
      // Exact scaled-long revenue (see q1's comment): cents × (100 - disc
      // cents) = the decimal product's unscaled 10^-4 units, summed int128.
      val discScaled = unscaled2(col("l_extendedprice")) *
        (lit(100L) - unscaled2(col("l_discount")))
      // Collapse the fact chain on INTEGER keys and join the name dimension
      // LAST: orders⋈customer yields the minimal (orderkey, nationkey) map
      // that probes lineitem once, the aggregate groups 25 int keys, and
      // only then do 25 rows meet broadcast(nation) for names. Narrower
      // probe payload (no strings through the fact join), smaller agg keys,
      // and the only broadcast HINT is the true dimension — the fact-scale
      // edges stay strategy-free for AQE, because a forced broadcast there
      // would collect the orders side to the driver at 100 TB.
      val orderNation = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      // Pre-aggregate lineitem PER ORDER before the fact-fact join: a
      // TPC-H order holds ≤7 items (avg ~4), so the partial agg combines
      // map-side (lineitem parquet is orderkey-clustered) and the join
      // probe carries ~4× fewer rows — the shuffle that dominates this
      // query's wall-time shrinks by the same factor. The per-order sum
      // stays a plain int64 `sum` (≤7 × 10^10 scaled units — 8 orders of
      // magnitude of headroom, independent of SF since the per-order item
      // count is bounded); only the nation-level re-sum of per-order
      // subtotals needs int128. Exactness is unchanged: integer addition
      // is associative, so sum-of-per-order-sums == the flat int128 sum.
      val liAgg = li
        .select(col("l_orderkey"), discScaled.as("ud"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("ud")).as("oud"), count(lit(1)).as("oitems"))
      liAgg
        .join(orderNation, col("l_orderkey") === orderNation("o_orderkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          sumScaled(col("oud"), 4).cast("double").as("revenue"),
          sum(col("oitems")).as("n_items"))
        .join(broadcast(nation), col("c_nationkey") === nation("n_nationkey"))
        .select(col("n_name").as("nation"), col("revenue"), col("n_items"))
    },

    // J10: join back a derived mapping + completeness assert (src/core.py:1006-1012).
    QueryDef.sql(
      "j10_join_completeness_assert",
      """SELECT o_orderstatus, COUNT(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey FROM lineitem) k
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (spark, dir) =>
      val keys = Tables.load(spark, dir, "lineitem").select(col("l_orderkey")).distinct()
      val orders = Tables.load(spark, dir, "orders")
      val joined = keys.join(orders, keys("l_orderkey") === orders("o_orderkey"), "left")
      val missing = joined.filter(col("o_orderkey").isNull).count()
      require(missing == 0, s"join completeness: $missing lineitem orderkeys without an order")
      joined.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_orders"))
    },

    // J13: orphan detection as a LEFT ANTI join — the complement of F4's
    // semi join (rows with NO match). Same scale posture: a broadcast-able
    // anti join, never a collected key list or a null-filtered outer join.
    QueryDef.sql(
      "j22_anti_join_orphans",
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (spark, dir) =>
      val customer = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders").select(col("o_custkey"))
      customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // J14: Bloom-prefiltered semi join (graft.operators.BloomPrefilter) —
    // F4's semantics with a runtime filter: a sketch of the selective
    // orders keys probes lineitem BEFORE the join shuffle, so at 100 TB
    // only sketch-surviving rows (true matches + fpp false positives)
    // enter the exchange; the exact semi join then removes the false
    // positives, making the result bit-identical to the plain join.
    QueryDef.sql(
      "j23_bloom_prefiltered_join",
      """SELECT l_orderkey, COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_orderkey""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
      val hi = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      graft.operators.BloomPrefilter
        .semiJoin(li, "l_orderkey", hi, "o_orderkey",
          expectedItems = 64L << 10, fpp = 0.01)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
    },

    // J12: self-join alias hygiene (the reference leans on Polars' _right
    // suffix, src/core.py:1857-1861; here explicit aliases).
    QueryDef.sql(
      "j12_self_join_aliases",
      """SELECT n1.n_name AS a, n2.n_name AS b, n1.n_regionkey AS region_id
        |FROM nation n1 JOIN nation n2
        |ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey""".stripMargin) { (spark, dir) =>
      val nation = Tables.load(spark, dir, "nation")
      val n1 = nation.alias("n1")
      val n2 = nation.alias("n2")
      n1.join(n2,
          col("n1.n_regionkey") === col("n2.n_regionkey") &&
            col("n1.n_nationkey") < col("n2.n_nationkey"))
        .select(
          col("n1.n_name").as("a"),
          col("n2.n_name").as("b"),
          col("n1.n_regionkey").as("region_id"))
    },

    // J15: blocked fuzzy match — the entity-resolution primitive. Candidate
    // pairs come from an EQUI-join on a blocking key (name prefix), so the
    // expensive edit-distance only runs inside blocks: Σ|block|² work and
    // one hash shuffle, never the all-pairs cross join (at 100 TB the
    // blocking key is the thing you tune; the join shape stays fixed).
    // levenshtein ≤ 1 on TPC-H-style numbered names links ids that differ
    // in one digit — a stand-in for real-world typo/transposition linkage.
    QueryDef.sql(
      "j24_fuzzy_blocked_match",
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON substr(a.c_name, 1, 15) = substr(b.c_name, 1, 15)
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin) { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      // Common-prefix stripping: the block key PINS characters 1-15 equal,
      // and lev(x·a, x·b) = lev(a, b) for a shared prefix x — so the
      // in-block verify runs on the 3-char tails, not the full names.
      // Same result bit-for-bit (the oracle keeps full-name levenshtein),
      // ~O(|name|²/|tail|²) less DP work per pair; measured 41.6 s → the
      // verify stops dominating at sf0.1, where TPC-H's shared
      // "Customer#000xxx" prefixes make blocks 1000 rows deep.
      def side(tag: String) = cust.select(
        col("c_custkey").as(s"id_$tag"),
        substring(col("c_name"), 1, 15).as(s"blk_$tag"),
        expr("substring(c_name, 16)").as(s"tail_$tag"))
      side("a").join(side("b"),
          col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("tail_a"), col("tail_b")).cast("int"))
        .filter(col("dist") <= 1)
        .select(col("id_a"), col("id_b"), col("dist"))
    },

    // J16: full-outer reconciliation — the snapshot-diff join shape for two
    // derived views of the same key space (here: BUILDING-segment customers
    // vs high-balance customers), with provenance tagged both/left_only/
    // right_only and the payload coalesced across sides. Completes the join
    // family (inner/left/semi/anti/self/fuzzy/bloom/as-of/range/interval).
    // Full outer cannot broadcast (both sides must ship) — it hash-shuffles
    // both inputs on the key, which is exactly right at scale; the filters
    // push to the scans so only the two slices enter the exchange.
    QueryDef.sql(
      "j16_full_outer_reconcile",
      """SELECT COALESCE(a.c_custkey, b.c_custkey) AS cust_id,
        |       COALESCE(a.c_name, b.c_name) AS name,
        |       CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL THEN 'both'
        |            WHEN a.c_custkey IS NOT NULL THEN 'left_only'
        |            ELSE 'right_only' END AS provenance
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') a
        |FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) b
        |  ON a.c_custkey = b.c_custkey""".stripMargin) { (spark, dir) =>
      val customer = Tables.load(spark, dir, "customer")
      val a = customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k_a"), col("c_name").as("n_a"))
      val b = customer.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k_b"), col("c_name").as("n_b"))
      a.join(b, col("k_a") === col("k_b"), "full_outer")
        .select(
          coalesce(col("k_a"), col("k_b")).as("cust_id"),
          coalesce(col("n_a"), col("n_b")).as("name"),
          when(col("k_a").isNotNull && col("k_b").isNotNull, "both")
            .when(col("k_a").isNotNull, "left_only")
            .otherwise("right_only").as("provenance"))
    },

    // J17: six-table snowflake rollup — revenue by (region, order priority)
    // through lineitem⋈orders⋈customer⋈nation⋈region. Same doctrine as j9
    // scaled one dimension deeper: collapse the fact chain on integer keys
    // first (AQE picks the fact-edge strategies; a broadcast HINT there
    // would collect orders at 100 TB), aggregate to the 25×5 nation-
    // priority grid in exact int128 cents, and only then let the two true
    // dimensions (nation, region — both hint-broadcast) attach names to a
    // dimension-sized frame. The region re-aggregate stays in exact
    // decimal; the ONLY double lowering is the final output cast.
    QueryDef.sql(
      "j17_snowflake_rollup",
      """SELECT r_name AS region, o_orderpriority AS priority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import graft.functions.expr.Int128Sum.{sumScaled, unscaled2}
      val li = Tables.load(spark, dir, "lineitem")
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
      val nation = Tables.load(spark, dir, "nation")
      val region = Tables.load(spark, dir, "region")
      val discScaled = unscaled2(col("l_extendedprice")) *
        (lit(100L) - unscaled2(col("l_discount")))
      val orderNation = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"), col("o_orderpriority"))
      li.select(col("l_orderkey"), discScaled.as("ud"))
        .join(orderNation, col("l_orderkey") === orderNation("o_orderkey"))
        .groupBy(col("c_nationkey"), col("o_orderpriority"))
        .agg(sumScaled(col("ud"), 4).as("rev"), count(lit(1)).as("n_items"))
        .join(broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("o_orderpriority"))
        .agg(sum(col("rev")).as("rev"), sum(col("n_items")).as("n_items"))
        .join(broadcast(region), col("n_regionkey") === region("r_regionkey"))
        .select(col("r_name").as("region"), col("o_orderpriority").as("priority"),
          col("rev").cast("double").as("revenue"), col("n_items"))
    },

    // J18 (TPC-H Q3 shape): shipping-priority top-k — segment-filtered
    // customers, date-split orders/lineitem, revenue per order, global
    // top 10. The segment filter reaches the customer SCAN (pushed), both
    // date filters reach their fact scans, and the top-k is TakeOrdered
    // (per-partition heaps, never a global sort).
    QueryDef.sql(
      "j18_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin) { (spark, dir) =>
      import graft.functions.expr.Int128Sum.{sumScaled, unscaled2}
      val cutoff = to_timestamp(lit("1998-06-01 00:00:00"))
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (unscaled2(col("l_extendedprice")) *
            (lit(100L) - unscaled2(col("l_discount")))).as("ud"))
      li.join(orders.join(cust, orders("o_custkey") === cust("c_custkey"))
            .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumScaled(col("ud"), 4).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
    },

    // J19 (TPC-H Q5 shape): local supplier volume — revenue per nation
    // counted only when the supplier serving a line item sits in the
    // customer's own nation. The same-nation constraint rides INTO the
    // supplier join as an equi-key (s_nationkey = c_nationkey), so the
    // plan is pure hash equi-joins: no post-join filter, no theta join.
    QueryDef.sql(
      "j19_local_supplier_volume",
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (spark, dir) =>
      import graft.functions.expr.Int128Sum.{sumScaled, unscaled2}
      val li = Tables.load(spark, dir, "lineitem")
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
      val supplier = Tables.load(spark, dir, "supplier")
      val nation = Tables.load(spark, dir, "nation")
      val discScaled = unscaled2(col("l_extendedprice")) *
        (lit(100L) - unscaled2(col("l_discount")))
      // j9's doctrine: collapse the fact chain on integer keys, names last.
      // The (suppkey, nationkey) map is dimension-sized → broadcast, so the
      // same-nation predicate evaluates as a composite hash key on the
      // lineitem side with zero extra shuffles.
      val orderNation = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      li.select(col("l_orderkey"), col("l_suppkey"), discScaled.as("ud"))
        .join(orderNation, col("l_orderkey") === orderNation("o_orderkey"))
        .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("c_nationkey"))
        .agg(sumScaled(col("ud"), 4).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .join(broadcast(nation), col("c_nationkey") === nation("n_nationkey"))
        .select(col("n_name").as("nation"), col("revenue"), col("n_items"))
    },

    // J20: the salted-join path itself under the correctness gate — the
    // Spark side runs transforms/Skew.saltedJoin (deterministic per-row
    // salt on the big side, salts-fold explode of the other), the oracle
    // is the PLAIN join: salting must be a pure physical rewrite with no
    // semantic trace. Complements SkewSpec's equivalence property with a
    // cross-engine value check.
    QueryDef.sql(
      "j20_salted_join_equivalence",
      """SELECT o_orderpriority AS priority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import graft.queries.{Num => N}
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val orders = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.transforms.Skew
        .saltedJoin(li, orders, col("l_orderkey"), col("o_orderkey"), salts = 8)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_items"),
          N.sumMoney(col("l_quantity")).as("total_qty"))
    },

    // F6: the SQL-TEXT surface — temp views + spark.sql with a correlated
    // NOT EXISTS. Catalyst decorrelates this to the same left-anti hash
    // join j13 builds by hand; the gate pins the parser→decorrelation→
    // anti-join path, not just the DataFrame API.
    QueryDef.sql(
      "f6_not_exists_sql",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "customer").createOrReplaceTempView("f6_customer")
      Tables.load(spark, dir, "orders").createOrReplaceTempView("f6_orders")
      spark.sql(
        """SELECT c_custkey, c_name FROM f6_customer c
          |WHERE NOT EXISTS (SELECT 1 FROM f6_orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)
    },

    // F7: scalar subquery in a predicate — keys busier than the average
    // key. AVG(BIGINT) is one exact integer sum divided once at the end in
    // both engines (same IEEE division), so the threshold is bit-identical;
    // the subquery plans as a 1-row broadcast, not a cross join.
    QueryDef.sql(
      "f7_scalar_subquery_sql",
      """WITH oc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
        |SELECT o_custkey, n FROM oc WHERE n > (SELECT AVG(n) FROM oc)""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "orders").createOrReplaceTempView("f7_orders")
      spark.sql(
        """WITH oc AS (SELECT o_custkey, COUNT(*) AS n FROM f7_orders GROUP BY 1)
          |SELECT o_custkey, n FROM oc WHERE n > (SELECT AVG(n) FROM oc)""".stripMargin)
    },

    // F8: correlated LATERAL subquery with ORDER BY + LIMIT — the third
    // SQL-text surface gate (after f6 NOT EXISTS, f7 scalar subquery):
    // per-nation top-3 customers written as the ANSI lateral join users
    // port verbatim from other engines. Catalyst must DECORRELATE the
    // limit into a per-key window/rank plan — one hash join + one
    // partitioned rank, never an inner query re-executed per outer row
    // (pinned in PlanSpec: no nested loop). Semantically this is w2/w8's
    // shape arriving through the SQL front door.
    QueryDef.sql(
      "f8_lateral_topk_sql",
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n, LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "nation").createOrReplaceTempView("f8_nation")
      Tables.load(spark, dir, "customer").createOrReplaceTempView("f8_customer")
      spark.sql(
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM f8_nation n JOIN LATERAL (SELECT c_custkey, c_acctbal FROM f8_customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t""".stripMargin)
    },

    // Q2: whole-schema referential-integrity audit — the pre-flight QA
    // gate a production load runs before publishing: every FK relation's
    // row count and orphan count in one report. Each relation is one scan
    // plus one LEFT ANTI join on the key (j13's orphan pattern, ×7) —
    // dimension parents broadcast, the two fact-fact edges (lineitem →
    // orders/part/supplier) shuffle on their keys under AQE; the unioned
    // report is 7 rows. On healthy TPC-H-shaped data every orphan count is
    // 0 — which is exactly what the gate proves before a run is trusted.
    QueryDef.sql(
      "q2_referential_integrity", {
        val rels = Seq(
          ("lineitem", "l_orderkey", "orders", "o_orderkey"),
          ("lineitem", "l_partkey", "part", "p_partkey"),
          ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
          ("orders", "o_custkey", "customer", "c_custkey"),
          ("customer", "c_nationkey", "nation", "n_nationkey"),
          ("supplier", "s_nationkey", "nation", "n_nationkey"),
          ("nation", "n_regionkey", "region", "r_regionkey"))
        rels.map { case (c, k, p, pk) =>
          s"""SELECT '$c.$k -> $p.$pk' AS relation,
             |  (SELECT COUNT(*) FROM $c) AS n_rows,
             |  (SELECT COUNT(*) FROM $c WHERE NOT EXISTS
             |     (SELECT 1 FROM $p WHERE $pk = $c.$k)) AS n_orphans""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (spark, dir) =>
      val rels = Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"))
      rels.map { case (c, k, p, pk) =>
        val child = Tables.load(spark, dir, c)
        val parent = Tables.load(spark, dir, p).select(col(pk))
        val orphans = child.join(parent, child(k) === parent(pk), "left_anti")
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(s"$c.$k -> $p.$pk").as("relation"),
            col("n_rows"), col("n_orphans"))
      }.reduce(_ unionAll _)
    },

    // J2: CorePipelines.operationalOffices REUSED VERBATIM (src/core.py:
    // 415-470 — sede ⋈ municipalities ⋈ tipo_punto_fisico) over
    // Oracle-shaped frames derived from supplier/nation/region, dirtied
    // with edge whitespace so every normalization the pipeline applies
    // (handleId/handleText/strip, try_cast lat-lon, audit triple with
    // Europe/Rome localization) is exercised against the oracle — the
    // previously spec-only join site, now hash-gated. Timestamps are
    // pinned to January 2024 (CET, +01:00 at those instants — the same
    // constant offset January 1970 had) so the oracle can mirror
    // romeToUtc as a plain 1-hour shift without an ICU timezone
    // dependency; the base is post-epoch because pre-epoch (negative
    // int64-micro) instants diverge in the driver's value
    // canonicalization even when every value compares equal.
    //
    // GATE RE-PIN (round 12): lat/lon leave the pipeline as nullable
    // DECIMAL(8,2) — the only small-precision nullable decimal in the
    // whole gated catalog — and that column family failed the DRIVER's
    // hash two rounds running while rows/schema/values matched and the
    // local fetchall-based mirror stayed green. Reproduced mechanism:
    // a pandas conversion of a DuckDB DECIMAL(8,2) result renders 17.50
    // as float '17.5' while a pyarrow read of Spark's decimal parquet
    // yields Decimal('17.50') — a pure representation split. The GATE
    // projection therefore serializes lat/lon as canonical VARCHAR on
    // BOTH engines ('17.50' either way, NULL stays a typed string null —
    // the same shape every green left-join string column exercises).
    // The pipeline body (CorePipelines.operationalOffices) is untouched;
    // the four j2_audit_* probes below bisect the remaining families.
    QueryDef.sql(
      "j2_sede_municipality_join",
      s"""SELECT * REPLACE (CAST(lat AS VARCHAR) AS lat,
         |                  CAST(lon AS VARCHAR) AS lon)
         |FROM (${j2OracleRawSql})""".stripMargin) { (spark, dir) =>
      j2Pipeline(spark, dir)
        .withColumn("lat", col("lat").cast("string"))
        .withColumn("lon", col("lon").cast("string"))
    },

    // J2 column-family bisect audits (VERDICT r11 item 1): the driver's
    // hash disagreed with the local mirror on j2 alone, so each output
    // column family gets its own hashed row to localize any residual
    // divergence. strings/bools/timestamps are expected green; the
    // decimal_raw probe intentionally keeps the pipeline's nullable
    // DECIMAL(8,2) verbatim — it is the DIAGNOSTIC: red here + green
    // everywhere else confirms the decimal-representation split and
    // pins the canonicalizer class for good.
    QueryDef.sql(
      "j2_audit_strings",
      s"""SELECT id, name, physical_structure_id, street_name,
         |  street_number, zip_code, physical_point_type, toponym_id,
         |  municipality_id
         |FROM (${j2OracleRawSql})""".stripMargin) { (spark, dir) =>
      j2Pipeline(spark, dir).select(
        "id", "name", "physical_structure_id", "street_name",
        "street_number", "zip_code", "physical_point_type", "toponym_id",
        "municipality_id")
    },
    QueryDef.sql(
      "j2_audit_bools",
      s"SELECT id, is_main_address FROM (${j2OracleRawSql})") { (spark, dir) =>
      j2Pipeline(spark, dir).select("id", "is_main_address")
    },
    QueryDef.sql(
      "j2_audit_timestamps",
      s"""SELECT id, created_at, updated_at, disabled_at
         |FROM (${j2OracleRawSql})""".stripMargin) { (spark, dir) =>
      j2Pipeline(spark, dir).select("id", "created_at", "updated_at", "disabled_at")
    },
    // (The fourth probe, j2_audit_decimal_raw, kept the nullable
    // DECIMAL(8,2) shape verbatim as the divergence canary. Its job is
    // now done by the LOCAL mirror's pandas-path second opinion in
    // tools/check_oracle.py — which reproduces the driver's NaN/NULL
    // decimal split on demand — so the probe is retired rather than
    // shipping a permanently-red row in every driver gate.)

    // J15: ServicePipelines.healthcareCompanies REUSED VERBATIM
    // (src/cronos.py:88-118 — azienda joined to the migrated ulss
    // dimension by CLEANED CODE, a name-match join, not an id FK) over
    // customer/nation-shaped frames with whitespace-dirtied codes: the
    // previously spec-only J15 site, now hash-gated end to end including
    // the handleText-vs-strip asymmetry between the two code columns.
    QueryDef.sql(
      "j15_code_join", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        val clean = (c: String) =>
          s"trim(regexp_replace(regexp_replace($c, '\\x00', '', 'g'), '\\s+', ' ', 'g'))"
        s"""WITH az AS (
           |  SELECT '  C' || CAST(c_custkey AS VARCHAR) || '  ' AS clientid,
           |    CAST(c_nationkey AS VARCHAR) || '  ' AS codice,
           |    c_name AS descrizione
           |  FROM customer),
           |u AS (SELECT CAST(n_nationkey AS BIGINT) AS ulss_id,
           |             ' ' || CAST(n_nationkey AS VARCHAR) AS u_code FROM nation)
           |SELECT lower(${strip("az.clientid")}) AS id,
           |  ${clean("az.codice")} AS code,
           |  ${clean("az.descrizione")} AS name,
           |  u.ulss_id
           |FROM az LEFT JOIN u ON ${clean("az.codice")} = ${strip("u.u_code")}""".stripMargin
      }) { (spark, dir) =>
      val azienda = Tables.load(spark, dir, "customer").select(
        concat(lit("  C"), col("c_custkey").cast("string"), lit("  ")).as("CLIENTID"),
        concat(col("c_nationkey").cast("string"), lit("  ")).as("CODICE"),
        col("c_name").as("DESCRIZIONE"))
      val ulss = Tables.load(spark, dir, "nation").select(
        col("n_nationkey").cast("long").as("id"),
        concat(lit(" "), col("n_nationkey").cast("string")).as("code"))
      graft.pipelines.ServicePipelines.healthcareCompanies(azienda, ulss)
    },

    // J3: DimensionPipelines.groupingSpecialties REUSED VERBATIM
    // (src/core.py:546-592 — ragg_discpl ⋈ macroarea + the no-default enum
    // map, where an unmapped macroarea stays NULL instead of defaulting)
    // over part/region-shaped frames. Region 4 carries an unmapped name so
    // the null path is in the hashed result; audit timestamps pinned to
    // the constant-offset month like j2.
    QueryDef.sql(
      "j3_macroarea_enum_join", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        s"""WITH ragg AS (
           |  SELECT ' RG' || CAST(p_partkey AS VARCHAR) AS clientid,
           |    ' ' || p_name || '  ' AS denominazione,
           |    p_size AS ordine,
           |    'MA' || CAST(p_partkey % 5 AS VARCHAR) AS macro_fk,
           |    CASE WHEN p_partkey % 10 <> 0
           |         THEN TIMESTAMP '1970-01-01' + p_partkey * INTERVAL 1 SECOND END AS creation,
           |    CASE WHEN p_partkey % 2 = 0
           |         THEN TIMESTAMP '1970-01-02' + p_partkey * INTERVAL 1 SECOND END AS lastmod,
           |    CASE WHEN p_partkey % 3 = 0 THEN 'S' ELSE 'N' END AS disabled
           |  FROM part),
           |macro AS (
           |  SELECT 'ma' || CAST(r_regionkey AS VARCHAR) AS macro_id,
           |    CASE r_regionkey WHEN 0 THEN 'Acuti' WHEN 1 THEN ' Riabilitazione '
           |         WHEN 2 THEN 'Intermedie' WHEN 3 THEN 'Territoriale'
           |         ELSE 'Sconosciuta' END AS nome
           |  FROM region)
           |SELECT lower(${strip("clientid")}) AS id,
           |  trim(denominazione) AS name,
           |  CAST(ordine AS INT) AS sort_order,
           |  CASE lower(${strip("nome")})
           |    WHEN 'acuti' THEN 'ACUTI' WHEN 'riabilitazione' THEN 'RIABILITAZIONE'
           |    WHEN 'intermedie' THEN 'INTERMEDIE' WHEN 'territoriale' THEN 'TERRITORIALE'
           |    END AS macroarea,
           |  coalesce(creation - INTERVAL 1 HOUR, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
           |  coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR,
           |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at,
           |  CASE WHEN lower(trim(disabled)) = 's'
           |       THEN coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR) END AS disabled_at
           |FROM ragg LEFT JOIN macro ON lower(${strip("macro_fk")}) = macro_id""".stripMargin
      }) { (spark, dir) =>
      val k = col("p_partkey")
      val ragg = Tables.load(spark, dir, "part").select(
        concat(lit(" RG"), k.cast("string")).as("CLIENTID"),
        concat(lit(" "), col("p_name"), lit("  ")).as("DENOMINAZIONE"),
        col("p_size").as("ORDINE"),
        concat(lit("MA"), (k % 5).cast("string")).as("ID_MACROAREA_FK"),
        when(k % 10 =!= 0, timestamp_seconds(k)).as("CREATION"),
        when(k % 2 === 0, timestamp_seconds(k) + expr("INTERVAL 1 DAY")).as("LAST_MOD"),
        when(k % 3 === 0, "S").otherwise("N").as("DISABLED"))
      val macroDim = Tables.load(spark, dir, "region").select(
        concat(lit("ma"), col("r_regionkey").cast("string")).as("CLIENTID"),
        when(col("r_regionkey") === 0, "Acuti")
          .when(col("r_regionkey") === 1, " Riabilitazione ")
          .when(col("r_regionkey") === 2, "Intermedie")
          .when(col("r_regionkey") === 3, "Territoriale")
          .otherwise("Sconosciuta").as("NOME"))
      graft.pipelines.DimensionPipelines.groupingSpecialties(
        ragg, macroDim, to_timestamp(lit("2024-06-01 00:00:00")))
    },

    // J14: ServicePipelines.procedures REUSED VERBATIM (src/auac.py:211-266
    // — domanda ⋈ tipo_proc with enumToken dot-drop, the space→underscore
    // status normalization, the CESTINATA→BOZZA rewrite, and the
    // STATO-flagged disabled_at) over orders/region-shaped frames. The
    // coalesce(ID_DOMANDA, CODICE_UNIVOCO) fallback and the CESTINATA
    // branch both appear in the hashed result.
    QueryDef.sql(
      "j14_proc_type_join", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        s"""WITH dom AS (
           |  SELECT ' P' || CAST(o_orderkey AS VARCHAR) AS clientid,
           |    CASE WHEN o_orderkey % 4 <> 0 THEN 'D-' || CAST(o_orderkey AS VARCHAR) END AS id_domanda,
           |    'CU-' || CAST(o_orderkey AS VARCHAR) AS codice_univoco,
           |    'CO' || CAST(o_custkey AS VARCHAR) AS company_id,
           |    ' TP' || CAST(o_orderkey % 3 AS VARCHAR) AS proc_fk,
           |    CASE o_orderstatus WHEN 'O' THEN 'IN CORSO' WHEN 'F' THEN 'CESTINATA'
           |         ELSE 'CONCLUSA' END AS stato,
           |    o_orderdate AS data_conclusione,
           |    o_orderdate AS data_invio,
           |    o_orderdate + INTERVAL 30 DAY AS data_scadenza,
           |    CAST(o_orderkey % 90 AS INT) AS durata,
           |    CAST(60 AS INT) AS max_durata,
           |    'N-' || CAST(o_orderkey AS VARCHAR) AS numero,
           |    CASE WHEN o_orderkey % 10 <> 0
           |         THEN TIMESTAMP '1970-01-01' + o_orderkey * INTERVAL 1 SECOND END AS creation,
           |    CASE WHEN o_orderkey % 2 = 0
           |         THEN TIMESTAMP '1970-01-02' + o_orderkey * INTERVAL 1 SECOND END AS lastmod
           |  FROM orders),
           |proc AS (
           |  SELECT 'tp' || CAST(r_regionkey AS VARCHAR) AS tp_id,
           |    CASE r_regionkey WHEN 0 THEN 'Autorizzazione'
           |         WHEN 1 THEN 'Accred. Istituzionale' ELSE 'Revoca Aut.' END AS descr
           |  FROM region WHERE r_regionkey < 3)
           |SELECT lower(${strip("clientid")}) AS id,
           |  coalesce(id_domanda, codice_univoco) AS progressive_code,
           |  company_id,
           |  CASE WHEN regexp_replace(trim(stato), ' ', '_', 'g') = 'CESTINATA' THEN 'BOZZA'
           |       ELSE regexp_replace(trim(stato), ' ', '_', 'g') END AS status,
           |  data_conclusione AS completion_date,
           |  data_invio AS sent_date,
           |  data_scadenza AS expiration_date,
           |  durata AS procedure_duration,
           |  max_durata AS max_procedure_duration,
           |  numero AS procedure_number,
           |  coalesce(creation - INTERVAL 1 HOUR, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
           |  coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR,
           |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at,
           |  CASE WHEN trim(stato) = 'CESTINATA'
           |       THEN coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR) END AS disabled_at,
           |  replace(regexp_replace(upper(trim(descr)), ' ', '_', 'g'), '.', '') AS procedure_type
           |FROM dom LEFT JOIN proc ON lower(${strip("proc_fk")}) = tp_id""".stripMargin
      }) { (spark, dir) =>
      val k = col("o_orderkey")
      val dom = Tables.load(spark, dir, "orders").select(
        concat(lit(" P"), k.cast("string")).as("CLIENTID"),
        when(k % 4 =!= 0, concat(lit("D-"), k.cast("string"))).as("ID_DOMANDA"),
        concat(lit("CU-"), k.cast("string")).as("CODICE_UNIVOCO_NRECORD"),
        concat(lit("CO"), col("o_custkey").cast("string")).as("ID_TITOLARE_FK"),
        concat(lit(" TP"), (k % 3).cast("string")).as("ID_TIPO_PROC_FK"),
        when(col("o_orderstatus") === "O", "IN CORSO")
          .when(col("o_orderstatus") === "F", "CESTINATA")
          .otherwise("CONCLUSA").as("STATO"),
        col("o_orderdate").as("DATA_CONCLUSIONE"),
        col("o_orderdate").as("DATA_INVIO_DOMANDA"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("DATA_SCADENZA"),
        (k % 90).cast("int").as("DURATA_PROCEDIMENTO"),
        lit(60).as("MASSIMA_DURATA_PROCEDIMENTO"),
        concat(lit("N-"), k.cast("string")).as("NUMERO_PROCEDIMENTO"),
        when(k % 10 =!= 0, timestamp_seconds(k)).as("CREATION"),
        when(k % 2 === 0, timestamp_seconds(k) + expr("INTERVAL 1 DAY")).as("LAST_MOD"))
      val proc = Tables.load(spark, dir, "region")
        .filter(col("r_regionkey") < 3).select(
          concat(lit("tp"), col("r_regionkey").cast("string")).as("CLIENTID"),
          when(col("r_regionkey") === 0, "Autorizzazione")
            .when(col("r_regionkey") === 1, "Accred. Istituzionale")
            .otherwise("Revoca Aut.").as("DESCR"))
      graft.pipelines.ServicePipelines.procedures(
        dom, proc, to_timestamp(lit("2024-06-01 00:00:00")))
    },

    // J11: CorePipelines.udoSpecialties REUSED VERBATIM (src/core.py:
    // 1560-1688 — the three-branch diagonal union: branca flags,
    // branca_altro hard-false, disciplines with bed counts + the
    // stripped-ID_UO broadcast join to UO) over orders/customer/lineitem/
    // supplier-shaped frames. Unmatched UO codes leave NULL
    // clinical_operational_unit_id in the hashed result; the null
    // ID_DISCIPLINA_FK rows must be filtered before the union.
    QueryDef.sql(
      "j11_specialty_bridge_union", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        s"""WITH b AS (
           |  SELECT coalesce(lower(${strip("aut")}) IN ('s','y'), FALSE) AS is_authorized,
           |    coalesce(lower(${strip("acc")}) IN ('s','y'), FALSE) AS is_accredited,
           |    CAST(NULL AS INT) AS num_beds, CAST(NULL AS INT) AS num_extra_beds,
           |    CAST(NULL AS INT) AS num_mortuary_beds, CAST(NULL AS INT) AS num_accredited_beds,
           |    CAST(NULL AS VARCHAR) AS hsp12,
           |    CAST(NULL AS VARCHAR) AS clinical_operational_unit_id,
           |    CAST(NULL AS VARCHAR) AS clinical_poa_node_id,
           |    lower(${strip("brfk")}) AS specialty_id,
           |    lower(${strip("udofk")}) AS udo_id
           |  FROM (SELECT CASE o_orderstatus WHEN 'O' THEN 'S' WHEN 'F' THEN 'n' ELSE ' Y ' END AS aut,
           |          CASE WHEN o_orderkey % 2 = 0 THEN 'y' ELSE 'N' END AS acc,
           |          ' BR' || CAST(o_orderkey % 50 AS VARCHAR) AS brfk,
           |          'U' || CAST(o_orderkey AS VARCHAR) AS udofk FROM orders)),
           |ba AS (
           |  SELECT FALSE AS is_authorized, FALSE AS is_accredited,
           |    CAST(NULL AS INT) AS num_beds, CAST(NULL AS INT) AS num_extra_beds,
           |    CAST(NULL AS INT) AS num_mortuary_beds, CAST(NULL AS INT) AS num_accredited_beds,
           |    CAST(NULL AS VARCHAR) AS hsp12,
           |    CAST(NULL AS VARCHAR) AS clinical_operational_unit_id,
           |    CAST(NULL AS VARCHAR) AS clinical_poa_node_id,
           |    lower('AB' || CAST(c_custkey % 30 AS VARCHAR)) AS specialty_id,
           |    lower('U' || CAST(c_custkey AS VARCHAR)) AS udo_id
           |  FROM customer),
           |uo AS (SELECT lower(${strip("' UOC' || CAST(s_suppkey AS VARCHAR)")}) AS cuo,
           |              'UO' || CAST(s_suppkey AS VARCHAR) AS uo_code FROM supplier),
           |d AS (
           |  SELECT FALSE AS is_authorized, FALSE AS is_accredited,
           |    CAST(l_linenumber AS INT) AS num_beds,
           |    CAST(l_linenumber % 3 AS INT) AS num_extra_beds,
           |    CAST(l_linenumber % 2 AS INT) AS num_mortuary_beds,
           |    CAST(l_linenumber % 4 AS INT) AS num_accredited_beds,
           |    trim(' H' || CAST(l_suppkey % 10 AS VARCHAR)) AS hsp12,
           |    uo.cuo AS clinical_operational_unit_id,
           |    CAST(NULL AS VARCHAR) AS clinical_poa_node_id,
           |    lower('D' || CAST(l_partkey % 40 AS VARCHAR)) AS specialty_id,
           |    lower('U' || CAST(l_orderkey AS VARCHAR)) AS udo_id
           |  FROM lineitem LEFT JOIN uo
           |    ON ${strip("' UO' || CAST(l_suppkey % 40 AS VARCHAR) || ' '")} = uo.uo_code
           |  WHERE l_orderkey % 7 <> 0)
           |SELECT * FROM b UNION ALL SELECT * FROM ba UNION ALL SELECT * FROM d""".stripMargin
      }) { (spark, dir) =>
      val ok = col("o_orderkey")
      val bindBranca = Tables.load(spark, dir, "orders").select(
        when(col("o_orderstatus") === "O", "S")
          .when(col("o_orderstatus") === "F", "n")
          .otherwise(" Y ").as("AUTORIZZATA"),
        when(ok % 2 === 0, "y").otherwise("N").as("ACCREDITATA"),
        concat(lit(" BR"), (ok % 50).cast("string")).as("ID_BRANCA_FK"),
        concat(lit("U"), ok.cast("string")).as("ID_UDO_FK"))
      val bindAltro = Tables.load(spark, dir, "customer").select(
        concat(lit("AB"), (col("c_custkey") % 30).cast("string")).as("ID_ARTIC_BRANCA_ALTRO_FK"),
        concat(lit("U"), col("c_custkey").cast("string")).as("ID_UDO_FK"))
      val bindDisc = Tables.load(spark, dir, "lineitem").select(
        when(col("l_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("D"), (col("l_partkey") % 40).cast("string")))
          .as("ID_DISCIPLINA_FK"),
        col("l_linenumber").as("POSTI_LETTO"),
        (col("l_linenumber") % 3).as("POSTI_LETTO_EXTRA"),
        (col("l_linenumber") % 2).as("POSTI_LETTO_OBI"),
        (col("l_linenumber") % 4).as("POSTI_LETTO_ACC"),
        concat(lit(" H"), (col("l_suppkey") % 10).cast("string")).as("HSP12"),
        concat(lit(" UO"), (col("l_suppkey") % 40).cast("string"), lit(" ")).as("ID_UO"),
        concat(lit("U"), col("l_orderkey").cast("string")).as("ID_UDO_FK"))
      val uo = Tables.load(spark, dir, "supplier").select(
        concat(lit(" UOC"), col("s_suppkey").cast("string")).as("CLIENTID"),
        concat(lit("UO"), col("s_suppkey").cast("string")).as("ID_UO"))
      graft.pipelines.CorePipelines.udoSpecialties(
        bindBranca, bindAltro, bindDisc, uo)
    },

    // J13: ServicePipelines.requirements REUSED VERBATIM (src/auac.py:
    // 135-209 — the fallback-scalar + conditional-FK shape: TIPO picks
    // which FK feeds requirement_taxonomy_id, nulls fall to the '-'
    // taxonomy scalar under the reference's own 1-row cardinality guard;
    // VALIDATO → ANNULLATO → BOZZA precedence; '/'-dropping enumToken on
    // the response type) over orders/region-shaped frames.
    QueryDef.sql(
      "j13_requirement_fallback_join", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        val clean = (c: String) =>
          s"trim(regexp_replace(regexp_replace($c, '\\x00', '', 'g'), '\\s+', ' ', 'g'))"
        s"""WITH req AS (
           |  SELECT ' Q' || CAST(o_orderkey AS VARCHAR) AS clientid,
           |    ' Req  ' || o_orderpriority || ' ' AS nome,
           |    'Testo  lungo ' || CAST(o_orderkey AS VARCHAR) AS testo,
           |    CASE WHEN o_orderkey % 9 = 0 THEN NULL
           |         ELSE 'nota ' || CAST(o_orderkey AS VARCHAR) END AS annotations,
           |    CASE WHEN o_orderstatus = 'O' THEN ' S ' ELSE 'N' END AS validato,
           |    CASE WHEN o_orderstatus = 'F' THEN 's' ELSE 'N' END AS annullato,
           |    CASE WHEN o_orderkey % 2 = 0 THEN 'S' ELSE 'no' END AS irrinunciabile,
           |    CASE WHEN o_orderkey % 3 = 0 THEN ' Generale ' ELSE 'Specifico' END AS tipo,
           |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
           |         ELSE 'TG' || CAST(o_orderkey % 4 AS VARCHAR) END AS tipo_req_fk,
           |    CASE WHEN o_orderkey % 6 = 0 THEN NULL
           |         ELSE 'TS' || CAST(o_orderkey % 4 AS VARCHAR) END AS tipo_spec_fk,
           |    ' R' || CAST(o_orderkey % 5 AS VARCHAR) AS risposta_fk,
           |    CASE WHEN o_orderkey % 10 <> 0
           |         THEN TIMESTAMP '1970-01-01' + o_orderkey * INTERVAL 1 SECOND END AS creation,
           |    CASE WHEN o_orderkey % 2 = 0
           |         THEN TIMESTAMP '1970-01-02' + o_orderkey * INTERVAL 1 SECOND END AS lastmod,
           |    CASE WHEN o_orderkey % 3 = 0 THEN 'S' ELSE 'N' END AS disabled
           |  FROM orders),
           |risp AS (
           |  SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS tr_id,
           |    CASE r_regionkey WHEN 0 THEN 'Si/No' WHEN 1 THEN 'Testo Libero'
           |         WHEN 2 THEN 'Numero' WHEN 3 THEN 'Data/Ora'
           |         ELSE 'Percentuale' END AS nome
           |  FROM region)
           |SELECT lower(${strip("clientid")}) AS id,
           |  ${clean("req.nome")} AS name,
           |  ${clean("testo")} AS text,
           |  ${clean("annotations")} AS annotations,
           |  CASE WHEN lower(${strip("validato")}) = 's' THEN 'VALIDATO'
           |       WHEN lower(${strip("annullato")}) = 's' THEN 'ANNULLATO'
           |       ELSE 'BOZZA' END AS state,
           |  coalesce(lower(${strip("irrinunciabile")}) = 's', FALSE) AS is_required,
           |  coalesce(CASE WHEN lower(${strip("tipo")}) = 'generale' THEN tipo_req_fk
           |                ELSE tipo_spec_fk END, 'tax4') AS requirement_taxonomy_id,
           |  coalesce(creation - INTERVAL 1 HOUR, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
           |  coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR,
           |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at,
           |  CASE WHEN lower(trim(disabled)) = 's'
           |       THEN coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR) END AS disabled_at,
           |  replace(regexp_replace(upper(trim(risp.nome)), ' ', '_', 'g'), '/', '_') AS response_type
           |FROM req LEFT JOIN risp ON lower(${strip("risposta_fk")}) = risp.tr_id""".stripMargin
      }) { (spark, dir) =>
      val k = col("o_orderkey")
      val requisito = Tables.load(spark, dir, "orders").select(
        concat(lit(" Q"), k.cast("string")).as("CLIENTID"),
        concat(lit(" Req  "), col("o_orderpriority"), lit(" ")).as("NOME"),
        concat(lit("Testo  lungo "), k.cast("string")).as("TESTO"),
        when(k % 9 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("nota "), k.cast("string"))).as("ANNOTATIONS"),
        when(col("o_orderstatus") === "O", " S ").otherwise("N").as("VALIDATO"),
        when(col("o_orderstatus") === "F", "s").otherwise("N").as("ANNULLATO"),
        when(k % 2 === 0, "S").otherwise("no").as("IRRINUNCIABILE"),
        when(k % 3 === 0, " Generale ").otherwise("Specifico").as("TIPO"),
        when(k % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("TG"), (k % 4).cast("string"))).as("ID_TIPO_REQUISITO_FK"),
        when(k % 6 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("TS"), (k % 4).cast("string"))).as("ID_TIPO_SPECIFICO_REQUISITO_FK"),
        concat(lit(" R"), (k % 5).cast("string")).as("ID_TIPO_RISPOSTA_FK"),
        when(k % 10 =!= 0, timestamp_seconds(k)).as("CREATION"),
        when(k % 2 === 0, timestamp_seconds(k) + expr("INTERVAL 1 DAY")).as("LAST_MOD"),
        when(k % 3 === 0, "S").otherwise("N").as("DISABLED"))
      val risposta = Tables.load(spark, dir, "region").select(
        concat(lit("r"), col("r_regionkey").cast("string")).as("CLIENTID"),
        when(col("r_regionkey") === 0, "Si/No")
          .when(col("r_regionkey") === 1, "Testo Libero")
          .when(col("r_regionkey") === 2, "Numero")
          .when(col("r_regionkey") === 3, "Data/Ora")
          .otherwise("Percentuale").as("NOME"))
      val tax = Tables.load(spark, dir, "region").select(
        concat(lit("tax"), col("r_regionkey").cast("string")).as("id"),
        when(col("r_regionkey") === 4, "-")
          .otherwise(concat(lit("Tax "), col("r_regionkey").cast("string"))).as("name"))
      graft.pipelines.ServicePipelines.requirements(
        requisito, risposta, tax, to_timestamp(lit("2024-06-01 00:00:00")))
    },

    // J6/J7/J8: CorePipelines.udoTypes REUSED VERBATIM (src/core.py:
    // 749-1004 — the heaviest dimension pipeline: ambito bridge traversal,
    // grouped natures with the exact-match nature rewrite, grouped
    // ministerial flows with elementCleanup, PG text[] literal rendering,
    // and the not-null-not-empty scope gate) over part/region/customer/
    // orders/nation-shaped frames. Coverage baked into the fixtures:
    // unbound tipos and an empty-named ambito exercise the scope filter,
    // an unmatched natura FK exercises collect_list's null-drop, tipos
    // beyond the bind ranges render '{}' via nullToEmpty, and the
    // sort-by-RAW-name-then-map order is pinned by mapping 3 of the
    // natura names.
    QueryDef.sql(
      "j6_udo_types_bridge", {
        val strip = (c: String) =>
          s"regexp_replace($c, '^[\\t-\\r\\x{0085}\\p{Z}]+|[\\t-\\r\\x{0085}\\p{Z}]+$$', '', 'g')"
        val clean = (c: String) =>
          s"trim(regexp_replace(regexp_replace($c, '\\x00', '', 'g'), '\\s+', ' ', 'g'))"
        val yn = (c: String) => s"coalesce(lower(${strip(c)}) IN ('s','y'), FALSE)"
        s"""WITH tipo AS (
           |  SELECT lower(${strip("' T' || CAST(p_partkey AS VARCHAR)")}) AS tipo_id,
           |    ${clean("'  ' || p_name || ' '")} AS name,
           |    trim(' C' || CAST(p_partkey % 100 AS VARCHAR)) AS code,
           |    trim('NC ' || CAST(p_partkey % 100 AS VARCHAR)) AS code_name,
           |    trim(' S' || CAST(p_partkey % 3 AS VARCHAR)) AS setting,
           |    trim('Tg' || CAST(p_partkey % 4 AS VARCHAR)) AS target,
           |    CASE WHEN p_partkey % 11 = 0 THEN NULL
           |         ELSE lower(${strip("' CL' || CAST(p_partkey % 6 AS VARCHAR)")}) END
           |      AS udo_type_classification_id,
           |    ${yn("CASE WHEN p_partkey % 2 = 0 THEN ' s ' ELSE 'N' END")} AS is_hospital,
           |    ${yn("CASE WHEN p_partkey % 3 = 0 THEN 'Y' ELSE 'x' END")} AS is_mental_health,
           |    ${yn("CASE WHEN p_partkey % 5 = 0 THEN 'y' ELSE '' END")} AS has_beds,
           |    CASE WHEN p_partkey % 10 <> 0
           |         THEN TIMESTAMP '1970-01-01' + p_partkey * INTERVAL 1 SECOND END AS creation,
           |    CASE WHEN p_partkey % 2 = 0
           |         THEN TIMESTAMP '1970-01-02' + p_partkey * INTERVAL 1 SECOND END AS lastmod,
           |    CASE WHEN p_partkey % 3 = 0 THEN 'S' ELSE 'N' END AS disabled
           |  FROM part),
           |ba AS (SELECT 't' || CAST(p_partkey AS VARCHAR) AS ba_tipo,
           |              'a' || CAST(p_partkey % 5 AS VARCHAR) AS ba_amb
           |       FROM part WHERE p_partkey % 13 <> 0),
           |amb AS (
           |  SELECT 'a' || CAST(r_regionkey AS VARCHAR) AS amb_id,
           |    CASE WHEN r_regionkey = 4 THEN ''
           |         ELSE ${clean("' Ambito  ' || CAST(r_regionkey AS VARCHAR)")} END AS scope_name,
           |    ${clean("'Desc ' || CAST(r_regionkey AS VARCHAR)")} AS scope_description,
           |    ${yn("CASE WHEN r_regionkey % 2 = 0 THEN 'S' ELSE 'n' END")} AS has_disciplines,
           |    ${yn("CASE WHEN r_regionkey < 2 THEN 'y' ELSE 'N ' END")} AS has_disciplines_only_healthcare_company,
           |    ${yn("CASE WHEN r_regionkey = 1 THEN ' Y' ELSE 'x' END")} AS has_disciplines_only_public_or_private_company,
           |    TRUE AS has_branches,
           |    FALSE AS has_branches_only_healthcare_company,
           |    ${yn("CASE WHEN r_regionkey % 2 = 1 THEN 'y' ELSE 'q' END")} AS has_branches_only_public_or_private_company,
           |    ${yn("'s '")} AS has_services,
           |    ${yn("'no'")} AS has_scopes
           |  FROM region),
           |bn AS (
           |  SELECT 't' || CAST(c_custkey AS VARCHAR) AS bn_tipo,
           |    CASE WHEN c_custkey % 17 = 0 THEN 'nx'
           |         ELSE 'n' || CAST(c_custkey % 9 AS VARCHAR) END AS n_fk,
           |    0 AS ord
           |  FROM customer
           |  UNION ALL
           |  SELECT 't' || CAST(c_custkey AS VARCHAR),
           |    'n' || CAST((c_custkey + 1) % 9 AS VARCHAR), 1
           |  FROM customer WHERE c_custkey % 3 = 0),
           |nat AS (
           |  SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS n_id,
           |    CASE n_nationkey WHEN 0 THEN 'AzSan' WHEN 1 THEN 'Pub' WHEN 2 THEN 'Pri'
           |         ELSE 'Natura ' || CAST(n_nationkey AS VARCHAR) END AS n_nome
           |  FROM nation),
           |natg AS (
           |  SELECT bn_tipo,
           |    '{' || coalesce(string_agg(
           |      '"' || CASE n_nome WHEN 'AzSan' THEN 'AZIENDA_SANITARIA'
           |                         WHEN 'Pub' THEN 'PUBBLICO'
           |                         WHEN 'Pri' THEN 'PRIVATO' ELSE n_nome END || '"',
           |      ',' ORDER BY n_nome), '') || '}' AS company_natures
           |  FROM bn LEFT JOIN nat ON n_fk = n_id GROUP BY bn_tipo),
           |bf AS (SELECT 't' || CAST(o_orderkey % 1000 AS VARCHAR) AS bf_tipo,
           |              'f' || CAST(o_orderkey % 6 AS VARCHAR) AS f_fk FROM orders),
           |fl AS (SELECT 'f' || CAST(n_nationkey AS VARCHAR) AS f_id,
           |              'FLS ' || CAST(n_nationkey AS VARCHAR) || '.A' AS f_nome
           |       FROM nation WHERE n_nationkey < 6),
           |flg AS (
           |  SELECT bf_tipo,
           |    '{' || coalesce(string_agg(
           |      '"' || replace(replace(f_nome, ' ', '_'), '.', '_') || '"',
           |      ',' ORDER BY f_nome), '') || '}' AS ministerial_flows
           |  FROM bf LEFT JOIN fl ON f_fk = f_id GROUP BY bf_tipo)
           |SELECT tipo_id AS id, name, code, code_name, setting, target,
           |  udo_type_classification_id, is_hospital, is_mental_health, has_beds,
           |  scope_name, scope_description, has_disciplines,
           |  has_disciplines_only_healthcare_company,
           |  has_disciplines_only_public_or_private_company,
           |  has_branches, has_branches_only_healthcare_company,
           |  has_branches_only_public_or_private_company,
           |  has_services, has_scopes,
           |  coalesce(company_natures, '{}') AS company_natures,
           |  coalesce(ministerial_flows, '{}') AS ministerial_flows,
           |  CASE WHEN lower(trim(disabled)) = 's'
           |       THEN coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR) END AS disabled_at,
           |  coalesce(creation - INTERVAL 1 HOUR, TIMESTAMP '2024-06-01 00:00:00') AS created_at,
           |  coalesce(lastmod - INTERVAL 1 HOUR, creation - INTERVAL 1 HOUR,
           |           TIMESTAMP '2024-06-01 00:00:00') AS updated_at
           |FROM tipo
           |LEFT JOIN ba ON tipo_id = ba_tipo
           |LEFT JOIN amb ON ba_amb = amb_id
           |LEFT JOIN natg ON tipo_id = bn_tipo
           |LEFT JOIN flg ON tipo_id = bf_tipo
           |WHERE scope_name IS NOT NULL AND scope_name <> ''""".stripMargin
      }) { (spark, dir) =>
      val pk = col("p_partkey")
      val tipoUdo22 = Tables.load(spark, dir, "part").select(
        concat(lit(" T"), pk.cast("string")).as("CLIENTID"),
        concat(lit("  "), col("p_name"), lit(" ")).as("DESCR"),
        concat(lit(" C"), (pk % 100).cast("string")).as("CODICE_UDO"),
        concat(lit("NC "), (pk % 100).cast("string")).as("NOME_CODICE_UDO"),
        concat(lit(" S"), (pk % 3).cast("string")).as("SETTING"),
        concat(lit("Tg"), (pk % 4).cast("string")).as("TARGET"),
        when(pk % 11 === 0, lit(null).cast("string"))
          .otherwise(concat(lit(" CL"), (pk % 6).cast("string")))
          .as("ID_CLASSIFICAZIONE_UDO_FK"),
        when(pk % 2 === 0, " s ").otherwise("N").as("OSPEDALIERO"),
        when(pk % 3 === 0, "Y").otherwise("x").as("SALUTE_MENTALE"),
        when(pk % 5 === 0, "y").otherwise("").as("POSTI_LETTO"),
        when(pk % 10 =!= 0, timestamp_seconds(pk)).as("CREATION"),
        when(pk % 2 === 0, timestamp_seconds(pk) + expr("INTERVAL 1 DAY")).as("LAST_MOD"),
        when(pk % 3 === 0, "S").otherwise("N").as("DISABLED"))
      val bindAmbito = Tables.load(spark, dir, "part")
        .filter(pk % 13 =!= 0).select(
          concat(lit("T"), pk.cast("string")).as("ID_TIPO_22_FK"),
          concat(lit("A"), (pk % 5).cast("string")).as("ID_AMBITO_FK"))
      val rk = col("r_regionkey")
      val ambito = Tables.load(spark, dir, "region").select(
        concat(lit("a"), rk.cast("string")).as("CLIENTID"),
        when(rk === 4, "").otherwise(
          concat(lit(" Ambito  "), rk.cast("string"))).as("NOME"),
        concat(lit("Desc "), rk.cast("string")).as("DESCR"),
        when(rk % 2 === 0, "S").otherwise("n").as("AGGIUNGI_DISCIPLINE"),
        when(rk < 2, "y").otherwise("N ").as("AGGIUNGI_DISCIPLINE_AZ_SAN"),
        when(rk === 1, " Y").otherwise("x").as("AGGIUNGI_DISCIPLINE_PUB_PRIV"),
        lit("S").as("AGGIUNGI_BRANCHE"),
        lit("n").as("AGGIUNGI_BRANCHE_AZ_SAN"),
        when(rk % 2 === 1, "y").otherwise("q").as("AGGIUNGI_BRANCHE_PUB_PRIV"),
        lit("s ").as("AGGIUNGI_PRESTAZIONI"),
        lit("no").as("AGGIUNGI_AMBITO"))
      val ck = col("c_custkey")
      val bindNatura = Tables.load(spark, dir, "customer").select(
        concat(lit(" T"), ck.cast("string")).as("ID_TIPO_UDO_22_FK"),
        when(ck % 17 === 0, "NX")
          .otherwise(concat(lit(" N"), (ck % 9).cast("string"))).as("ID_NATURA_FK"))
        .unionAll(Tables.load(spark, dir, "customer")
          .filter(ck % 3 === 0).select(
            concat(lit(" T"), ck.cast("string")).as("ID_TIPO_UDO_22_FK"),
            concat(lit(" N"), ((ck + 1) % 9).cast("string")).as("ID_NATURA_FK")))
      val nk = col("n_nationkey")
      val natura = Tables.load(spark, dir, "nation").select(
        concat(lit("n"), nk.cast("string")).as("CLIENTID"),
        when(nk === 0, "AzSan").when(nk === 1, "Pub").when(nk === 2, "Pri")
          .otherwise(concat(lit("Natura "), nk.cast("string"))).as("NOME"))
      val bindFlusso = Tables.load(spark, dir, "orders").select(
        concat(lit("T"), (col("o_orderkey") % 1000).cast("string")).as("ID_TIPO_UDO_22_FK"),
        concat(lit("F"), (col("o_orderkey") % 6).cast("string")).as("ID_FLUSSO_FK"))
      val flusso = Tables.load(spark, dir, "nation")
        .filter(nk < 6).select(
          concat(lit("f"), nk.cast("string")).as("CLIENTID"),
          concat(lit("FLS "), nk.cast("string"), lit(".A")).as("NOME"))
      graft.pipelines.CorePipelines.udoTypes(
        tipoUdo22, bindAmbito, ambito, bindNatura, natura, bindFlusso, flusso,
        to_timestamp(lit("2024-06-01 00:00:00")))
    },

    // J21: geospatial grid-blocked neighbor join — the proximity-join
    // family (nearest facility, dedup-by-location, geo-enrichment) done
    // the way it survives 100 TB: points land in r-sized grid cells, side
    // A explodes to its 3×3 neighbor cells, candidates come from ONE
    // equi-join on the cell id (cell width == r, so no true neighbor can
    // escape the ±1 ring — boundary-exact even when |Δ| = r), and only
    // in-cell candidates pay the distance verify. Coordinates are
    // synthesized deterministically from c_custkey (testdata has no geo
    // columns); distance is the planar approximation with a FIXED
    // latitude cosine baked as a literal — sqrt is the one libm op IEEE
    // correctly rounds, so the math hash-matches; real trig would not.
    // The oracle is the NAIVE theta join (an independent formulation, so
    // the grid's no-false-negative property is itself under test).
    QueryDef.sql(
      "j21_geo_grid_join",
      """WITH p AS (SELECT c_custkey AS id,
        |    36.0 + CAST(c_custkey * 7919 % 900 AS DOUBLE) / 1000.0 AS lat,
        |    7.0 + CAST(c_custkey * 104729 % 1100 AS DOUBLE) / 1000.0 AS lon
        |  FROM customer),
        |n AS (SELECT a.id AS id, count(*) AS n_neighbors,
        |    round(MIN(sqrt((a.lat-b.lat)*(a.lat-b.lat) + (0.737*(a.lon-b.lon))*(0.737*(a.lon-b.lon))) * 111.0), 6) AS nearest_km
        |  FROM p a JOIN p b ON a.id <> b.id
        |    AND (a.lat-b.lat)*(a.lat-b.lat) + (0.737*(a.lon-b.lon))*(0.737*(a.lon-b.lon)) <= 0.0025
        |  GROUP BY 1)
        |SELECT p.id, COALESCE(n.n_neighbors, 0) AS n_neighbors, n.nearest_km
        |FROM p LEFT JOIN n ON p.id = n.id""".stripMargin) { (spark, dir) =>
      val r = 0.05
      val pts = Tables.load(spark, dir, "customer").select(
        col("c_custkey").as("id"),
        (lit(36.0) + (col("c_custkey") * 7919 % 900).cast("double") / 1000.0).as("lat"),
        (lit(7.0) + (col("c_custkey") * 104729 % 1100).cast("double") / 1000.0).as("lon"))
      // grid the METRIC-scaled coordinates: the verify distance scales
      // lon by the latitude cosine, so a true neighbor can be r/0.737 ≈
      // 1.36 raw-lon cells away — cells must tile the same space the
      // distance lives in, or the ±1 ring silently drops neighbors
      val cells = pts
        .withColumn("cx", floor(col("lat") / r).cast("int"))
        .withColumn("cy", floor(col("lon") * 0.737 / r).cast("int"))
      val offsets = Seq(-1, 0, 1).flatMap(dx => Seq(-1, 0, 1).map(dy => (dx, dy)))
      import spark.implicits._
      val ringed = cells.crossJoin(
          broadcast(offsets.toDF("dx", "dy")))
        .select(col("id").as("id_a"), col("lat").as("la"), col("lon").as("lo"),
          (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
      val d2 = (col("la") - col("lat")) * (col("la") - col("lat")) +
        (lit(0.737) * (col("lo") - col("lon"))) * (lit(0.737) * (col("lo") - col("lon")))
      val near = ringed.join(cells, Seq("cx", "cy"))
        .filter(col("id_a") =!= col("id") && d2 <= r * r)
        .groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_neighbors"),
          round(min(sqrt(d2)) * 111.0, 6).as("nearest_km"))
      pts.select(col("id"))
        .join(near.select(col("id_a").as("id"), col("n_neighbors"), col("nearest_km")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
          col("nearest_km"))
    },

    // Q5: functional-dependency audit — schema profiling's other classic:
    // does column A determine column B? Reported per candidate FD as the
    // count of LHS values bound to >1 distinct RHS (0 ⟺ the dependency
    // holds). One distinct-count aggregate per FD (map-side partial,
    // lhs-keyed shuffle); the 3-row report unions. Candidates chosen so
    // both outcomes appear: the PK dependency holds, the two fact-side
    // ones genuinely fail on TPC-H-shaped data.
    QueryDef.sql(
      "q5_functional_dependency", {
        def side(name: String, table: String, lhs: String, rhs: String) =
          s"""SELECT '$name' AS fd, COUNT(*) AS n_lhs,
             |  COUNT(*) FILTER (d > 1) AS n_violating,
             |  COUNT(*) FILTER (d > 1) = 0 AS holds
             |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS d FROM $table GROUP BY 1)""".stripMargin
        Seq(
          side("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
          side("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
          side("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"))
          .mkString("\nUNION ALL\n")
      }) { (spark, dir) =>
      def side(name: String, table: String, lhs: String, rhs: String) =
        Tables.load(spark, dir, table)
          .groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("d"))
          .agg(count(lit(1)).as("n_lhs"),
            count(when(col("d") > 1, lit(1))).as("n_violating"))
          .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
            (col("n_violating") === 0).as("holds"))
      side("orders.o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey")
        .unionAll(side("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"))
        .unionAll(side("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"))
    },

    // Q3: shuffle-key skew profiler — the pre-flight an operator runs
    // BEFORE keying a 100 TB shuffle on a column: per candidate key, the
    // cardinality, max/mean per-key row count (the straggler factor), and
    // how many keys run hotter than 2× the mean. All tie-free exact
    // aggregates over a per-key count — no global window, no top-k
    // selection whose tie behavior could diverge between engines. One
    // count-aggregate per profiled key, 2-row report.
    QueryDef.sql(
      "q3_skew_profile", {
        s"""WITH k_l_suppkey AS (SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
           |k_l_partkey AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1),
           |s1 AS (SELECT COUNT(*) AS nk, CAST(SUM(c) AS BIGINT) AS tot, MAX(c) AS mx FROM k_l_suppkey),
           |s2 AS (SELECT COUNT(*) AS nk, CAST(SUM(c) AS BIGINT) AS tot, MAX(c) AS mx FROM k_l_partkey),
           |h1 AS (SELECT COUNT(*) AS hot FROM k_l_suppkey, s1 WHERE c * nk > 2 * tot),
           |h2 AS (SELECT COUNT(*) AS hot FROM k_l_partkey, s2 WHERE c * nk > 2 * tot)
           |SELECT 'l_suppkey' AS key_col, nk AS n_keys, tot AS total_rows, mx AS max_cnt,
           |  round(CAST(mx * nk AS DOUBLE) / tot, 4) AS max_skew, hot AS hot_keys
           |FROM s1, h1
           |UNION ALL
           |SELECT 'l_partkey', nk, tot, mx, round(CAST(mx * nk AS DOUBLE) / tot, 4), hot
           |FROM s2, h2""".stripMargin
      }) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
      def profile(key: String) = {
        val k = li.groupBy(col(key)).agg(count(lit(1)).as("c"))
        val s = k.agg(count(lit(1)).as("nk"), sum(col("c")).cast("long").as("tot"),
          max(col("c")).as("mx"))
        val hot = k.crossJoin(broadcast(s))
          .filter(col("c") * col("nk") > lit(2) * col("tot"))
          .agg(count(lit(1)).as("hot"))
        s.crossJoin(broadcast(hot)).select(
          lit(key).as("key_col"), col("nk").as("n_keys"), col("tot").as("total_rows"),
          col("mx").as("max_cnt"),
          round((col("mx") * col("nk")).cast("double") / col("tot"), 4).as("max_skew"),
          col("hot").as("hot_keys"))
      }
      profile("l_suppkey").unionAll(profile("l_partkey"))
    },

    // Q4: join fan-out estimator — the other pre-flight: BEFORE running a
    // 100 TB join, predict its output size exactly as Σ_key c_left·c_right
    // (and Σ c² for a self-join) from per-key counts alone — key-cardinality
    // work instead of materializing the join. The dimension-side counts
    // broadcast onto the fact-side counts; exact integer arithmetic.
    QueryDef.sql(
      "q4_join_fanout",
      """WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |oo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |lp AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1)
        |SELECT 'lineitem*orders@orderkey' AS join_id,
        |  CAST(SUM(lo.c * oo.c) AS BIGINT) AS predicted_rows
        |FROM lo JOIN oo ON lo.k = oo.k
        |UNION ALL
        |SELECT 'lineitem*lineitem@partkey',
        |  CAST(SUM(c * c) AS BIGINT) FROM lp""".stripMargin) { (spark, dir) =>
      val li = Tables.load(spark, dir, "lineitem")
      val lo = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cl"))
      val oo = Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("co"))
      val pairPred = lo.join(oo, Seq("k"))
        .agg(sum(col("cl") * col("co")).cast("long").as("predicted_rows"))
        .select(lit("lineitem*orders@orderkey").as("join_id"), col("predicted_rows"))
      val selfPred = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).cast("long").as("predicted_rows"))
        .select(lit("lineitem*lineitem@partkey").as("join_id"), col("predicted_rows"))
      pairPred.unionAll(selfPred)
    },

    // Q7 (absorbs the former rows-only q6): sketch-based join-size
    // estimation — q4 priced the join from per-key counts (key-cardinality
    // work); this prices it from two FIXED-MEMORY Count-Min sketches via
    // the classic CMS inner product (min over rows of the counter-table
    // dot product). O(sketch) instead of O(distinct keys) — the estimator
    // an operator can afford to keep ALWAYS-ON for every candidate join.
    // DuckDB can't build the sketch, but it CAN state what the sketch must
    // satisfy: the inner-product estimate is one-sided (≥ exact, a
    // theorem) and eps-tight (≤ exact + eps·N_a·N_b — deterministic here
    // because the sketch seed is pinned; the w.h.p. version is pinned in
    // AggSketchSpec). The oracle computes the exact join size in SQL and
    // asserts both bounds as TRUE literals, so the driver's hash gate
    // cross-validates the sketch against the exact aggregation.
    QueryDef.sql(
      "q7_sketch_bound_audit",
      """WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |oo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1)
        |SELECT 'lineitem*orders@orderkey' AS join_id,
        |  CAST(SUM(lo.c * oo.c) AS BIGINT) AS exact_rows,
        |  TRUE AS cms_one_sided, TRUE AS cms_eps_tight
        |FROM lo JOIN oo ON lo.k = oo.k""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val eps = 1e-4
      val li = Tables.load(spark, dir, "lineitem")
      val oo = Tables.load(spark, dir, "orders")
      val sa = graft.operators.CountMin.build(li, "l_orderkey", eps = eps)
      val sb = graft.operators.CountMin.build(oo, "o_orderkey", eps = eps)
      val estimate = graft.operators.CountMin.innerProduct(sa, sb)
      val na = li.count(); val nb = oo.count()
      val exact = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cl"))
        .join(oo.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("co")), Seq("k"))
        .agg(sum(col("cl") * col("co")).cast("long")).head().getLong(0)
      Seq(("lineitem*orders@orderkey", exact,
          estimate >= exact.toDouble,
          estimate <= exact.toDouble + eps * na.toDouble * nb.toDouble))
        .toDF("join_id", "exact_rows", "cms_one_sided", "cms_eps_tight")
    },

    // Q8: incremental rollup maintenance — the daily-delta shape: the
    // per-priority revenue rollup is maintained as a mergeable STATE
    // (counts + exact decimal sums), a delta batch (here orders with
    // o_orderkey % 10 >= 8, plus a RETRACTION of the '5-LOW' slice as
    // negative-delta rows) is aggregated at delta scale and merged in —
    // |delta| + |keys| work, the base is never re-scanned. The oracle is
    // the full recompute over the equivalent final row set, so the gate
    // proves maintained-state == recompute bit-for-bit (decimal sums
    // merge associatively; only the final value lowers to double).
    QueryDef.sql(
      "q8_incremental_rollup",
      """WITH fin AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE NOT (o_orderkey % 10 < 8 AND o_orderpriority = '5-LOW'))
        |SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM fin GROUP BY 1""".stripMargin) { (spark, dir) =>
      import graft.operators.IncrementalAgg
      val orders = Tables.load(spark, dir, "orders")
      def agged(df: org.apache.spark.sql.DataFrame, sign: Int) =
        df.groupBy(col("o_orderpriority").as("priority"))
          .agg((count(lit(1)) * sign).as("n"),
            (sum(Num.dec2(col("o_totalprice"))) * sign).as("revenue_dec"))
      val base = orders.filter(col("o_orderkey") % 10 < 8)
      val state = agged(base, 1)
      val delta = agged(orders.filter(col("o_orderkey") % 10 >= 8), 1)
      // CDC retraction: the base's 5-LOW slice is deleted — negative rows
      val retract = agged(base.filter(col("o_orderpriority") === "5-LOW"), -1)
      val merged = IncrementalAgg.merge(
        state, delta.unionByName(retract),
        keys = Seq("priority"), measures = Seq("n", "revenue_dec"), countCol = "n")
      merged.select(col("priority"), col("n"),
        col("revenue_dec").cast("double").as("revenue"))
    },

    // Q9: column profile — the schema-profiling complement to q5's FD
    // audit: per column, row count, null count, exact distinct count, and
    // min/max (serialized to strings so one report schema covers integer
    // and text columns; ASCII-only values keep binary order == DuckDB
    // collation). ONE scan computes every measure in a single aggregate
    // row which then unpivots to the per-column report — profiling N
    // columns costs one pass, not N.
    QueryDef.sql(
      "q9_column_profile",
      """WITH a AS (SELECT COUNT(*) AS n,
        |  COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
        |  COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
        |    CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
        |  COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
        |    MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
        |  COUNT(o_orderpriority) AS c4, COUNT(DISTINCT o_orderpriority) AS d4,
        |    MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4
        |  FROM orders)
        |SELECT 'o_orderkey' AS column_name, n, n - c1 AS n_null, d1 AS n_distinct,
        |       mn1 AS min_value, mx1 AS max_value FROM a
        |UNION ALL SELECT 'o_custkey', n, n - c2, d2, mn2, mx2 FROM a
        |UNION ALL SELECT 'o_orderstatus', n, n - c3, d3, mn3, mx3 FROM a
        |UNION ALL SELECT 'o_orderpriority', n, n - c4, d4, mn4, mx4 FROM a""".stripMargin) { (spark, dir) =>
      val o = Tables.load(spark, dir, "orders")
      val a = o.agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("c1"), count_distinct(col("o_orderkey")).as("d1"),
        min(col("o_orderkey")).cast("string").as("mn1"),
        max(col("o_orderkey")).cast("string").as("mx1"),
        count(col("o_custkey")).as("c2"), count_distinct(col("o_custkey")).as("d2"),
        min(col("o_custkey")).cast("string").as("mn2"),
        max(col("o_custkey")).cast("string").as("mx2"),
        count(col("o_orderstatus")).as("c3"), count_distinct(col("o_orderstatus")).as("d3"),
        min(col("o_orderstatus")).as("mn3"), max(col("o_orderstatus")).as("mx3"),
        count(col("o_orderpriority")).as("c4"), count_distinct(col("o_orderpriority")).as("d4"),
        min(col("o_orderpriority")).as("mn4"), max(col("o_orderpriority")).as("mx4"))
      // Unpivot by EXPLODING structs over the single aggregate row — a
      // union of per-column selects would reference the agg subtree once
      // per column and Spark re-executes it each time (4 scans, measured);
      // this keeps exactly one scan + one aggregate in the plan.
      def entry(name: String, i: Int) = struct(
        lit(name).as("column_name"), col("n").as("n"),
        (col("n") - col(s"c$i")).as("n_null"), col(s"d$i").as("n_distinct"),
        col(s"mn$i").as("min_value"), col(s"mx$i").as("max_value"))
      a.select(explode(array(
          entry("o_orderkey", 1), entry("o_custkey", 2),
          entry("o_orderstatus", 3), entry("o_orderpriority", 4))).as("r"))
        .select(col("r.*"))
    },

    // J25: BUCKETED CO-LOCATED JOIN — the one-time-layout-cost recipe
    // that removes the recurring fact⋈fact shuffle at 100 TB: both sides
    // are written through io/Layout.writeBucketed (8 buckets on the join
    // key), then joined via the table catalog, where matching keys
    // already live in matching buckets. The ORACLE is a plain join on the
    // raw parquet — layout must never change values, only the plan
    // (LayoutSpec pins the zero-Exchange physical shape with broadcast
    // disabled; under the gate's default session a small build side may
    // still broadcast, which is equally shuffle-free). This is the one
    // DRIVER-hashed row over the bucketed read path — the local plan pins
    // alone would never catch a value-corrupting layout bug.
    QueryDef.sql(
      "j25_bucketed_colocated_join",
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
        .select("o_custkey", "o_totalprice")
      val cust = Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      graft.io.Layout.writeBucketed(
        orders, "graft_bkt_orders", "o_custkey", 8, sortCol = Some("o_custkey"))
      graft.io.Layout.writeBucketed(
        cust, "graft_bkt_customer", "c_custkey", 8, sortCol = Some("c_custkey"))
      graft.io.Layout
        .colocatedJoin(spark, "graft_bkt_orders", "graft_bkt_customer",
          "o_custkey", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          Num.sumMoney(col("o_totalprice")).as("total_price"))
    })
}
