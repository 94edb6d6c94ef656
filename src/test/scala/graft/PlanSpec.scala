package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape pins — the scale properties that make these queries
  * survive a 100 TB / 1000-executor deployment, asserted so a refactor
  * can't silently regress them:
  *
  *  - column pruning reaches the parquet scan (a 5-column aggregate must
  *    not read 16-column lineitem rows);
  *  - join-key null filters are pushed into the scan (PushedFilters);
  *  - dimension joins broadcast (no sort-merge shuffle of the fact table);
  *  - aggregation is partial (map-side combine) before its one shuffle;
  *  - the broadcast top-k similarity path is shuffle-free end to end.
  *
  * Plans are inspected pre-execution (AQE initial plan): these are static
  * planning guarantees, not runtime accidents.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: map-side partial aggregation, exactly one shuffle, pruned scan") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("partial_int128sum"), "expected map-side partial aggregation")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "q1 must shuffle exactly once (group-by)")
    assert(!p.contains("l_orderkey") && !p.contains("l_shipdate"),
      "lineitem scan must prune to the 5 aggregate input columns")
  }

  test("j9: only the true dimension is hint-broadcast; fact edges are not") {
    // Simulate fact scale by disabling size-based auto-broadcast: whatever
    // still broadcasts is hint-FORCED and would be collected to the driver
    // at 100 TB. Exactly one broadcast may survive — the 25-row nation dim;
    // the lineitem⋈orderNation and orders⋈customer edges must fall back to
    // shuffle strategies.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("j9_revenue_per_nation")
      assert("BroadcastHashJoin".r.findAllIn(p).size == 1,
        "only the hinted nation dimension may broadcast at fact scale")
      assert(p.contains("PushedFilters: [IsNotNull"),
        "join-key null filters must reach the parquet scan")
      // r7 shape: lineitem pre-aggregates PER ORDER below the fact-fact
      // join — the partial combine shrinks the dominant shuffle ~4x
      // (TPC-H orders hold ≤7 items). Pin: an aggregate keyed on
      // l_orderkey must sit under the join.
      assert(p.contains("HashAggregate(keys=[l_orderkey"),
        "lineitem must pre-aggregate per orderkey before joining orders")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("f1: filter is evaluated at the scan (DataFilters)") {
    val p = planOf("f1_normalized_eq_filter")
    // handleId is now the Unicode-White_Space regexp strip; the predicate
    // must still reach the scan's DataFilters (and the not-null derivative
    // must push all the way into the parquet reader as a PushedFilter).
    assert(p.contains("DataFilters: [isnotnull(l_returnflag") &&
      p.contains("lower(regexp_replace(l_returnflag"),
      s"normalized-equality predicate must be applied at the scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)"),
      "derived not-null must push into the parquet reader")
  }

  test("d5 broadcast top-k: no pair-space shuffle") {
    val p = planOf("d5_embedding_topk")
    // The only Exchange allowed is the round-robin fan-out of the linear
    // query stream (and only when the scan arrives under-partitioned);
    // the O(n²) pair space must never hit a hash shuffle.
    assert(!p.contains("Exchange hashpartitioning"),
      "broadcast-index top-k must not shuffle the pair space")
  }

  test("shuffle-hash hint replaces sort-merge when broadcast is off") {
    import org.apache.spark.sql.functions.col
    val orders = graft.io.Tables.load(spark, dir, "orders")
    val lineitem = graft.io.Tables.load(spark, dir, "lineitem")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(smj.contains("SortMergeJoin"), "baseline without hint is SMJ")
      val shj = lineitem.join(orders.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(shj.contains("ShuffledHashJoin"),
        "hint must select the sort-free hash join (build side = orders)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("f4 semi-join: stays a join, never a collected key list") {
    val p = planOf("f4_semi_join_fk_filter")
    assert(p.contains("LeftSemi"), "FK validity must be a semi join")
  }

  test("w2 top-k per group: single shuffle then window") {
    val p = planOf("w2_topk_per_group")
    assert(p.contains("Window"), "expected window physical operator")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "one partition-by shuffle only")
  }

  test("j13: orphan detection is an anti JOIN, never a key-list collect") {
    val p = planOf("j22_anti_join_orphans")
    assert(p.contains("LeftAnti"), "must plan as a left anti join")
    assert(!p.contains("NestedLoop"), "anti join must stay hash-based")
  }

  test("scan-only text operators: zero shuffles") {
    for (q <- Seq("t7_pii_scrub", "t8_repetition_score", "d10_contamination")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q must be a pure scan-level transform")
    }
  }

  test("t10 sequence packing: exactly one shard-key shuffle") {
    val p = planOf("t10_sequence_pack")
    assert(p.contains("Window"), "packing is a running-window plan")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "one partition-by-source shuffle only — never a global serial pack")
  }

  test("e7 gap fill: spine join stays equi, no nested loop") {
    val p = planOf("e7_gap_fill")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "the hour spine must join back on (type, hour) keys")
    assert(p.contains("Generate explode"), "spine comes from sequence()+explode")
  }

  test("e9 funnel: one events scan, windows share one user-key partitioning") {
    val p = planOf("e9_funnel_stages")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "the chained conditional mins must not re-scan events")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "all three window aggregates share a single user-key exchange")
  }

  test("e8 cohorts: one events scan (window cohort, no join-back)") {
    val p = planOf("e8_retention_cohorts")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "cohort assignment must not aggregate-then-rejoin the scan")
  }

  test("t11 tf-idf: corpus count is a broadcast, not a collected scalar") {
    val p = planOf("t11_tfidf_top_terms")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row corpus count must arrive via broadcast")
    assert(p.contains("Window"), "per-doc top-k is a window")
  }

  test("e10 SCD2: lag and lead share ONE user-key exchange") {
    val p = planOf("e10_scd2_history")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "change-detect (lag) and interval-close (lead) must reuse the same partitioning")
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("e11 sliding windows: generator expansion at the scan, one agg shuffle") {
    val p = planOf("e11_sliding_windows")
    assert(p.contains("Expand"),
      "window membership must expand via the static 4-projection Expand, not a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "only the final aggregate shuffles")
  }

  test("e12 snapshot diff: full outer join on the key, no nested loop") {
    val p = planOf("e12_snapshot_diff")
    assert(p.contains("FullOuter"), "reconciliation is a FULL OUTER equi-join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"))
  }

  test("j15/d17 blocked pairing: candidate pairs come from equi-joins, never nested loops") {
    for (q <- Seq("j24_fuzzy_blocked_match", "d17_semdedup")) {
      val p = planOf(q)
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"$q must block on an equi key — all-pairs shapes do not survive scale")
    }
  }

  test("t15 mixture plan: totals ride a broadcast, not a second shuffle chain") {
    val p = planOf("t15_mixture_plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row totals frame must broadcast")
  }

  test("d19 boilerplate: one shingling pass, window df-count, no self-join") {
    val p = planOf("d19_boilerplate_ngrams")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"gram document frequency must ride a window, not a second scan branch:\n$p")
    assert(!p.contains("Join"), s"d19 needs no join:\n$p")
  }

  test("d15/d16 embedding ops: posexplode at the scan, no joins") {
    for (q <- Seq("d15_embedding_centroids", "d16_embedding_normalize")) {
      val p = planOf(q)
      assert(p.contains("Generate posexplode"), s"$q expands long-form at the scan")
      assert(!p.contains("Join"), s"$q needs no join")
    }
  }

  test("d23 containment: candidates from equi-joins only, never all-pairs") {
    val p = planOf("d23_containment_pairs")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"d23 must generate candidates via the inverted-index equi-join:\n$p")
  }

  test("d22 dense regime: broadcast pair stream, no shuffle-side cartesian") {
    // the test corpus has a tiny vocabulary, so d22's stats probe picks the
    // dense plan: all-pairs IS the answer there, and it must ride a
    // BROADCAST nested loop (no pair-space exchange), never a shuffle
    // cartesian. The sparse prefix-filter regime is forced and
    // equality-pinned in CorpusStatsSpec (denseVocabMax = 0).
    val p = planOf("d22_tf_cosine_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"dense d22 pairs must come from the broadcast side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"d22 must never shuffle the pair space:\n$p")
  }

  test("a19 min-max scaling: group bounds broadcast back, no fact-side shuffle join") {
    val p = planOf("a19_minmax_normalize")
    assert(p.contains("BroadcastHashJoin"),
      s"bounds join-back must broadcast the |groups|-sized frame:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the fact table must not shuffle for the bounds join:\n$p")
  }

  test("j17 snowflake: only the two true dimensions are hint-broadcast at fact scale") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("j17_snowflake_rollup")
      assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
        "exactly nation and region may broadcast; fact edges stay strategy-free")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("e23 interval coverage: sweep windows and both rollups share ONE user-key exchange") {
    val p = planOf("e23_interval_coverage")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "running-max, island numbering, and the (user,island)/(user) aggregates " +
        "must all reuse the user-key partitioning")
  }

  test("e20 path trigrams: both leads share ONE user-key exchange") {
    val p = planOf("e20_path_trigrams")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "lead(1) and lead(2) must ride the same user-key partitioning")
  }

  test("e21 inter-arrival: bucketed lag — no window partitioned by type alone") {
    // r17: the type-keyed lag window moved onto GroupedLag (a handful of
    // event types over the fact table was one task per type — the t87
    // class). The OLD pin (one shared event_type exchange) traded a
    // shuffle for an unbounded task; the property that matters at scale
    // is now: every window partitions by (type, key-bucket), never by
    // type alone. The aggregate re-shuffles, but map-side combine means
    // that exchange carries |types| rows.
    val p = planOf("e21_interarrival_stats")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("_gl_pid"), s"type-only window: $w"))
  }

  test("e22 nearest join: as-of unions + equi-joins only, never a theta join") {
    val p = planOf("e22_nearest_event_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"nearest-event must ride the as-of machinery, not a per-key theta join:\n$p")
  }

  test("e17 rolling distinct: bounded explode + broadcast day spine, no range join") {
    val p = planOf("e17_rolling_distinct")
    assert(p.contains("Generate explode"),
      s"each (day,user) pair expands to its ≤7 window-end days at the scan:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"the day spine must equi-join, never a theta range join:\n$p")
  }

  test("j18 shipping priority: top-k is TakeOrdered, filters reach all three scans") {
    val p = planOf("j18_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top 10 must be per-partition heaps, not a global sort:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter pushed to customer scan")
    assert(p.contains("GreaterThan(l_shipdate"), "ship-date filter pushed to lineitem scan")
    assert(p.contains("LessThan(o_orderdate"), "order-date filter pushed to orders scan")
  }

  test("j19 local supplier volume: same-nation constraint joins equi, never filters post-join") {
    val p = planOf("j19_local_supplier_volume")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"the customer=supplier nation constraint must ride the hash join key:\n$p")
  }

  test("f6 NOT EXISTS: decorrelates to an anti join, never a key-list collect") {
    val p = planOf("f6_not_exists_sql")
    assert(p.contains("LeftAnti"), s"correlated NOT EXISTS must plan as left-anti:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"decorrelation must produce an equi anti join:\n$p")
  }

  test("f7 scalar subquery: threshold rides a subquery broadcast, not a cross join") {
    val p = planOf("f7_scalar_subquery_sql")
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"the average must evaluate as a scalar subquery:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"a 1-row threshold must never cross-join the aggregate:\n$p")
  }

  test("a28 column profile: four COUNT(DISTINCT)s share ONE customer scan via Expand") {
    val p = planOf("a28_column_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"the whole profile must read customer exactly once:\n$p")
    assert(p.contains("Expand"),
      s"multi-distinct must plan as one Expand aggregate, not per-column scans:\n$p")
  }

  test("w8 grouped top-k: partial-combine aggregate, no Window, no global sort") {
    val p = planOf("w8_grouped_topk")
    assert(!p.contains("Window"),
      s"the TopKByScore aggregate must REPLACE the window plan:\n$p")
    assert(p.contains("partial_topk") || p.contains("partial_graft"),
      s"top-k must combine map-side before its one shuffle:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one group-key shuffle only:\n$p")
  }

  test("w9 distribution ranks: segment-partitioned window, never SinglePartition") {
    val p = planOf("w9_distribution_ranks")
    assert(p.contains("Window"), "rank family is a window plan")
    assert(!p.contains("SinglePartition"),
      s"percent_rank/cume_dist/ntile sort within c_mktsegment slices only:\n$p")
  }

  test("e30 first-touch: one events scan, aggregates only, no per-user window") {
    val p = planOf("e30_first_touch_attribution")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"first event and first purchase fold in ONE pass over events:\n$p")
    assert(!p.contains("Window"),
      s"min_by replaces the row_number window entirely:\n$p")
  }

  test("t30 vocab index: bucketed global rank, never a SinglePartition sort") {
    val p = planOf("t30_vocab_index")
    assert(!p.contains("Exchange SinglePartition"),
      s"|vocab| rank must go through PrefixSum buckets, not one task:\n$p")
  }

  test("m3 payload dedup: content key folds at the scan; no payload-bytes shuffle") {
    val p = planOf("m3_payload_dedup")
    // The md5 grouping key surfaces as `_groupingexpression` pre-aggregation.
    assert("Exchange hashpartitioning\\((content_key|_groupingexpression)".r.findAllIn(p).nonEmpty,
      s"the one exchange must key on the 16-byte md5, not the payload:\n$p")
    assert(p.contains("md5(payload"),
      s"the content key must be computed below the exchange (at the scan side):\n$p")
    assert(p.contains("partial_"),
      s"copy counts and min ids must combine map-side before the shuffle:\n$p")
  }

  test("f8 lateral top-k: decorrelates to a group-limit window, never per-row re-execution") {
    val p = planOf("f8_lateral_topk_sql")
    assert(p.contains("WindowGroupLimit"),
      s"the correlated LIMIT must become a per-key group limit (map-side partial):\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"decorrelation must produce an equi join:\n$p")
  }

  test("q2 integrity audit: orphans via anti joins, never key-list collects or loops") {
    val p = planOf("q2_referential_integrity")
    assert("LeftAnti".r.findAllIn(p).size == 7,
      s"all seven FK relations must audit as LEFT ANTI joins:\n$p")
    // (the 1-row×1-row count crossJoins legitimately plan as BNLJ — the
    // scale-relevant property is that every ORPHAN probe is an anti join)
    assert(!p.contains("CartesianProduct"),
      s"no fact-scale cartesian anywhere:\n$p")
  }

  test("d30 degree distribution: pair candidates from equi-joins, never all-pairs") {
    val p = planOf("d30_degree_distribution")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"the shared d4 pair stage must stay inverted-index equi-joins:\n$p")
  }

  test("m4 quantization: pure scan-level array math, zero shuffles") {
    val p = planOf("m4_embedding_quantize")
    assert(!p.contains("Exchange"),
      s"quantization never changes row count or grouping — no shuffle:\n$p")
  }

  test("d32 hard negatives: broadcast best-k path, no pair-space shuffle") {
    val p = planOf("d32_hard_negatives")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the label-filtered top-k must stay on the d5 broadcast contract:\n$p")
    assert(!p.contains("Window"), s"no all-pairs rank window:\n$p")
  }

  test("t31 token salience: doc-frequency counts, totals broadcast, no cartesian") {
    val p = planOf("t31_token_salience")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row totals must ride a broadcast, never a cartesian:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"one distinct + one token aggregate — at most two keyed shuffles:\n$p")
  }

  test("t32 byte-median: both windows and the rollup share ONE source-key exchange") {
    val p = planOf("t32_byte_median_length")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"cum and tot windows plus the final agg reuse the source partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-source slices sort independently — never one task:\n$p")
  }

  test("d31 k-core: every peel round is hash joins, never all-pairs") {
    val p = planOf("d31_kcore_members")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"survivor re-induction must stay semi-joins:\n$p")
  }

  test("d35 repeated spans: partial window agg, semi join, no pair fan-out") {
    val p = planOf("d35_repeated_spans")
    // skew-safe by construction: the window-frequency aggregate must
    // partial-combine map-side (a stop-phrase window collapses before the
    // shuffle), the flag join must be LEFT SEMI (output ≤ left side), and
    // no pairwise join shape may appear anywhere.
    assert(p.contains("partial_count(distinct"),
      s"window distinct-doc agg must partial-combine map-side:\n$p")
    assert(p.contains("LeftSemi"),
      s"the flagged-position join must be a semi join:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"no pair space may materialize:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"island merge partitions by doc_id, never one task:\n$p")
  }

  test("t34/t35 global packing: bucketed prefix sum, never a serial global window") {
    for (q <- Seq("t34_sequence_packing", "t35_packed_sequences")) {
      val p = planOf(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q: the global running sum must ride range buckets, not one task:\n$p")
      assert(p.contains("Window"), s"$q: per-bucket running-sum window expected:\n$p")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
        s"$q: bucket offsets must attach as a broadcast, not a shuffle join:\n$p")
    }
  }

  test("d36 novelty: bloom probe at the scan, anti join only on the sketch-positive branch") {
    val p = planOf("d36_incremental_novelty")
    assert(p.contains("bloommightcontainlong"),
      s"bloom routing probe must appear as a scan-level filter:\n$p")
    assert(p.contains("LeftAnti"), s"exact clearing join must be ANTI:\n$p")
    assert(p.contains("Union"),
      s"definitely-novel rows bypass the join via a union branch:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"novelty must never plan a pair space:\n$p")
  }

  test("d37 edit near-dup: candidates from the prefix-block equi-join, never all-pairs") {
    val p = planOf("d37_edit_near_dup")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"blocking must keep the pair space an equi-join:\n$p")
    assert(p.contains("levenshtein"),
      s"verify stays in the codegen'd expression layer:\n$p")
  }

  test("j21 geo join: candidates from the cell equi-join; the only nested loop is the 9-row ring") {
    val p = planOf("j21_geo_grid_join")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
      s"exactly one nested loop — the constant 3×3 offset ring broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the point-point pair space must never materialize:\n$p")
    assert(p.contains("cx") && p.contains("cy"),
      s"candidate generation must join on the grid cell id:\n$p")
  }

  test("t36 bigram PMI: ONE corpus scan; unigram/total stats are rollups of the cached pair aggregate") {
    val p = planOf("t36_bigram_pmi")
    // toString re-prints the cached relation's defining FileScan under
    // every InMemoryTableScan — so "one corpus scan" pins as: every
    // FileScan occurrence is the cached relation's definition (counts
    // match), and all three consumers read through the cache.
    val fileScans = "FileScan parquet".r.findAllIn(p).size
    val cachedDefs = "InMemoryRelation".r.findAllIn(p).size
    assert(fileScans == cachedDefs && fileScans > 0,
      s"every corpus scan must be the cached pair-aggregate's definition " +
        s"($fileScans scans vs $cachedDefs cache defs):\n$p")
    // r18: BoundedCaches registers NAMED cache entries and re-roots
    // consumers on them, so the cache read renders as "Scan In-memory
    // table graft.bounded" (logical form) / "InMemoryTableScan"
    // (physical form) depending on where in the plan text it appears —
    // count both spellings.
    val cacheReads = "InMemoryTableScan".r.findAllIn(p).size +
      "Scan In-memory table".r.findAllIn(p).size
    assert(cacheReads >= 3,
      s"c_ab, c_w, and N must all read the shared cached frame:\n$p")
  }

  test("t4/d3 run their native one-pass expressions, not the HOF folds they replaced") {
    // The HOF formulations are O(len²)/O(features×64) interpreted loops
    // (16 s and 4 s of the sf0.1 verify pass respectively); a refactor
    // that silently reverts to transform/aggregate shows up here as the
    // native expression vanishing from the executed plan.
    val t4 = planOf("t4_fingerprint")
    assert(t4.contains("graft_polynomial_hash"),
      s"t4 must fingerprint via the native PolynomialHash expression:\n$t4")
    assert(!t4.contains("aggregate(transform(sequence"),
      "t4 must not re-introduce the per-character HOF fold")
    val d3 = planOf("d3_simhash_pairs")
    assert(d3.contains("graft_simhash64"),
      s"d3 must sign via the native SimHash64 expression:\n$d3")
  }
}
