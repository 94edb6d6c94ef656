package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-6 additions (u5, w7, a25, a26, e26, t28)
  * beyond the DuckDB hash gate: multiset algebra for the ALL set ops,
  * frame semantics for the value windows, and conservation laws for the
  * profile aggregates.
  */
class QueryFamilySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sfDir

  test("u5: INTERSECT ALL + EXCEPT ALL multiplicities reconstruct the left multiset") {
    // |A ∩all B| per value = min(countA, countB); |A \all B| = max(0, countA - countB);
    // together they partition A's multiset: countA = inter + except.
    val customer = graft.io.Tables.load(spark, dir, "customer")
    val countsBySeg = customer
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)) -> r.getLong(2)).toMap
    val nations = countsBySeg.keys.map(_._1).toSeq.distinct
    val out = SparkEntry.queries("u6_setops_all")(spark, dir)
      .groupBy(col("nid"), col("op")).count()
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1)) -> r.getLong(2)).toMap
    nations.foreach { n =>
      val a = countsBySeg.getOrElse((n, "BUILDING"), 0L)
      val b = countsBySeg.getOrElse((n, "MACHINERY"), 0L)
      assert(out.getOrElse((n, "intersect_all"), 0L) == math.min(a, b),
        s"nation $n: intersect_all multiplicity")
      assert(out.getOrElse((n, "except_all"), 0L) == math.max(0L, a - b),
        s"nation $n: except_all multiplicity")
    }
  }

  test("w7: first <= last in event-time order; second_ok null iff the customer has one order") {
    val out = SparkEntry.queries("w7_value_windows")(spark, dir).cache()
    try {
      val sizes = out.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("first_ok")).as("nf"),
          countDistinct(col("last_ok")).as("nl"),
          sum(when(col("second_ok").isNull, 1).otherwise(0)).as("nulls"))
      // first/last are partition-constant; nth_value(2) is null exactly for
      // singleton partitions (and never null otherwise, orderkey >= 1).
      assert(sizes.filter(col("nf") =!= 1 || col("nl") =!= 1).count() == 0)
      assert(sizes.filter((col("n") === 1 && col("nulls") =!= col("n")) ||
        (col("n") > 1 && col("nulls") =!= 0)).count() == 0)
    } finally out.unpersist()
  }

  test("a25: digits are 1-9 and shares sum to 1 over the full distribution") {
    val rows = SparkEntry.queries("a25_benford_digits")(spark, dir).collect()
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9),
      "a positive DECIMAL(12,2) leads with 1-9")
    val share = rows.map(_.getDouble(2)).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to ~1, got $share")
  }

  test("a26: filtered counts are bounded by the group size; bool aggs match recompute") {
    val orders = graft.io.Tables.load(spark, dir, "orders")
    val base = orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("has_p"))
    val out = SparkEntry.queries("a26_filtered_bool_aggs")(spark, dir)
      .join(base, "o_orderpriority")
    assert(out.filter(col("n_finished") > col("n") || col("n_big") > col("n")).count() == 0)
    assert(out.filter(col("all_over_1k") =!= (col("min_price") > 1000)).count() == 0)
    assert(out.filter(col("any_pending") =!= (col("has_p") === 1)).count() == 0)
  }

  test("e26: dow in 1-7 (ISO), hr in 0-23, and event counts conserve the table total") {
    val out = SparkEntry.queries("e26_weekday_hour_profile")(spark, dir).cache()
    try {
      assert(out.filter(col("dow") < 1 || col("dow") > 7 ||
        col("hr") < 0 || col("hr") > 23).count() == 0)
      val total = out.agg(sum(col("n_events"))).head().getLong(0)
      assert(total == graft.io.Tables.load(spark, dir, "events").count(),
        "cells partition the event set")
    } finally out.unpersist()
  }

  test("j18: at most 10 rows, revenue strictly ordered, only pre-cutoff orders") {
    val rows = SparkEntry.queries("j18_shipping_priority")(spark, dir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.drop(1)).forall { case (a, b) => a >= b }, "descending revenue")
    val cutoff = java.time.LocalDateTime.parse("1998-06-01T00:00:00")
    assert(rows.forall(_.getAs[java.time.LocalDateTime](2).isBefore(cutoff)),
      "order date < cutoff")
  }

  test("j19: local-volume revenue is a subset of j9's all-supplier revenue per nation") {
    val all = SparkEntry.queries("j9_revenue_per_nation")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val local = SparkEntry.queries("j19_local_supplier_volume")(spark, dir).collect()
    assert(local.nonEmpty)
    local.foreach { r =>
      val nation = r.getString(0)
      assert(r.getDouble(1) <= all(nation) + 1e-6,
        s"$nation: same-nation revenue cannot exceed total revenue")
    }
  }

  test("e27: buckets in 0-9 and counts conserve the event total") {
    val out = SparkEntry.queries("e27_value_histogram")(spark, dir).cache()
    try {
      assert(out.filter(col("bucket") < 0 || col("bucket") > 9).count() == 0)
      val total = out.agg(sum(col("n"))).head().getLong(0)
      assert(total == graft.io.Tables.load(spark, dir, "events").count())
    } finally out.unpersist()
  }

  test("d29: admitted fingerprints are disjoint from the corpus side and unique") {
    val docs = graft.io.Tables.load(spark, dir, "documents")
    val fp = graft.functions.TextAnalysis.fingerprintMd5(col("text"))
    val corpusFps = docs.filter(col("doc_id") % 2 === 0)
      .select(fp.as("fp")).distinct().collect().map(_.getString(0)).toSet
    val out = SparkEntry.queries("d29_incremental_dedup")(spark, dir).collect()
    val admitted = out.map(_.getString(0))
    assert(admitted.distinct.length == admitted.length, "one row per fingerprint")
    assert(admitted.forall(!corpusFps.contains(_)), "no admitted fp may exist in the corpus")
    // keeper is the min doc_id of its batch-fingerprint group → odd by construction
    assert(out.forall(_.getLong(1) % 2 == 1), "keepers come from the odd-id batch")
  }

  test("e28: late counts bounded by totals; an in-order single-user stream has zero late") {
    val out = SparkEntry.queries("e28_late_event_audit")(spark, dir)
    assert(out.filter(col("n_late") > col("n_events")).count() == 0)
    // direct semantics check on a tiny constructed frame via the same SQL shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val tiny = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), (2L, 1L, "2024-01-01 00:05:00"),
      (3L, 1L, "2024-01-01 00:20:00"), (4L, 1L, "2024-01-01 00:02:00")) // 18 min late
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val late = tiny.withColumn("hwm", max(col("ts")).over(w))
      .filter(col("hwm").isNotNull &&
        unix_micros(col("ts")) < unix_micros(col("hwm")) - 600000000L)
      .collect()
    assert(late.map(_.getLong(0)).toSeq == Seq(4L), "exactly the 18-min-late event flags")
  }

  test("a27: buckets partition the key set; rows_covered conserves the event total") {
    val out = SparkEntry.queries("a27_key_skew_profile")(spark, dir).cache()
    try {
      val events = graft.io.Tables.load(spark, dir, "events")
      assert(out.agg(sum(col("n_keys"))).head().getLong(0) ==
        events.select(col("user_id")).distinct().count(), "every key in exactly one bucket")
      assert(out.agg(sum(col("rows_covered"))).head().getLong(0) == events.count())
      // bucket upper bounds hold for the max count in each bucket
      val bounds = Map(0 -> 1L, 1 -> 2L, 2 -> 4L, 3 -> 8L, 4 -> 16L,
        5 -> 32L, 6 -> 64L, 7 -> 128L, 8 -> 256L)
      out.collect().foreach { r =>
        bounds.get(r.getInt(0)).foreach(b =>
          assert(r.getLong(2) <= b, s"bucket ${r.getInt(0)} max over bound"))
      }
    } finally out.unpersist()
  }

  test("j20: salted join output == plain join output exactly") {
    val plain = {
      val li = graft.io.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val o = graft.io.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_items"),
          graft.queries.Num.sumMoney(col("l_quantity")).as("total_qty"))
    }
    val salted = SparkEntry.queries("j20_salted_join_equivalence")(spark, dir)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting must leave no semantic trace")
  }

  test("f6: NOT EXISTS output == hand-built left-anti join") {
    val cust = graft.io.Tables.load(spark, dir, "customer")
    val orders = graft.io.Tables.load(spark, dir, "orders")
    val manual = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
    val viaSql = SparkEntry.queries("f6_not_exists_sql")(spark, dir)
    assert(viaSql.exceptAll(manual).isEmpty && manual.exceptAll(viaSql).isEmpty)
  }

  test("f7: every returned key is strictly busier than the average; none missing") {
    val oc = graft.io.Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")).cache()
    try {
      val avgN = oc.agg(avg(col("n"))).head().getDouble(0)
      val expected = oc.filter(col("n") > avgN)
      val got = SparkEntry.queries("f7_scalar_subquery_sql")(spark, dir)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    } finally oc.unpersist()
  }

  test("e29: gini in [0,1); 0 for a uniform corpus, known value for a planted split") {
    val row = SparkEntry.queries("e29_activity_gini")(spark, dir).head()
    val g = row.getDouble(0)
    assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    // closed-form check: counts (1,1,1,3) → G = 2*(1+2+3+4*3)/(4*6) - 5/4 = 0.25
    val tiny = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 3L)).toDF("user_id", "c")
    val ranked = graft.operators.PrefixSum.withRunningSum(
      tiny, "c", descending = false, tieBreak = Seq(col("user_id")),
      value = lit(1L), out = "i")
    val gTiny = ranked.agg(
      ((lit(2L) * sum(col("i") * col("c"))).cast("double") /
        (count(lit(1)) * sum(col("c"))).cast("double") -
        (count(lit(1)) + lit(1L)).cast("double") / count(lit(1)).cast("double"))
        .as("g")).head().getDouble(0)
    assert(math.abs(gTiny - 0.25) < 1e-9, s"planted gini: $gTiny")
  }

  test("t29: percentile bands are monotone and drawn from each language's values") {
    val rows = SparkEntry.queries("t29_length_bands_by_lang")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75, p95) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95,
        s"${r.getString(0)}: bands must be monotone")
    }
    // every band value must exist as an actual n_chars in that language
    val docs = graft.io.Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    rows.foreach { r =>
      val vals = docs(r.getString(0))
      Seq(2, 3, 4, 5).foreach(i => assert(vals.contains(r.getLong(i)),
        s"${r.getString(0)}: band value not an observed length"))
    }
  }

  test("p30: stop_hits ⊆ vocabulary and sorted; n_unique = hits + non-stop") {
    val stops = Set("the", "a", "of", "and", "is")
    val rows = SparkEntry.queries("p30_array_set_ops")(spark, dir).collect()
    rows.foreach { r =>
      // stop_hits is SERIALIZED to a comma-joined string (the correctness
      // driver's pandas canonicalizer cannot hash array cells)
      val joined = r.getString(1)
      val hits = if (joined.isEmpty) Seq.empty[String] else joined.split(",").toSeq
      assert(hits.forall(stops.contains), "intersect must stay inside the vocabulary")
      assert(hits == hits.sorted, "emitted elements must be sorted")
      assert(r.getInt(2) == hits.length + r.getInt(3),
        "distinct tokens partition into stop hits and non-stop")
    }
  }

  test("a28: profile conserves totals — nulls + distinct bounded by row count") {
    val n = graft.io.Tables.load(spark, dir, "customer").count()
    val rows = SparkEntry.queries("a28_column_profile")(spark, dir).collect()
    assert(rows.length == 4, "one profile row per profiled column")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= n, s"${r.getString(0)}: null_count in [0, n]")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= n - r.getLong(1),
        s"${r.getString(0)}: n_distinct bounded by non-null rows")
      assert(r.getString(3) <= r.getString(4) || r.getString(0) == "c_custkey" ||
        r.getString(0) == "c_nationkey",
        s"${r.getString(0)}: varchar min <= max")
    }
  }

  test("t30: vocab ids are contiguous 1..V and rank respects (freq desc, token asc)") {
    val rows = SparkEntry.queries("t30_vocab_index")(spark, dir)
      .collect().sortBy(_.getLong(2))
    assert(rows.head.getLong(2) == 1L && rows.last.getLong(2) == rows.length.toLong,
      "ids are contiguous from 1 with no gaps")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)),
        s"rank order violated between ${a.getString(0)} and ${b.getString(0)}")
    }
  }

  test("m3: corpus is single-byte so the oracle's char-slice == byte-slice; copies conserve docs") {
    val docs = graft.io.Tables.load(spark, dir, "documents")
    // The m3 oracle slices the first 4 bytes via left(text, 4) (DuckDB cannot
    // slice blobs); that premise requires byte length == char length.
    assert(docs.filter(length(col("text").cast("binary")) =!= length(col("text")))
      .count() == 0, "ASCII premise: octet length must equal char length")
    val out = SparkEntry.queries("m3_payload_dedup")(spark, dir).cache()
    try {
      assert(out.agg(sum(col("n_copies"))).head.getLong(0) == docs.count(),
        "every document lands in exactly one content group")
      assert(out.filter(length(col("content_key")) =!= 32).count() == 0, "md5 hex keys")
    } finally out.unpersist()
  }

  test("e30: attribution partitions users; conversions never exceed group size") {
    val out = SparkEntry.queries("e30_first_touch_attribution")(spark, dir).collect()
    val users = graft.io.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getLong(1)).sum == users, "each user attributed exactly once")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: converted <= users")
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0, s"${r.getString(0)}: rate in [0,1]")
    }
  }

  test("w8: TopKByScore aggregate == the window row_number plan it replaces") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("mo"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = graft.io.Tables.load(spark, dir, "orders")
      .select(trunc(col("o_orderdate"), "month").as("mo"),
        col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 5)
    val agg = SparkEntry.queries("w8_grouped_topk")(spark, dir)
    assert(agg.exceptAll(windowed).isEmpty && windowed.exceptAll(agg).isEmpty,
      "aggregate and window formulations must agree exactly, ties included")
  }

  test("d30: handshake lemma — sum of degree * n_nodes equals twice the pair count") {
    val pairs = SparkEntry.queries("d4_ngram_jaccard_pairs")(spark, dir).count()
    val degSum = SparkEntry.queries("d30_degree_distribution")(spark, dir)
      .agg(sum(col("degree") * col("n_nodes"))).head.getLong(0)
    assert(degSum == 2 * pairs, s"handshake lemma: $degSum != 2 * $pairs")
  }

  test("t28: char classes partition every source's characters exactly") {
    val rows = SparkEntry.queries("t28_char_class_profile")(spark, dir).collect()
    rows.foreach { r =>
      val (nc, na, nd, ns, no) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(na + nd + ns + no == nc, s"${r.getString(0)}: classes must sum to n_chars")
      assert(math.abs(r.getDouble(6) - na.toDouble / nc) < 1e-6)
    }
  }

  test("t31: chi-square is non-negative and doc-frequencies respect the 2x2 margins") {
    val docs = graft.io.Tables.load(spark, dir, "documents")
    val n = docs.count()
    val t = docs.filter(col("lang") === "en").count()
    val rows = SparkEntry.queries("t31_token_salience")(spark, dir).collect()
    assert(rows.nonEmpty, "some token must clear the df floor")
    rows.foreach { r =>
      val (df, a, chi2) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(df >= 5 && df < n, s"${r.getString(0)}: df bounds")
      assert(a <= t && a <= df && df - a <= n - t,
        s"${r.getString(0)}: margins a<=T, a<=df, b<=N-T")
      assert(chi2 >= 0.0, s"${r.getString(0)}: chi2 >= 0")
    }
  }

  test("t32: byte-median splits each source's volume at the half-byte point") {
    val docs = graft.io.Tables.load(spark, dir, "documents")
    val rows = SparkEntry.queries("t32_byte_median_length")(spark, dir).collect()
    rows.foreach { r =>
      val (src, med, tot) = (r.getString(0), r.getLong(1), r.getLong(2))
      val le = docs.filter(col("source") === src && col("n_chars") <= med)
        .agg(sum(col("n_chars"))).head.getLong(0)
      val lt = docs.filter(col("source") === src && col("n_chars") < med)
        .agg(coalesce(sum(col("n_chars")), lit(0L))).head.getLong(0)
      assert(2 * le >= tot, s"$src: bytes in docs <= median must reach half")
      assert(2 * lt < tot, s"$src: bytes strictly below median must stay under half")
    }
  }

  test("d32: hard negatives never share the query's label and rank by cosine") {
    val emb = graft.io.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val out = SparkEntry.queries("d32_hard_negatives")(spark, dir)
    val joined = out
      .join(emb.withColumnRenamed("vec_id", "q").withColumnRenamed("label", "q_label"),
        col("vec_id") === col("q"))
      .join(emb.withColumnRenamed("vec_id", "nb").withColumnRenamed("label", "n_label"),
        col("neighbor_id") === col("nb"))
    assert(joined.filter(col("q_label") === col("n_label")).count() == 0,
      "a hard negative must come from a different class")
    assert(out.groupBy("vec_id").count().filter(col("count") > 3).count() == 0,
      "at most k=3 negatives per query")
  }

  test("m4: quantization stays in int8 range with error bounded by half a step") {
    val out = SparkEntry.queries("m4_embedding_quantize")(spark, dir).cache()
    try {
      assert(out.count() ==
        graft.io.Tables.load(spark, dir, "embeddings").count(),
        "row count unchanged — quantization is a pure projection")
      assert(out.filter(col("q_min") < -127 || col("q_max") > 127).count() == 0,
        "quantized values clamp to [-127, 127]")
      assert(out.filter(col("max_abs_err") > col("scale_q") * 0.5 + 1e-5).count() == 0,
        "round-to-nearest error never exceeds half a quantization step")
    } finally out.unpersist()
  }
}
