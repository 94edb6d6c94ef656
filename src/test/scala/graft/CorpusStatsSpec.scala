package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-independent pins for the round-5 relational-stats / sparse-
  * similarity operators (a18, e15, t19, d22, d23): each is recomputed
  * naively (collect + plain Scala) on the smoke-tier corpus and compared
  * to the distributed result, so the DuckDB gate is not the only line of
  * defense for their semantics.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** The exact token stream the engine uses: lower(trim(text)) split on
    * \s+ with trailing empties kept (Spark's split limit = -1). Spark's
    * trim strips SPACES only — Java's String.trim (all whitespace ≤ U+0020)
    * would diverge on leading/trailing tabs/newlines. */
  private def toks(text: String): Seq[String] = {
    var s = 0; var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    // Locale.ROOT matches the engine's UTF8String.toLowerCase on ASCII
    // text (the test corpus); the default-locale String.toLowerCase would
    // diverge on tr_TR 'I'. Non-ASCII text is NOT locale-invariant in the
    // engine either (UTF8String falls back to the default locale there) —
    // this helper only claims parity for the ASCII corpus it runs on.
    text.substring(s, e).toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq
  }

  private lazy val docs: Seq[(Long, Seq[String])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toSeq

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("d22: distributed TF-cosine pairs == naive all-pairs recompute") {
    // token-stats convention: empty tokens are not terms (d22 filters them)
    val tf = docs.map { case (id, ts) =>
      id -> ts.filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val n2 = tf.map { case (id, m) => id -> m.values.map(v => v * v).sum }.toMap
    val naive = (for {
      (ia, ma) <- tf; (ib, mb) <- tf if ia < ib
      dot = ma.keysIterator.filter(mb.contains).map(k => ma(k) * mb(k)).sum
      if dot > 0
      cos = dot.toDouble / math.sqrt(n2(ia).toDouble * n2(ib).toDouble)
      if cos >= 0.9
    } yield (ia, ib, round6(cos))).toSet
    val got = SparkEntry.queries("d22_tf_cosine_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == naive)
  }

  test("d22 sparse regime (prefix filter, forced) == dense regime == naive") {
    // the tiny test vocabulary makes the stats probe always pick dense, so
    // force the sparse All-Pairs prefix-filter plan and require identical
    // output — no false negatives at the candidate-generation bound
    val dense = SparkEntry.queries("d22_tf_cosine_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sparse = graft.queries.DedupQueries
      .tfCosinePairs(spark, dir, denseVocabMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sparse == dense, "regimes must agree pair-for-pair, bit-for-bit")
    assert(dense.nonEmpty, "test corpus must exercise the ≥0.9 band")
  }

  test("d23: distributed containment pairs == naive recompute, both directions") {
    val sh = docs.map { case (id, ts) =>
      id -> (if (ts.size >= 3) ts.sliding(3).map(_.mkString(" ")).toSet else Set.empty[String])
    }
    val naive = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia != ib
      inter = (sa & sb).size
      if inter > 0
      c = inter.toDouble / sa.size.toDouble
      if c >= 0.9
    } yield (ia, ib, round6(c))).toSet
    val got = SparkEntry.queries("d23_containment_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == naive)
  }

  test("a18: moment-form corr/covar == BigDecimal fold per group; corr in [-1,1]") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP))))
    val naive = rows.groupBy(_._1).map { case (g, xs) =>
      val (qs, ps) = xs.map(_._2).unzip
      val n = xs.size.toDouble
      val (sx, sy) = (qs.sum.toDouble, ps.sum.toDouble)
      val sxy = qs.lazyZip(ps).map(_ * _).sum.toDouble
      val sxx = qs.map(q => q * q).sum.toDouble
      val syy = ps.map(p => p * p).sum.toDouble
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      val corr = if (vx > 0 && vy > 0) Some(cov / (math.sqrt(vx) * math.sqrt(vy))) else None
      g -> (xs.size.toLong, corr.map(round6), round6(cov / n / n))
    }
    val got = SparkEntry.queries("a18_grouped_corr")(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4))
    }.toMap
    assert(got == naive)
    got.values.flatMap(_._2).foreach(c => assert(c >= -1.0 && c <= 1.0))
  }

  test("e15: transition count conservation — every user with n events emits n-1") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val totalEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val out = SparkEntry.queries("e15_event_transitions")(spark, dir).collect()
    val totalTransitions = out.map(_.getLong(2)).sum
    assert(totalTransitions == totalEvents - nUsers)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "distinct-user support cannot exceed count")
      assert(r.getLong(3) >= 1)
    }
  }

  test("t19: top-20 collocations == naive recount under (n desc, bigram asc)") {
    val counts = docs.flatMap { case (id, ts) =>
      if (ts.size >= 2) ts.sliding(2).map(b => (b.mkString(" "), id)) else Iterator.empty
    }
    val naive = counts.groupBy(_._1).map { case (bg, xs) =>
      (bg, xs.size.toLong, xs.map(_._2).distinct.size.toLong)
    }.toSeq.sortBy { case (bg, n, _) => (-n, bg) }.take(20)
    val got = SparkEntry.queries("t19_bigram_collocations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive)
  }
}
