package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Streaming pins: (1) the watermark+tumbling-window stream over the real
  * events table produces EXACTLY the batch e2 aggregation (stream/batch
  * parity); (2) the custom flatMapGroupsWithState sessionizer splits on the
  * 30-min gap.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tumbling-window stream over events == batch aggregation (up to the watermark)") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.tumblingCounts(EventStreams.readEventsStream(spark, dir))
    val qname = "tumbling_test"
    val q = stream.writeStream
      .format("memory").queryName(qname).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table(qname)
      .select("window_start", "event_type", "n", "max_value")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val events = graft.io.Tables.load(spark, dir, "events")
    // Append mode emits a window only once the watermark (max ts − 10 min)
    // passes its end — the final open windows stay in state by design.
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val horizon = new java.sql.Timestamp(maxTs - 10 * 60 * 1000L)
    val batch = events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <= lit(horizon))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
    spark.streams.active.foreach(_.stop())
  }

  test("stream-static enrichment == batch dimension join (stateless parity)") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.io.Tables.load(spark, dir, "events")
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(3))))
    val stream = EventStreams.enrichWithDim(
      EventStreams.readEventsStream(spark, dir), dim, "user_id")
      .select("event_id", "user_id", "segment")
    val q = stream.writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("enrich_test").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = events.join(dim, Seq("user_id"), "left")
      .select("event_id", "user_id", "segment").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch && batch.nonEmpty,
      "a stateless dimension join must emit every event exactly once")
    spark.streams.active.foreach(_.stop())
  }

  test("sliding-window stream over events == batch e11 (up to the watermark)") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.slidingCounts(EventStreams.readEventsStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("sliding_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sliding_test").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val events = graft.io.Tables.load(spark, dir, "events")
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val horizonEpoch = maxTs / 1000L - 10 * 60
    val batch = SparkEntry.queries("e11_sliding_windows")(spark, dir)
      .filter(col("window_start") + 3600 <= horizonEpoch)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch && batch.nonEmpty)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming corpus clean == batch d9 pipeline (backfill parity)") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.cleanCorpusStream(
      EventStreams.readDocumentsStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("clean_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("clean_test")
      .select("doc_id", "fp", "n_tokens").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = SparkEntry.queries("d9_clean_corpus")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // Same gates, same fingerprints; within a single backfill file the
    // arrival order is row order, so first-arrival dedup keeps the same
    // doc as batch's min-doc_id window.
    assert(streamed == batch && batch.nonEmpty)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming near-dup gate == batch LSH candidate pairs (stateless stream-static join)") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.io.Tables.load(spark, dir, "documents")
    val hashed = docs.select(col("doc_id").as("id"),
      array_distinct(graft.functions.expr.HashedWordShingles(col("text"), 3)).as("hs"))
    val index = graft.functions.MinHashLSH.bandIndex(hashed, "id", "hs")

    val gate = EventStreams.nearDupCandidatesStream(
      EventStreams.readDocumentsStream(spark, dir), index)
    val q = gate.writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // Candidates may repeat across bands by contract; compare as unordered
    // distinct pairs against the batch self-join (which emits id_a < id_b).
    val streamed = spark.table("neardup_test").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    val batch = graft.functions.MinHashLSH.candidatePairs(hashed, "id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming clean→JSONL export: exactly-once file sink, content == batch d9") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_sjsonl").toString
    val clean = EventStreams.cleanCorpusStream(
      EventStreams.readDocumentsStream(spark, dir))
    val q = graft.io.JsonlExport.streamWriter(clean, s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start(s"$out/data")
    q.awaitTermination(120000)
    val batch = SparkEntry.queries("d9_clean_corpus")(spark, dir)
    val back = graft.io.JsonlExport.read(spark, s"$out/data", batch.schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = batch.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(back == want && want.nonEmpty,
      "JSONL shards must round-trip the streaming clean exactly")
    spark.streams.active.foreach(_.stop())

    // exactly-once under restart: re-running the SAME query against the
    // SAME checkpoint re-delivers nothing — the sink's WAL already marks
    // the source files committed, so the output directory is unchanged
    val q2 = graft.io.JsonlExport.streamWriter(
        EventStreams.cleanCorpusStream(EventStreams.readDocumentsStream(spark, dir)),
        s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start(s"$out/data")
    q2.awaitTermination(120000)
    val after = graft.io.JsonlExport.read(spark, s"$out/data", batch.schema).count()
    assert(after == want.size.toLong,
      "restart against the same checkpoint must not duplicate shards")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming snapshot-novelty gate == batch d36 semantics (bloom-routed anti join)") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.io.Tables.load(spark, dir, "documents")
    val prior = all.filter(col("doc_id") % 10 < 7)
    // stream side: admit only fingerprints absent from the prior snapshot
    val gate = EventStreams.novelAgainstSnapshot(
      EventStreams.readDocumentsStream(spark, dir).filter(col("doc_id") % 10 >= 7),
      prior)
    val q = gate.writeStream.format("memory").queryName("novelty_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("novelty_test").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = all.filter(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
      .join(prior.select(md5(lower(trim(col("text")))).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .collect().map(r => (r.getLong(1), r.getString(0))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "sf0.001 batch should contain novel docs")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming decontamination hit stream == batch eval-overlap hits (d65's twin)") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.io.Tables.load(spark, dir, "documents")
    val evalSlice = all.filter(col("doc_id") % 10 === 7)
    val gate = EventStreams.contaminationHitsStream(
      EventStreams.readDocumentsStream(spark, dir).filter(col("doc_id") % 10 =!= 7),
      evalSlice, n = 13)
    val q = gate.writeStream.format("memory").queryName("contam_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("contam_test").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // batch twin: the exact exploded semi-join underlying d65's n_overlap
    val evalSh = evalSlice.select(explode(
      graft.functions.expr.WordShingleStrings(col("text"), 13)).as("g")).distinct()
    val batch = all.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), explode(
        graft.functions.expr.WordShingleStrings(col("text"), 13)).as("g"))
      .join(evalSh, Seq("g"), "left_semi")
      .select(col("doc_id"), col("g")) // using-join puts the key first
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "sf0.001 must contain planted eval overlap")
    // doc-level consistency with the batch operator: hit docs == flagged docs
    val flagged = graft.functions.Decontaminate.flagOverlap(
      all.filter(col("doc_id") % 10 =!= 7), evalSlice, "doc_id", "text",
      n = 13, minOverlap = 1L, maxDf = 0L)
      .filter(col("contaminated")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(streamed.map(_._1) == flagged,
      "hit-stream doc set must equal the batch contaminated set")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming quality-model gate == batch t57 scorer (stateless fold form)") {
    val dir = "/root/testdata/sf0.001"
    import graft.functions.QualityModel
    val wmap = QualityModel.gateWeights(spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gate = EventStreams.qualityGateStream(
      EventStreams.readDocumentsStream(spark, dir),
      wmap, QualityModel.gateBuckets, QualityModel.gateBiasFp,
      QualityModel.gateThresholdFp)
    val q = gate.writeStream.format("memory").queryName("qm_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("qm_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    val batch = QualityModel.score(
      graft.io.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text", QualityModel.gateWeights(spark),
      QualityModel.gateBuckets, QualityModel.gateBiasFp, QualityModel.gateThresholdFp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(streamed == batch, "stream gate must equal the batch t57 scorer row-for-row")
    assert(batch.exists(_._5) && batch.exists(!_._5), "both decisions present")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming WARC ingest == batch reader over the same shards") {
    val dir = "/root/testdata/sf0.001"
    import graft.io.WarcIo
    val docs = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id").cast("long").as("id"),
        concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"),
        col("text").as("body"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_stream").toString
    WarcIo.writeShards(docs.repartition(4, col("id")), tmp).collect()
    val q = WarcIo.readResponsesStream(spark, tmp)
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getInt(4), r.getString(5))
    val streamed = spark.table("warc_stream").collect().map(key).toSet
    val batch = WarcIo.readResponses(spark, tmp).collect().map(key).toSet
    assert(streamed == batch, "stream parse must equal the batch reader record-for-record")
    assert(batch.size == 100, "all planted responses present")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming WARC request ingest == batch reader over the same capture shards") {
    val dir = "/root/testdata/sf0.001"
    import graft.io.WarcIo
    val docs = graft.io.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id").cast("long").as("id"),
        concat(lit("https://example.com/doc/"), col("doc_id")).as("uri"),
        col("text").as("body"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_req_stream").toString
    WarcIo.writeShards(docs.repartition(4, col("id")), tmp, withCapture = true).collect()
    val q = WarcIo.readRequestsStream(spark, tmp)
      .writeStream.format("memory").queryName("warc_req_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getString(4), r.getString(5),
      r.getString(6), r.getString(7), r.getString(8))
    val streamed = spark.table("warc_req_stream").collect().map(key).toSet
    val batch = WarcIo.readRequests(spark, tmp).collect().map(key).toSet
    assert(streamed == batch, "stream request parse must equal the batch reader")
    assert(batch.size == 60, "all planted request records present")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming robots gate == batch verdicts, wildcard rules included") {
    val dir = "/root/testdata/sf0.001"
    import graft.functions.RobotsTxt
    val docs = graft.io.Tables.load(spark, dir, "documents")
    val robots = docs.select(col("source").as("domain")).distinct()
      .select(col("domain"), lit(
        "User-agent: *\nDisallow: /*.pdf$\nAllow: /pub/*.pdf$\nDisallow: /tmp*\nDisallow: /a/").as("txt"))
    val rules = RobotsTxt.starGroupRules(robots, "domain", "txt")
    val ruleSeq = rules.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    def urlsOf(df: org.apache.spark.sql.DataFrame) = {
      val m = pmod(col("doc_id"), lit(4L))
      df.select(col("doc_id").cast("long").as("id"), col("source").as("domain"),
        when(m === 0, concat(lit("/d"), col("doc_id"), lit(".pdf")))
          .when(m === 1, concat(lit("/pub/d"), col("doc_id"), lit(".pdf")))
          .when(m === 2, concat(lit("/tmp/x"), col("doc_id")))
          .otherwise(concat(lit("/free/f"), col("doc_id"))).as("path"))
    }
    val gate = RobotsTxt.verdictsStateless(
      urlsOf(EventStreams.readDocumentsStream(spark, dir)), "id", "domain", "path", ruleSeq)
    val q = gate.writeStream.format("memory").queryName("robots_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getString(4), Option(r.get(5)), r.getBoolean(6))
    val streamed = spark.table("robots_gate").collect().map(key).toSet
    val batch = RobotsTxt.verdicts(urlsOf(docs), "id", "domain", "path", rules)
      .collect().map(key).toSet
    assert(streamed == batch, "stateless stream gate must equal batch verdicts")
    assert(batch.exists(_._7) && batch.exists(!_._7), "both verdicts present")
    spark.streams.active.foreach(_.stop())
  }

  test("stream-stream interval join == batch join over the events table") {
    val dir = "/root/testdata/sf0.001"
    val joined = EventStreams.purchaseAttribution(EventStreams.readEventsStream(spark, dir))
    val q = joined.writeStream.format("memory").queryName("attr_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attr_test")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

    val ev = graft.io.Tables.load(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .collect().map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    spark.streams.active.foreach(_.stop())
  }

  test("streaming dedup drops replayed events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // event 1 arrives three times, event 2 twice, event 3 once
    mem.addData(
      (1L, ts(0), "click"), (1L, ts(0), "click"), (2L, ts(1), "view"),
      (1L, ts(0), "click"), (2L, ts(1), "view"), (3L, ts(2), "click"))
    val deduped = EventStreams.dedupWithinWatermark(
      mem.toDF().toDF("event_id", "ts", "event_type"), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L, 3L), s"got: ${out.mkString(",")}")
    spark.streams.active.foreach(_.stop())
  }

  test("foreachBatch CDC apply maintains the latest-state snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Boolean)]
    mem.addData((1L, 10L, "a-v1", false), (2L, 10L, "b-v1", false))
    mem.addData((1L, 20L, "a-v2", false), (2L, 20L, "del", true), (3L, 20L, "c-v1", false))

    // in-memory snapshot holder (production injects a table/parquet rewrite)
    var snapshot = Seq.empty[(Long, Long, String)].toDF("k", "ts", "v")
    val q = EventStreams.startChangeApply(
      mem.toDF().toDF("k", "ts", "v", "is_delete"),
      readSnapshot = () => snapshot,
      writeSnapshot = next => snapshot =
        spark.createDataFrame(next.collect().toList.asJava, next.schema),
      keys = Seq("k"), ts = "ts", deleteCol = "is_delete")
    q.awaitTermination(120000)

    val state = snapshot.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(state == Map(1L -> "a-v2", 3L -> "c-v1"),
      s"expected upsert+delete+insert applied, got $state")
    spark.streams.active.foreach(_.stop())
  }

  test("streaming HLL DAU: state estimates == identically-parameterized local sketches") {
    import org.apache.datasketches.hll.HllSketch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    def ts(day: Int, m: Int) = new Timestamp(1700000000000L + day * 86400000L + m * 60000L)
    // two days, overlapping users, replayed duplicate in a later batch
    mem.addData((ts(0, 1), 1L), (ts(0, 2), 2L), (ts(0, 3), 1L), (ts(1, 1), 2L))
    mem.addData((ts(0, 4), 3L), (ts(1, 2), 2L), (ts(1, 3), 9L))
    val out = EventStreams.dailyActiveUsersStream(
      mem.toDF().toDF("ts", "user_id"))
    val q = out.writeStream.format("memory").queryName("dau_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-day estimates only grow as users accrete, so the day's final
    // estimate is the max across trigger updates (order-safe)
    val got = spark.table("dau_test").groupBy("day")
      .agg(max("dau_estimate").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ref(users: Seq[Long]): Long = {
      val sk = new HllSketch(12)
      users.foreach(sk.update)
      Math.round(sk.getEstimate)
    }
    // day strings in the SESSION timezone (GraftSession pins UTC) — the
    // JVM default zone would diverge on any non-UTC machine
    val sessionZone = java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    val day0 = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .format(java.time.Instant.ofEpochMilli(ts(0, 1).getTime)
        .atZone(sessionZone).toLocalDate)
    val day1 = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .format(java.time.Instant.ofEpochMilli(ts(1, 1).getTime)
        .atZone(sessionZone).toLocalDate)
    assert(got == Map(day0 -> ref(Seq(1L, 2L, 1L, 3L)), day1 -> ref(Seq(2L, 2L, 9L))))
    // tiny cardinalities sit in the sketch's exact regime: estimate == truth
    assert(got(day0) == 3L && got(day1) == 2L)
    spark.streams.active.foreach(_.stop())
  }

  test("HLL DAU state retires on event-time timeout once the watermark clears the day") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    def ts(day: Int, m: Int) = new Timestamp(1700000000000L + day * 86400000L + m * 60000L)
    val out = EventStreams.dailyActiveUsersStream(mem.toDF().toDF("ts", "user_id"))
    val q = out.writeStream.format("memory").queryName("dau_retire_test")
      .outputMode("update").start()
    try {
      mem.addData((ts(0, 1), 1L), (ts(0, 2), 2L))
      q.processAllAvailable() // batch 1: day-0 state opens, watermark still day 0
      mem.addData((ts(2, 720), 7L))
      q.processAllAvailable() // batch 2: watermark jumps past day-0 end + retention
      mem.addData((ts(2, 721), 8L))
      q.processAllAvailable() // batch 3: timeout fires against the advanced watermark
      val day0 = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
        .format(java.time.Instant.ofEpochMilli(ts(0, 1).getTime)
          .atZone(java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone")))
          .toLocalDate)
      val day0Rows = spark.table("dau_retire_test")
        .filter(col("day") === day0).collect().map(_.getLong(1)).toSeq
      // batch 1 emitted the live estimate; the timeout re-emits the final
      // one on a batch that carried NO day-0 data — proof the timer fired
      assert(day0Rows.length >= 2, s"expected a timeout re-emit for $day0, got $day0Rows")
      assert(day0Rows.distinct == Seq(2L), s"final estimate must match the live one: $day0Rows")
    } finally {
      q.stop()
      spark.streams.active.foreach(_.stop())
    }
  }

  test("streaming first-touch == batch e30 per-user stage (tie-break, micros exact)") {
    val dir = "/root/testdata/sf0.001"
    val out = EventStreams.firstTouchStream(EventStreams.readEventsStream(spark, dir))
    val q = out.writeStream.format("memory").queryName("ft_parity_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // timeout re-emits are value-identical by design — distinct collapses
    // the live row and its closed twin into one journey record
    val streamed = spark.table("ft_parity_test")
      .selectExpr("user_id", "first_type", "unix_micros(first_ts) AS us", "converted")
      .distinct()
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = graft.io.Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(
        min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_type"),
        min(col("ts")).as("first_ts"),
        min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
      .selectExpr("user_id", "first_type", "unix_micros(first_ts) AS us",
        "fp IS NOT NULL AS converted")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream and batch first-touch must agree exactly (${streamed.size} vs ${batch.size})")
    spark.streams.active.foreach(_.stop())
  }

  test("first-touch state retires (closed=true) once the watermark clears the window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Timestamp)]
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val out = EventStreams.firstTouchStream(
      mem.toDF().toDF("user_id", "event_type", "event_id", "ts"))
    val q = out.writeStream.format("memory").queryName("ft_retire_test")
      .outputMode("update").start()
    try {
      mem.addData((1L, "click", 10L, ts(0)), (2L, "purchase", 11L, ts(1)))
      q.processAllAvailable() // batch 1: both journeys open
      mem.addData((1L, "view", 12L, ts(180))) // +3h pushes the watermark
      q.processAllAvailable() // batch 2: watermark passes old mark + 1h window
      mem.addData((1L, "view", 13L, ts(181)))
      q.processAllAvailable() // batch 3: user 2's timer fires
      val u2 = spark.table("ft_retire_test").filter(col("user_id") === 2)
        .select("first_type", "converted", "closed")
        .collect().map(_.toSeq).toSet
      assert(u2.contains(Seq("purchase", true, true)),
        s"user 2's journey must close via event-time timeout: $u2")
      // user 1 kept receiving data — its state must still be open
      val u1closed = spark.table("ft_retire_test")
        .filter(col("user_id") === 1 && col("closed")).count()
      assert(u1closed == 0, "an active journey must not close")
    } finally {
      q.stop()
      spark.streams.active.foreach(_.stop())
    }
  }

  test("flatMapGroupsWithState sessionizer splits on 30-min gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Ev]
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    mem.addData(
      EventStreams.Ev(1L, ts(0)), EventStreams.Ev(1L, ts(5)),
      EventStreams.Ev(1L, ts(50)), // > 30 min after ts(5) → new session
      EventStreams.Ev(2L, ts(0)))
    val out = EventStreams.sessionize(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val closed = spark.table("sess_test")
      .filter(col("closed")).as[EventStreams.SessionOut].collect()
      .sortBy(_.user_id)
    // user 1's first session closes on the gap (2 events, started ts(0));
    // user 2's singleton closes via event-time TIMEOUT (watermark from
    // user 1's ts(50) passes its last+30min); user 1's open session at
    // ts(50) must NOT close (timeout ts(80) is beyond the watermark).
    assert(closed.length == 2, s"got: ${closed.mkString(", ")}")
    assert(closed(0).user_id == 1L && closed(0).n_events == 2L && closed(0).session_start == ts(0))
    assert(closed(1).user_id == 2L && closed(1).n_events == 1L && closed(1).session_start == ts(0))
    spark.streams.active.foreach(_.stop())
  }

  test("streaming maintained rollup == IncrementalAgg delta chain == full recompute") {
    // Three formulations of the same maintained aggregate must agree
    // exactly: Structured Streaming's own incremental state (complete
    // mode), the batch IncrementalAgg.merge of the per-batch deltas (the
    // q8 operator), and a full recompute over everything — the
    // batch/stream coherence contract for rollup maintenance.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val batch1 = Seq(("a", 1.25), ("b", 2.50), ("a", 3.75))
    val batch2 = Seq(("b", 10.00), ("c", 0.25), ("a", 4.00))
    mem.addData(batch1: _*)
    mem.addData(batch2: _*)
    val rolled = mem.toDF().toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("s"))
    val q = rolled.writeStream.format("memory").queryName("rollup_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("n").cast("long"), col("s").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = snap(spark.table("rollup_test"))
    def agged(rows: Seq[(String, Double)]) = rows.toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("s"))
    val maintained = graft.operators.IncrementalAgg.merge(
      agged(batch1), agged(batch2), keys = Seq("k"), measures = Seq("n", "s"),
      countCol = "n")
    val recompute = agged(batch1 ++ batch2)
    assert(streamed == snap(maintained) && streamed == snap(recompute))
    assert(streamed == Set(("a", 3L, 9.0), ("b", 2L, 12.5), ("c", 1L, 0.25)))
    spark.streams.active.foreach(_.stop())
  }
}
