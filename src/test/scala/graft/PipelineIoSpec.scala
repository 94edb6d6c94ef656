package graft

import graft.io.{Jdbc, ObjectStore}
import graft.pipeline.{Pipeline, PipelineContext, Runner}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineIoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def p(n: String, deps: Seq[String], log: scala.collection.mutable.Buffer[String],
      fail: Boolean = false, mod: String = "core") =
    new Pipeline {
      def name = n
      override def dependsOn = deps
      override def module = mod
      def run(ctx: PipelineContext): Unit = {
        if (fail) sys.error(s"boom in $n"); log += n
      }
    }

  test("runner executes in dependency order, deterministically") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val ps = Seq(
      p("companies", Seq("municipalities"), log),
      p("municipalities", Nil, log),
      p("udos", Seq("companies", "municipalities"), log),
      p("toponyms", Nil, log))
    val results = Runner.run(PipelineContext(spark), ps)
    assert(log.toSeq == Seq("municipalities", "toponyms", "companies", "udos"))
    assert(results.map(_.name) == log.toSeq)
  }

  test("runner rejects cycles and unknown deps") {
    val log = scala.collection.mutable.Buffer.empty[String]
    intercept[IllegalArgumentException] {
      Runner.order(Seq(p("a", Seq("b"), log), p("b", Seq("a"), log)))
    }
    intercept[IllegalArgumentException] {
      Runner.order(Seq(p("a", Seq("nope"), log)))
    }
  }

  test("runner fails fast with pipeline name + elapsed") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val e = intercept[RuntimeException] {
      Runner.run(PipelineContext(spark),
        Seq(p("ok", Nil, log), p("bad", Seq("ok"), log, fail = true), p("never", Seq("bad"), log)))
    }
    assert(e.getMessage.contains("bad"))
    assert(log.toSeq == Seq("ok")) // 'never' did not run
  }

  test("module selection filters like the reference CLI --modules") {
    val log = scala.collection.mutable.Buffer.empty[String]
    Runner.run(PipelineContext(spark),
      Seq(p("c1", Nil, log), p("x1", Nil, log, mod = "auac")), Set("auac"))
    assert(log.toSeq == Seq("x1"))
  }

  test("object-store upload: deterministic keys, partition-level clients, mapping join-back") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_os").toString
    val rows = Seq(
      ("r1", "a.pdf", "application/pdf", "payload-one".getBytes),
      ("r2", "b.pdf", "application/pdf", "payload-two".getBytes))
      .toDF("id", "name", "mime", "payload")
    val mapping = ObjectStore.upload(rows, "bucket",
      () => new ObjectStore.LocalFsClient(tmp)).collect().sortBy(_.id)
    assert(mapping.length == 2)
    // deterministic: re-upload produces identical keys (retry idempotency)
    val mapping2 = ObjectStore.upload(rows, "bucket",
      () => new ObjectStore.LocalFsClient(tmp)).collect().sortBy(_.id)
    assert(mapping.map(_.objectKey).toSeq == mapping2.map(_.objectKey).toSeq)
    // files exist with content
    mapping.foreach { u =>
      val f = java.nio.file.Paths.get(tmp, "bucket", u.objectKey)
      assert(java.nio.file.Files.size(f) == u.nBytes)
    }
  }

  test("content-type mapping: known extensions map, unknown falls to octet-stream") {
    val out = Seq("report.PDF", "data.xml", "noext", "odd.xyz")
      .toDF("name")
      .select(col("name"), ObjectStore.contentTypeForName(col("name")).as("ct"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("report.PDF") == "application/pdf", "case-insensitive extension lookup")
    assert(out("data.xml") == "application/xml")
    assert(out("noext") == "application/octet-stream")
    assert(out("odd.xyz") == "application/octet-stream")
  }

  test("csv export (K3): export/<t>.csv per table, headered, both layouts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.io.CsvExport.exportTables(
      spark, TestSpark.sfDir, Seq("region", "nation"), tmp)
    // distributed layout: <t>.csv is a directory of part files
    val regionBack = spark.read.option("header", "true").csv(s"$tmp/region.csv")
    assert(regionBack.count() == 5 && regionBack.columns.contains("r_name"))
    // single-file layout (reference parity): <t>.csv is one plain file
    graft.io.CsvExport.exportTables(
      spark, TestSpark.sfDir, Seq("nation"), tmp, singleFile = true)
    val f = java.nio.file.Paths.get(tmp, "nation.csv")
    assert(java.nio.file.Files.isRegularFile(f), "singleFile must be a plain file")
    val firstLine = java.nio.file.Files.readAllLines(f).get(0)
    assert(firstLine.contains("n_name"), "header row present")
    assert(spark.read.option("header", "true").csv(f.toString).count() == 25)
  }

  test("jsonl export: round-trips values, honors shard count and codec") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = graft.io.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    graft.io.JsonlExport.write(docs, s"$tmp/docs", shards = Some(3))
    // exactly 3 shards, each a plain text file of JSON lines
    val parts = new java.io.File(s"$tmp/docs").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 3, "shards pin the part-file count")
    val firstLine = scala.io.Source.fromFile(parts.head).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.contains("\"doc_id\""))
    // schema-first read-back is value-identical
    val back = graft.io.JsonlExport.read(spark, s"$tmp/docs", docs.schema)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
    assert(back.count() == docs.count())
    // gzip codec: compressed shard names, same read-back
    graft.io.JsonlExport.write(docs, s"$tmp/docs_gz", codec = Some("gzip"))
    val gzParts = new java.io.File(s"$tmp/docs_gz").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(gzParts.nonEmpty && gzParts.forall(_.getName.endsWith(".gz")))
    assert(graft.io.JsonlExport.read(spark, s"$tmp/docs_gz", docs.schema)
      .count() == docs.count())
  }

  test("orc round-trip: values identical, predicate pushdown reaches the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = graft.io.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.mode("overwrite").orc(s"$tmp/docs")
    val back = spark.read.orc(s"$tmp/docs")
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
    // ORC scans carry pushed filters just like parquet — the format is a
    // drop-in for the layout/pushdown posture, not a slow path
    val plan = back.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"ORC scan must receive the pushed predicate:\n$plan")
  }

  test("schema-evolution read: merged schema, NULL backfill for pre-column batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_merge").toString
    // batch 1 written before column `b` existed; batch 2 after
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(tmp)
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .write.mode("append").parquet(tmp)
    val merged = graft.io.Tables.loadMerged(spark, tmp)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"),
      "merged schema must include the late column")
    val rows = merged.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L)),
      "pre-column rows surface NULL, post-column rows their value")
    // pruning still reaches the scan through the merged schema
    val plan = merged.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"projection must prune to id through the merged schema:\n$plan")
  }

  test("executed jdbc round-trip against embedded Derby: K1 append, S1/S2 reads, K2 truncate") {
    // Derby ships on Spark's own classpath (/opt/spark/jars), so this is a
    // REAL in-process JDBC endpoint — the write path Spark executes here
    // (batched INSERTs over N task connections) is exactly what a PG/Oracle
    // sink sees; only the dialect differs. In-memory DB: JVM-wide, no files.
    val conn = Jdbc.Conn("jdbc:derby:memory:graftjdbc;create=true", "", "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val src = spark.range(0, 100).select(
      col("id").as("ID"),
      concat(lit("name-"), col("id")).as("NAME"),
      (col("id") * 2).as("AMOUNT"))
    Jdbc.append(src, conn, "GRAFT_RT")

    // S1: range-partitioned full scan arrives as N parallel cursors
    val back = Jdbc.readTable(spark, conn, "GRAFT_RT",
      partitionColumn = Some("ID"), bounds = Some((0L, 99L)), numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("AMOUNT")).head().getLong(0) == (0 until 100).map(_ * 2).sum)

    // S2: query pushdown
    val q = Jdbc.readQuery(spark, conn, "SELECT ID, NAME FROM GRAFT_RT WHERE ID < 10")
    assert(q.count() == 10)

    // K2 on the SAME config object (the reference's auac.py:39 engine
    // mismatch is unrepresentable); Derby speaks plain TRUNCATE only.
    Jdbc.truncate(conn, Seq("GRAFT_RT"), restartIdentity = false, cascade = false)
    assert(Jdbc.readTable(spark, conn, "GRAFT_RT").count() == 0)

    // reload after truncate — the reference's standard per-run cycle
    Jdbc.append(src, conn, "GRAFT_RT")
    assert(Jdbc.readTable(spark, conn, "GRAFT_RT").count() == 100)
  }

  test("jdbc option assembly: pg url decoration and cast columns") {
    assert(Jdbc.pgUrlWithUnspecifiedStrings("jdbc:postgresql://h/db")
      == "jdbc:postgresql://h/db?stringtype=unspecified")
    assert(Jdbc.pgUrlWithUnspecifiedStrings("jdbc:postgresql://h/db?ssl=true")
      == "jdbc:postgresql://h/db?ssl=true&stringtype=unspecified")
    assert(Jdbc.pgUrlWithUnspecifiedStrings("jdbc:postgresql://h/db?stringtype=unspecified")
      == "jdbc:postgresql://h/db?stringtype=unspecified")
  }
}
