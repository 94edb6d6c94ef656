package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ArrowExport
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ArrowExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("name", StringType)))

  test("IPC shard round-trip: values, nulls, and multi-batch shards survive byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("arrowrt").toString
    val df = spark.range(0, 1000).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") * 1.5).as("score"),
      when(col("id") % 11 === 0, lit(null)).otherwise(concat(lit("n"), col("id"))).as("name"))
      .repartition(3)
    val manifest = ArrowExport.writeShards(df, dir, batchRows = 128)
      .as[(String, Long, Long)].collect()
    assert(manifest.length == 3, "one shard per partition")
    assert(manifest.map(_._2).sum == 1000L)
    assert(manifest.forall(_._3 > 0L), "every shard has bytes on disk")
    val back = ArrowExport.readShards(spark, dir, schema)
    assert(back.count() == 1000L)
    assert(back.exceptAll(df).unionAll(df.exceptAll(back)).count() == 0L,
      "round-trip must preserve every row incl. nulls")
  }

  test("unsupported column types refuse loudly with the column name") {
    val dir = java.nio.file.Files.createTempDirectory("arrowbad").toString
    val err = intercept[IllegalArgumentException] {
      ArrowExport.writeShards(
        spark.range(3).select(col("id"), array(lit(1)).as("xs")), dir)
    }
    assert(err.getMessage.contains("xs"), err.getMessage)
  }

  test("re-export with fewer partitions leaves no stale shards behind") {
    val dir = java.nio.file.Files.createTempDirectory("arrowre").toString
    def frame(n: Long, parts: Int) = spark.range(0, n).select(
      col("id"), (col("id") * 1.0).as("score"), concat(lit("n"), col("id")).as("name"))
      .repartition(parts)
    ArrowExport.writeShards(frame(100, 5), dir).collect()
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".arrows")) == 5)
    ArrowExport.writeShards(frame(40, 2), dir).collect()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrows"))
    assert(files.length == 2,
      s"stale shards must be cleared on re-export; found ${files.map(_.getName).toSeq}")
    assert(ArrowExport.readShards(spark, dir, schema).count() == 40L,
      "reader must see only the second export's rows")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.contains(".arrows.tmp-")), "no temp files left behind")
  }

  test("reader verifies the embedded schema against expectations — types too, not just names") {
    val dir = java.nio.file.Files.createTempDirectory("arrowtype").toString
    ArrowExport.writeShards(
      spark.range(5).select(col("id"), lit(1.0).as("score"), lit("x").as("name")), dir)
      .collect()
    // same NAMES, one different TYPE (score written DOUBLE, expected BIGINT)
    val wrongType = StructType(Seq(
      StructField("id", LongType), StructField("score", LongType),
      StructField("name", StringType)))
    val err = intercept[Exception] {
      ArrowExport.readShards(spark, dir, wrongType).count()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema"), msg.take(300))
  }

  test("reader verifies the embedded schema against expectations") {
    // NB: the manifest is lazy — without the collect() no shard is ever
    // written and the intercept below would catch "no .arrows shards"
    // instead of exercising the schema check (this test was vacuous
    // before: the temp-dir NAME contained "schema")
    val dir = java.nio.file.Files.createTempDirectory("arrowwrong").toString
    ArrowExport.writeShards(
      spark.range(5).select(col("id"), lit(1.0).as("score"), lit("x").as("name")), dir)
      .collect()
    val wrong = StructType(Seq(
      StructField("id", LongType), StructField("other", DoubleType),
      StructField("name", StringType)))
    // local mode may surface the task's require directly instead of the
    // SparkException wrapper — accept either, but demand the message
    val err = intercept[Exception] {
      ArrowExport.readShards(spark, dir, wrong).count()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema") || msg.contains("other"), msg.take(300))
  }
}
