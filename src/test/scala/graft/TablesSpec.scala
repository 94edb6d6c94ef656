package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events.ts lowering for BOTH physical layouts the corpus
  * generator has produced (the r7 testdata regeneration changed the layout
  * under a running round — this spec is the canary that makes the next
  * drift a named failure instead of nine silently-vanished queries). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nanosecond epoch longs truncate to microsecond timestamps (integer DIV)") {
    import spark.implicits._
    // 2024-01-02T03:04:05.123456789Z as ns — the 789 ns tail must TRUNCATE
    val ns = 1704164645123456789L
    val df = Seq(ns).toDF("ts")
    val out = Tables.lowerNanoTs(df, "events")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) == ns / 1000)
  }

  test("TIMESTAMP_NTZ casts to session-zone timestamp preserving wall-clock under UTC") {
    val df = spark.sql(
      "SELECT TIMESTAMP_NTZ'2024-01-02 03:04:05.123456' AS ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.lowerNanoTs(df, "events")
    assert(out.schema("ts").dataType == TimestampType)
    // UTC session: the instant equals the same wall-clock read as UTC
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
  }

  test("non-events tables and already-correct types pass through untouched") {
    import spark.implicits._
    val other = Seq(1L).toDF("ts")
    assert(Tables.lowerNanoTs(other, "orders").schema("ts").dataType == LongType)
    val good = spark.sql("SELECT TIMESTAMP'2024-01-02 03:04:05' AS ts")
    assert(Tables.lowerNanoTs(good, "events").schema("ts").dataType == TimestampType)
  }
}
