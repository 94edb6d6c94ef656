package graft.queries

import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form over `events` (the same transforms
  * run under Structured Streaming in graft.streaming — these batch versions
  * are the oracle-checkable semantics pin).
  */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    // Gap-based sessionization: a new session starts after >30 min of
    // silence per user; session index = running sum of boundary flags.
    QueryDef.sql(
      "e1_sessionize",
      """WITH x AS (SELECT event_id, user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |y AS (SELECT event_id, user_id, ts,
        |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END AS is_new FROM x)
        |SELECT event_id, user_id, ts,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
        |FROM y""".stripMargin) { (spark, dir) =>
      val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("ts"), 1).over(order)
      val isNew = when(
        prev.isNull || (unix_micros(col("ts")) - unix_micros(prev)) > 1800000000L, 1)
        .otherwise(0)
      Tables.load(spark, dir, "events")
        .withColumn("is_new", isNew)
        .select(
          col("event_id"), col("user_id"), col("ts"),
          sum(col("is_new")).over(frame).cast("int").as("session_seq"))
    },

    // Tumbling-window aggregation (hourly): the batch twin of the
    // streaming watermark+window query in graft.streaming.EventStreams.
    QueryDef.sql(
      "e2_tumbling_hourly",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users, MAX("value") AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      Tables.load(spark, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          max(col("value")).as("max_value"))
    },

    // JSON property extraction from the props payload column.
    QueryDef.sql(
      "e3_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""") { (spark, dir) =>
      Tables.load(spark, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    })
}
