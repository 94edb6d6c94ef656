package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the event-history operators beyond the DuckDB hash
  * gate: SCD2 intervals must tile each user's timeline with no overlap and
  * no same-state adjacency, and sliding windows must place every event in
  * exactly window/slide overlapping windows. */
class HistoryWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("e10: intervals tile the timeline — valid_to chains to the next valid_from") {
    val rows = SparkEntry.queries("e10_scd2_history")(spark, dir)
      .select("user_id", "valid_from", "valid_to", "event_type", "is_current")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(2) == b.getTimestamp(1),
            s"user $user: interval must close exactly at the next open")
          assert(a.getString(3) != b.getString(3),
            s"user $user: adjacent intervals must differ in state (SCD2 compresses runs)")
        case _ => ()
      }
      assert(sorted.last.isNullAt(2) && sorted.last.getBoolean(4),
        s"user $user: exactly the last interval is open/current")
      assert(sorted.init.forall(!_.getBoolean(4)))
    }
  }

  test("e11: every event lands in exactly 4 sliding windows on the 15-min grid") {
    val out = SparkEntry.queries("e11_sliding_windows")(spark, dir)
    val nEvents = Tables.load(spark, dir, "events").count()
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 4 * nEvents, "1h window / 15min slide = 4 memberships per event")
    assert(out.filter(pmod(col("window_start"), lit(900)) =!= 0).count() == 0,
      "window starts sit on the slide grid")
  }
}
