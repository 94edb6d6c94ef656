package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** As-of join semantic pins: >= matching (equal timestamps DO match),
  * left-outer nulls for no-prior-match, per-key isolation, and most-recent
  * (not first) selection. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("picks most recent right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts(10), "p1"), (1L, ts(30), "p2"),
      (2L, ts(5), "p3"), // before any right row for key 2
      (3L, ts(10), "p4") // key with no right rows at all
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts(0), "c0"), (1L, ts(10), "c1"), (1L, ts(20), "c2"),
      (2L, ts(7), "c3")
    ).toDF("k", "rts", "rname")

    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
        payload = Seq("rname" -> "match", "rts" -> "match_ts"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    assert(out("p1").contains("c1"), "equal timestamp must match (>= semantics)")
    assert(out("p2").contains("c2"), "must take most recent, not first")
    assert(out("p3").isEmpty, "left row before all right rows -> null")
    assert(out("p4").isEmpty, "key absent on right -> null")
  }

  test("duplicate right (key, ts): caller tiebreak picks the greatest, deterministically") {
    val left = Seq((1L, ts(10), "p1")).toDF("k", "lts", "lname")
    // three right rows at the SAME (key, ts) — without a tiebreak the
    // matched payload would be retry-dependent
    val right = Seq(
      (1L, ts(10), "x", 1L), (1L, ts(10), "z", 3L), (1L, ts(10), "y", 2L)
    ).toDF("k", "rts", "rname", "seq")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
        payload = Seq("rname" -> "match"), rightTiebreak = Seq("seq"))
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("match") == "z",
      "greatest tiebreak value must win at an equal (key, ts)")
  }

  test("null right keys/timestamps never match; null-key left rows keep null payload") {
    val left = Seq(
      (Some(1L), Some(ts(10)), "normal"),
      (None: Option[Long], Some(ts(10)), "nullkey")
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (Some(1L), Some(ts(5)), "ok"),
      (Some(1L), None: Option[Timestamp], "nullts"),   // must never match
      (None: Option[Long], Some(ts(1)), "nullkeyr")    // must never match
    ).toDF("k", "rts", "rname")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
        payload = Seq("rname" -> "match"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("normal").contains("ok"),
      "valid right row still matches; the null-ts row must not shadow it")
    assert(out("nullkey").isEmpty,
      "NULL = NULL is not a key match — left-outer null payload instead")
  }

  test("plan: one hash shuffle for the key, no nested-loop join") {
    val left = Seq((1L, ts(1), "a")).toDF("k", "lts", "v")
    val right = Seq((1L, ts(0), "b")).toDF("k", "rts", "w")
    val p = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      payload = Seq("w" -> "w")).queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), "as-of must never plan a theta join")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }
}
