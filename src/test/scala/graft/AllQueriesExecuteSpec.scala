package graft

import org.scalatest.funsuite.AnyFunSuite

/** The correctness gate's blind spot, closed: the driver's Verify dump
  * try-catches per query, so a query that fails ANALYSIS (e.g. a testdata
  * schema drift like the r7 TIMESTAMP_NTZ regeneration) simply never
  * writes output and silently vanishes from the round's tally — 9 queries
  * disappeared from CORRECTNESS_r07 without a single red row. This spec
  * executes EVERY SparkEntry.queries entry end-to-end at the smoke SF and
  * fails loudly with the full casualty list, so |verify outputs| ==
  * |queries| is enforced at `sbt test` time, before the driver ever runs.
  */
class AllQueriesExecuteSpec extends AnyFunSuite {

  test("every SparkEntry.queries entry executes at sf0.001 (none may vanish from the gate)") {
    val spark = TestSpark.spark
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, TestSpark.sfDir).write.mode("overwrite").format("noop").save()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${SparkEntry.queries.size} queries failed to execute — " +
        s"these would SILENTLY drop out of the correctness tally:\n  " +
        failures.mkString("\n  "))
  }
}
