package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md's headline tallies must equal the code: a query added
  * without its doc line (or vice versa) fails here instead of shipping a
  * stale count to the next review. */
class CoverageDocSpec extends AnyFunSuite {

  private lazy val doc =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")

  test("query tally in COVERAGE.md == SparkEntry.queries.size") {
    val m = "(\\d+) queries in `SparkEntry.queries`".r.findFirstMatchIn(doc)
    assert(m.isDefined, "COVERAGE.md must state the query tally")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.get.group(1)} queries; code has ${SparkEntry.queries.size}")
  }

  test("oracled tally in COVERAGE.md == SparkEntry.oracleSql.size") {
    val m = "(\\d+) carry DuckDB oracle".r.findFirstMatchIn(doc)
    assert(m.isDefined, "COVERAGE.md must state the oracled tally")
    assert(m.get.group(1).toInt == SparkEntry.oracleSql.size,
      s"COVERAGE.md says ${m.get.group(1)} oracled; code has ${SparkEntry.oracleSql.size}")
  }

  test("every oracled name exists as a query; rows-only set is the difference") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val rowsOnly = q -- o
    assert(rowsOnly.size == q.size - o.size)
  }
}
