package graft

import scala.jdk.CollectionConverters._

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

  test("COVERAGE.md cites DRIVER gate numbers that match CORRECTNESS_r*.json") {
    // Round-11 verdict: SURVEY/COVERAGE recorded the LOCAL mirror's
    // 219/219 as "the gate" while the driver's CORRECTNESS_r11.json said
    // 218/219. The driver file is the hard signal, so the doc must cite
    // it: COVERAGE.md carries a `driver gate (rN): G/T` line, and this
    // test re-derives G (hash_match green) and T (hash-gated rows, i.e.
    // err == null) from CORRECTNESS_rN.json itself. The cited round must
    // also be no older than newest-present-round − 1 (the −1 slack keeps
    // the build green in the window where the driver has already written
    // the next round's file but the docs legitimately still cite the
    // last adjudicated one).
    val cited = "driver gate \\(r(\\d+)\\): (\\d+)/(\\d+)".r.findFirstMatchIn(doc)
    assert(cited.isDefined,
      "COVERAGE.md must cite the driver gate as `driver gate (rN): G/T`")
    val (round, g, t) =
      (cited.get.group(1).toInt, cited.get.group(2).toInt, cited.get.group(3).toInt)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      .iterator().asScala
      .flatMap { p =>
        "CORRECTNESS_r(\\d+)\\.json".r.findFirstMatchIn(p.getFileName.toString)
          .map(m => m.group(1).toInt -> p)
      }.toMap
    if (files.nonEmpty) {
      assert(round >= files.keys.max - 1,
        s"COVERAGE.md cites driver gate r$round but CORRECTNESS_r${files.keys.max}.json exists")
      files.get(round).foreach { p =>
        val json = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
        var green = 0; var gated = 0
        node.fields().asScala.foreach { e =>
          val err = e.getValue.get("err")
          if (err == null || err.isNull) {
            gated += 1
            if (e.getValue.get("hash_match").asBoolean(false)) green += 1
          }
        }
        assert(g == green && t == gated,
          s"COVERAGE.md cites driver gate (r$round): $g/$t but CORRECTNESS_r$round.json says $green/$gated")
      }
    }
  }

  test("README and SURVEY tallies match the code too (no cross-doc drift)") {
    // Round-10's verdict dinged exactly this: one doc carrying a number
    // the gate contradicted. Every doc that states a tally now fails the
    // build when it goes stale.
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val nQ = SparkEntry.queries.size
    val nO = SparkEntry.oracleSql.size
    val readme = read("README.md")
    val rq = s"(\\d+) `SparkEntry.queries` entries".r.findFirstMatchIn(readme)
    assert(rq.exists(_.group(1).toInt == nQ),
      s"README queries tally ${rq.map(_.group(1))} != $nQ")
    val ro = "(\\d+) carry equivalent DuckDB SQL".r.findFirstMatchIn(readme)
    assert(ro.exists(_.group(1).toInt == nO),
      s"README oracled tally ${ro.map(_.group(1))} != $nO")
    val survey = read("SURVEY.md")
    // round-agnostic: the LAST "ROUND-N TOTALS so far" line is the live one
    val sq = "ROUND-\\d+ TOTALS so far: (\\d+) gated queries — (\\d+) oracled"
      .r.findAllMatchIn(survey).toSeq.lastOption
    assert(sq.exists(m => m.group(1).toInt == nQ && m.group(2).toInt == nO),
      s"SURVEY round tally ${sq.map(m => (m.group(1), m.group(2)))} != ($nQ, $nO)")
  }
}
