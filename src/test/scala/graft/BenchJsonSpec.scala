package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench driver-record emission: `Bench.renderJson`'s line length
  * must be bounded REGARDLESS of host state. The r17 driver record crashed
  * (`rc=1, parsed=null`) because the old emission's length depended on how
  * many queries the host's contention pushed over the noisy-spread
  * threshold — the builder's idle anchor fit under the 1900 guard, the
  * driver's contended run emitted 2010 chars and the guard threw AFTER the
  * per-query lines had printed, leaving no parseable tail. These tests
  * construct the adversarial host: every query noisy, every query failed,
  * four-digit seconds, 60 headline entries. */
class BenchJsonSpec extends AnyFunSuite {

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  /** The real headline list padded to n queries with plausible future names
    * (the ladder must keep working as rounds add entries). */
  private def names(n: Int): Seq[String] = {
    val pads = Iterator.from(95).map(i => s"t${i}_order5_modified_kn_x")
    (Bench.headline ++ pads.take(math.max(0, n - Bench.headline.length))).take(n)
  }

  test("worst case fits: 60 queries, all noisy, all failed, 4-digit seconds") {
    val results = names(60).map(k => (k, 9999.9994, 1000.0001, 9000.0001, false))
    val line = Bench.renderJson(results, round = 1, sfDir = "/root/testdata/sf0.1")
    assert(line.length < Bench.MaxJsonLen, s"len=${line.length}\n$line")
    val js = parse(line)
    // Every query's median survives every shedding rung — only decimals and
    // the auxiliary name lists degrade.
    assert(js.get("queries").size() == 60)
    assert(js.get("failed").asInt() == 60)
    assert(js.get("contended_n").asInt() == 60)
    assert(js.get("metric").asText() == "total")
    assert(js.get("unit").asText() == "sec")
    assert(js.get("sf").asText() == "sf0.1")
  }

  test("idle case keeps full 3-decimal detail and empty noise lists") {
    val results = names(54).map(k => (k, 1.2345, 1.2001, 1.2999, true))
    val line = Bench.renderJson(results, round = 1, sfDir = "/root/testdata/sf0.1")
    assert(line.length < Bench.MaxJsonLen)
    val js = parse(line)
    assert(js.get("queries").size() == 54)
    assert(js.get("queries").get(Bench.headline.head).asDouble() == 1.235)
    assert(js.get("failed").asInt() == 0)
    assert(js.get("failed_queries").size() == 0)
    assert(js.get("contended").size() == 0)
    assert(js.get("mins").size() == 0)
  }

  test("contended run sheds deterministically: counts exact, mins carry worst spreads") {
    // Half the queries noisy (spread 4x > 3x contended threshold), two of
    // them FAR noisier than the rest — those two must be the mins survivors.
    val base = names(54).zipWithIndex.map { case (k, i) =>
      if (i % 2 == 0) (k, 5.5, 2.0, 8.0, true) else (k, 1.1, 1.0, 1.2, true)
    }
    val spiky = base.updated(0, (base(0)._1, 9.0, 0.5, 50.0, true))
      .updated(2, (base(2)._1, 9.0, 0.4, 60.0, true))
    val line = Bench.renderJson(spiky, round = 1, sfDir = "/root/testdata/sf0.1")
    assert(line.length < Bench.MaxJsonLen)
    val js = parse(line)
    assert(js.get("queries").size() == 54)
    assert(js.get("contended_n").asInt() == 27)
    val minKeys = {
      val it = js.get("mins").fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(minKeys.toSet == Set(base(0)._1, base(2)._1),
      s"mins should carry the worst two spreads, got $minKeys")
  }

  test("same results render identically — length depends on values, not host timing") {
    val results = names(54).map(k => (k, 3.333, 1.0, 4.0, true))
    val a = Bench.renderJson(results, 1, "/root/testdata/sf0.1")
    val b = Bench.renderJson(results, 1, "/root/testdata/sf0.1")
    assert(a == b)
  }
}
