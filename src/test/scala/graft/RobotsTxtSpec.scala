package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RobotsTxt
import org.apache.spark.sql.functions._

class RobotsTxtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def verdicts(robots: String, paths: Seq[String]) = {
    val rules = RobotsTxt.starGroupRules(
      Seq(("d", robots)).toDF("domain", "txt"), "domain", "txt")
    RobotsTxt.verdicts(
      paths.zipWithIndex.map { case (p, i) => (i.toLong, "d", p) }
        .toDF("id", "domain", "path"),
      "id", "domain", "path", rules)
      .as[(Long, String, String, String, String, java.lang.Long, Boolean)]
      .collect().sortBy(_._1).toSeq
  }

  test("RFC grouping: consecutive UA lines share a group; non-star groups are scoped away") {
    val robots =
      "User-agent: botA\nUser-agent: *\nDisallow: /x\n\nUser-agent: botB\nDisallow: /"
    val got = verdicts(robots, Seq("/x/1", "/y"))
    assert(got(0)._7 == false, "star group (shared with botA) disallows /x")
    assert(got(1)._7 == true, "botB's Disallow: / must not leak into the star group")
  }

  test("longest match wins; Allow beats Disallow on exact length ties; empty Disallow is no rule") {
    val robots = "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow:\nAllow: /t\nDisallow: /t"
    val got = verdicts(robots, Seq("/a/1", "/a/b/1", "/t/1", "/free"))
    assert(got(0)._7 == false && got(0)._5 == "/a")
    assert(got(1)._7 == true && got(1)._5 == "/a/b", "longer Allow overrides")
    assert(got(2)._7 == true, "equal-length tie resolves to Allow")
    assert(got(3)._7 == true && got(3)._4 == null, "no match => allowed")
  }

  test("crawl-delay is a domain property reaching unmatched urls; absent delay is null") {
    val got = verdicts("User-agent: *\nCrawl-delay: 7\nDisallow: /x", Seq("/free"))
    assert(got(0)._6 == 7L && got(0)._7 == true)
    val none = verdicts("User-agent: *\nDisallow: /x", Seq("/free"))
    assert(none(0)._6 == null)
  }
}
