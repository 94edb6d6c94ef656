package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlNorm

class UrlNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlNorm.canonicalize(col("url"))).as[String].collect().toSeq

  private def etld1(hosts: String*): Seq[String] =
    hosts.toDF("h").select(UrlNorm.registeredDomain(col("h"))).as[String].collect().toSeq

  test("canonicalize: each rule, hand-checked") {
    assert(canon(
      "HTTP://WWW.Example.COM.:80//a//b/?x=1#frag", // case, root dot, default port, slashes, fragment
      "https://h.example.net:443/p",                // https default port
      "https://h.example.net:8443/p",               // non-default port KEPT
      "http://h.example.org",                       // empty path -> '/'
      "http://h.example.org/?b=2&a=1&",             // params sorted, trailing empty dropped
      "http://h.example.org/p?",                    // empty query -> no '?'
    ) == Seq(
      "http://www.example.com/a/b/?x=1",
      "https://h.example.net/p",
      "https://h.example.net:8443/p",
      "http://h.example.org/",
      "http://h.example.org/?a=1&b=2",
      "http://h.example.org/p",
    ))
  }

  test("canonicalize: the dozen spellings of one page collapse to one") {
    val c = canon(
      "http://Example.com/a?x=1&y=2",
      "HTTP://example.COM:80/a?y=2&x=1",
      "http://example.com.//a?x=1&y=2#top")
    assert(c.distinct == Seq("http://example.com/a?x=1&y=2"))
  }

  test("malformed input routes to NULL, never a mangled survivor") {
    val got = Seq("not a url", "ftp//missing.scheme", "").toDF("url")
      .select(UrlNorm.canonicalize(col("url")).as("c"))
      .filter(col("c").isNotNull).count()
    assert(got == 0L)
  }

  test("registeredDomain: plain TLD, multi-label suffix, private suffix, degenerates") {
    assert(etld1(
      "www.example.com", "a.b.example.co.uk", "user.github.io",
      "deep.pages.user.github.io", "example.com", "co.uk", "localhost")
      == Seq("example.com", "example.co.uk", "user.github.io",
        "user.github.io", "example.com", "co.uk", "localhost"))
  }
}
