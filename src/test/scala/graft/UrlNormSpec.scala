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

  test("registeredDomain: full-PSL tricky classes — wildcard, exception, deep, private-wildcard, IDN") {
    // *.ck is a WILDCARD rule: any single label under ck is a public
    // suffix, so foo.behind.ck's suffix is behind.ck and the registrable
    // domain is the full 3 labels; behind.ck ITSELF is a suffix →
    // pass-through.
    assert(etld1("foo.behind.ck", "behind.ck")
      == Seq("foo.behind.ck", "behind.ck"))
    // !www.ck is the EXCEPTION that beats the wildcard: the public suffix
    // collapses to ck, making www.ck registrable (and sub.www.ck's
    // registrable domain is www.ck, not sub.www.ck).
    assert(etld1("www.ck", "sub.www.ck") == Seq("www.ck", "www.ck"))
    // 4-label ICANN rule pvt.k12.ma.us: longest match must win over the
    // shorter us / ma.us / k12.ma.us rules.
    assert(etld1("school.pvt.k12.ma.us", "x.school.pvt.k12.ma.us")
      == Seq("school.pvt.k12.ma.us", "school.pvt.k12.ma.us"))
    // PRIVATE-section wildcard *.dev.adobeaemcloud.com: tenant.dev.… IS a
    // public suffix (pass-through), and one more label is registrable —
    // the wildcard's 4-label match must beat the shorter plain
    // adobeaemcloud.com rule.
    assert(etld1("tenant.dev.adobeaemcloud.com", "a.tenant.dev.adobeaemcloud.com")
      == Seq("tenant.dev.adobeaemcloud.com", "a.tenant.dev.adobeaemcloud.com"))
    // IDN rule (aéroport.ci) must match the unicode labels byte-for-byte.
    assert(etld1("x.aéroport.ci", "www.x.aéroport.ci")
      == Seq("x.aéroport.ci", "x.aéroport.ci"))
  }

  test("registeredDomain laws: idempotent, and always a whole-label suffix of the host") {
    val hosts = Seq(
      "www.example.com", "a.b.c.d.example.co.uk", "deep.pages.user.github.io",
      "foo.behind.ck", "sub.www.ck", "x.school.pvt.k12.ma.us",
      "a.tenant.dev.adobeaemcloud.com", "singles", "a.b", "x.aéroport.ci",
      "news.bbc.co.uk", "one.two.three.four.five.six.seven.org")
    val out = etld1(hosts: _*)
    val twice = etld1(out: _*)
    hosts.zip(out).zip(twice).foreach { case ((h, r), r2) =>
      // idempotence: the registrable domain is its own registrable domain
      assert(r2 == r, s"registrable($r) = $r2, expected fixpoint (host $h)")
      // whole-label suffix: r is h itself, or h ends with ".r"
      assert(r == h || h.endsWith("." + r), s"$r is not a label suffix of $h")
      assert(r.nonEmpty)
    }
  }
}
