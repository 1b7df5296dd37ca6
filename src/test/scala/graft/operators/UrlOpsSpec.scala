package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL normalization, registered-domain extraction and the domain
  * cap/blocklist gate on handwritten messy URLs — the cases the
  * synthetic q145 column can't cover (userinfo, weird ports,
  * multi-label subdomains, scheme-less strings). */
class UrlOpsSpec extends SparkSpec {

  private def norm(urls: String*): Seq[String] = {
    val sp = spark
    import sp.implicits._
    urls.toDF("url").select(UrlOps.normalizeUrl(col("url"))).collect()
      .map(_.getString(0)).toSeq
  }

  private def regDom(hosts: String*): Seq[String] = {
    val sp = spark
    import sp.implicits._
    hosts.toDF("h").select(UrlOps.registeredDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("normalizeUrl canonicalizes every messy variant to one form") {
    val variants = Seq(
      "HTTPS://WWW.News.Example.COM:443/a/B/?utm_source=x&q=1&utm_campaign=y#top",
      "https://news.example.com/a/B?q=1",
      "https://user:pw@News.Example.com:443/a/B///?q=1&fbclid=abc",
      "https://www.news.example.com/a/B/?gclid=2&q=1&ref=tw")
    assert(norm(variants: _*).toSet === Set("https://news.example.com/a/B?q=1"))
  }

  test("normalizeUrl keeps non-default ports, param order canonical, path case") {
    assert(norm("http://Example.com:8080/X?b=2&a=1") ===
      Seq("http://example.com:8080/X?a=1&b=2"))
    // :443 is NOT default for http — stays
    assert(norm("http://example.com:443/x") === Seq("http://example.com:443/x"))
    // all params tracking -> no query at all
    assert(norm("https://example.com/x?utm_source=a&utm_medium=b") ===
      Seq("https://example.com/x"))
  }

  test("registeredDomain handles deep subdomains and two-level suffixes") {
    assert(regDom("a.b.news.example.com") === Seq("example.com"))
    assert(regDom("www-cache.bbc.co.uk") === Seq("bbc.co.uk"))
    assert(regDom("example.com") === Seq("example.com"))
    assert(regDom("localhost") === Seq("localhost"))
    assert(regDom("deep.sub.gov.uk") === Seq("sub.gov.uk"))
  }

  test("domainDrops: blocklist drops all, cap keeps the first K per domain") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "https://spam.bad.com/a"), (2L, "https://www.bad.com/b"),
      (3L, "https://ok.com/1"), (4L, "https://ok.com/2"),
      (5L, "https://ok.com/3"), (6L, "https://other.net/x"))
      .toDF("doc_id", "url")
    val drops = UrlOps.domainDrops(docs, col("url"), cap = 2L,
        blocklist = Seq("bad.com"))
      .collect().map(_.getLong(0)).toSet
    // bad.com rows (1, 2) blocked; ok.com keeps 3, 4, drops 5
    assert(drops === Set(1L, 2L, 5L))
  }

  test("q145/q146 run green with bounded shapes") {
    val n = UrlOps.q145UrlNormalize.fn(spark, sf("sf0.001"))
    val rows = n.collect()
    assert(rows.nonEmpty)
    // every normalized URL is lowercase-scheme/host, fragment-free,
    // tracking-free, and never ends with '/'
    rows.foreach { r =>
      val nu = r.getAs[String]("norm_url")
      assert(nu.startsWith("http://") || nu.startsWith("https://"), nu)
      assert(!nu.contains("#") && !nu.contains("utm_") && !nu.contains("WWW"), nu)
      assert(!nu.endsWith("/"), nu)
    }
    val caps = UrlOps.q146DomainCaps.fn(spark, sf("sf0.001")).collect()
    assert(caps.nonEmpty)
    assert(caps.forall(_.getLong(2) <= 20L))
    assert(!caps.exists(r => Seq("src0-example.com", "src1-example.co.uk")
      .contains(r.getString(1))))
  }
}
