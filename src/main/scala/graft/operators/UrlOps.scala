package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain curation operators — the RefinedWeb/C4 pre-gate tier: a
  * web-crawl pipeline filters by URL BEFORE it ever reads a byte of
  * text (blocklists, per-domain caps, normalized-URL dedup keys). All
  * pure string/integer Columns — codegen'd narrow maps, no UDFs — and
  * every rule is reproduced verbatim in the DuckDB oracles.
  *
  * Normalization (the C4/RefinedWeb canonical form):
  * lowercase scheme+host, strip `www.`, strip the scheme's default
  * port, strip trailing path slashes, drop tracking parameters
  * (`utm_*`, `fbclid`, `gclid`, `ref`), sort the surviving query
  * parameters, drop the fragment. Path CASE is preserved (URL paths
  * are case-sensitive; hosts are not).
  *
  * Registered domain: the last two host labels, or three when the
  * public suffix spans two labels (`co.uk`-style) — the
  * public-suffix-list idea with the short built-in table a pipeline
  * ships when the full PSL isn't loaded.
  *
  * The documents table carries no URL column, so q145/q146 synthesize
  * a deterministic messy URL per document from (source, doc_id) — the
  * multimodal-tier convention (q69/q78: synthesize, then run the REAL
  * operator) — with mixed-case schemes/hosts, default ports, trailing
  * slashes, shuffled tracking params, and fragments to normalize away.
  *
  * Scale: normalization and domain extraction are narrow projections;
  * the per-domain cap is ONE shuffle keyed on the registered domain
  * (the partition skew of a hot domain is exactly what the cap
  * bounds); the blocklist is a literal in-set — broadcast semantics,
  * no join.
  */
object UrlOps {

  /** Two-label public suffixes recognized by [[registeredDomain]]. */
  private val TwoLevelSuffixes = Seq(
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "co.in", "co.nz",
    "com.au", "net.au", "com.br")

  private def afterScheme(u: Column): Column =
    regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://", "")

  /** Lowercased scheme (empty when the URL is scheme-less). */
  def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))

  /** Lowercased host with userinfo, `www.` and any port stripped. */
  def hostOf(u: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(afterScheme(u), "^([^/?#]*)", 1)),
        "^([^@]*@)?(www\\.)?", ""),
      ":[0-9]+$", "")

  /** The canonical normalized URL (see object doc for the rules). */
  def normalizeUrl(u: Column): Column = {
    val scheme = schemeOf(u)
    val rest = afterScheme(u)
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val host = regexp_replace(hostport, "^([^@]*@)?(www\\.)?", "")
    val hostNoDefault = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    val pathqf = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(regexp_extract(pathqf, "^([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(pathqf, "\\?([^#]*)", 1)
    val keptParams = array_join(
      array_sort(filter(split(query, "&"), p =>
        !(p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=") || p === lit("")))),
      "&")
    concat(scheme, lit("://"), hostNoDefault, path,
      when(keptParams === "", lit("")).otherwise(concat(lit("?"), keptParams)))
  }

  /** Registered domain of a (already normalized) host column. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Deterministic messy URL per (source, doc_id) — the synthetic
    * crawl-metadata column q145/q146 exercise the operators on. */
  private def syntheticUrl: Column = concat(
    when(pmod(col("doc_id"), lit(3)) === 0, "HTTP")
      .when(pmod(col("doc_id"), lit(3)) === 1, "https")
      .otherwise("Https"),
    lit("://"),
    when(pmod(col("doc_id"), lit(2)) === 0, "WWW.").otherwise(""),
    col("source"),
    when(pmod(col("doc_id"), lit(4)) === 0, "-Example.CO.UK").otherwise("-Example.COM"),
    when(pmod(col("doc_id"), lit(5)) === 0,
      when(pmod(col("doc_id"), lit(3)) === 0, ":80").otherwise(":443")).otherwise(""),
    lit("/Docs/"), pmod(col("doc_id"), lit(7)).cast("string"),
    when(pmod(col("doc_id"), lit(2)) === 1, "/").otherwise(""),
    lit("?utm_source=feed&id="), col("doc_id").cast("string"),
    lit("&utm_campaign=x"),
    when(pmod(col("doc_id"), lit(3)) === 1, "&ref=tw").otherwise(""),
    when(pmod(col("doc_id"), lit(6)) === 0, "#sec-2").otherwise(""))

  private val syntheticUrlSql =
    """CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'Https' END
      || '://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
      || source
      || CASE WHEN doc_id % 4 = 0 THEN '-Example.CO.UK' ELSE '-Example.COM' END
      || CASE WHEN doc_id % 5 = 0 THEN
           (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END) ELSE '' END
      || '/Docs/' || CAST(doc_id % 7 AS VARCHAR)
      || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
      || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
      || CASE WHEN doc_id % 3 = 1 THEN '&ref=tw' ELSE '' END
      || CASE WHEN doc_id % 6 = 0 THEN '#sec-2' ELSE '' END"""

  /** The oracle's copy of [[normalizeUrl]]/[[hostOf]]/[[registeredDomain]]
    * over a `u(doc_id, url)` CTE — ends in
    * `n(doc_id, url, norm_url, domain, reg_domain)`. */
  private val normalizeSqlCtes =
    s"""parts AS (SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
       |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
       |  FROM u),
       |  hp AS (SELECT doc_id, url, scheme, rest,
       |    regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)),
       |      '^([^@]*@)?(www\\.)?', '') AS host,
       |    regexp_replace(rest, '^[^/?#]*', '') AS pathqf
       |  FROM parts),
       |  np AS (SELECT doc_id, url, scheme, host, pathqf,
       |    CASE WHEN scheme = 'http' THEN regexp_replace(host, ':80$$', '')
       |         WHEN scheme = 'https' THEN regexp_replace(host, ':443$$', '')
       |         ELSE host END AS hostnd,
       |    regexp_replace(regexp_extract(pathqf, '^([^?#]*)', 1), '/+$$', '') AS path,
       |    regexp_extract(pathqf, '\\?([^#]*)', 1) AS query
       |  FROM hp),
       |  n AS (SELECT doc_id, url,
       |    scheme || '://' || hostnd || path ||
       |      CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS norm_url,
       |    regexp_replace(hostnd, ':[0-9]+$$', '') AS domain,
       |    CASE WHEN len(labels) >= 3 AND
       |           (labels[-2] || '.' || labels[-1]) IN (${TwoLevelSuffixes.map("'" + _ + "'").mkString(", ")})
       |         THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
       |         WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
       |         ELSE regexp_replace(hostnd, ':[0-9]+$$', '') END AS reg_domain
       |  FROM (SELECT doc_id, url, scheme, hostnd, path,
       |      array_to_string(list_sort(list_filter(string_split(query, '&'),
       |        p -> NOT (regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)=') OR p = ''))), '&') AS kept,
       |      string_split(regexp_replace(hostnd, ':[0-9]+$$', ''), '.') AS labels
       |    FROM np) q)""".stripMargin

  /** q145: URL normalization + domain extraction over the synthetic
    * crawl column — every messy variant (case, www, default port,
    * trailing slash, tracking params, fragment) collapses to one
    * canonical form, the key a crawl dedups on. */
  val q145UrlNormalize: QueryDef = QueryDef(
    "q145_url_normalize",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"), syntheticUrl.as("url"))
        .withColumn("norm_url", normalizeUrl(col("url")))
        .withColumn("domain", hostOf(col("url")))
        .withColumn("reg_domain", registeredDomain(hostOf(col("url"))))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH u AS (SELECT doc_id, $syntheticUrlSql AS url FROM documents),
      $normalizeSqlCtes
      SELECT doc_id, url, norm_url, domain, reg_domain FROM n
      ORDER BY doc_id"""))

  /** Per-domain cap + blocklist drops over a (doc_id, url) frame:
    * rows from blocklisted registered domains, plus rows ranked past
    * `cap` within their domain (doc_id order), as slim
    * (doc_id, is_url_out) flags — [[graft.pipeline.Curation]]'s URL
    * pre-gate stage. */
  def domainDrops(docs: DataFrame, url: Column, cap: Long,
      blocklist: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("rd")).orderBy(col("doc_id"))
    val ranked = docs.select(col("doc_id"), registeredDomain(hostOf(url)).as("rd"))
      .withColumn("rk", row_number().over(w))
    val blocked =
      if (blocklist.isEmpty) lit(false) else col("rd").isin(blocklist: _*)
    ranked.filter(blocked || col("rk") > cap)
      .select(col("doc_id"), lit(true).as("is_url_out"))
  }

  private val CapPerDomain = 20L
  private val Blocklist = Seq("src0-example.com", "src1-example.co.uk")

  /** q146: the cap+blocklist gate as an oracle query — surviving docs
    * with their registered domain and within-domain rank. */
  val q146DomainCaps: QueryDef = QueryDef(
    "q146_domain_caps",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val withUrl = d.select(col("doc_id"), syntheticUrl.as("url"))
      val w = Window.partitionBy(col("reg_domain")).orderBy(col("doc_id"))
      withUrl
        .withColumn("reg_domain", registeredDomain(hostOf(col("url"))))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(!col("reg_domain").isin(Blocklist: _*) &&
          col("rk") <= CapPerDomain)
        .select(col("doc_id"), col("reg_domain"), col("rk"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH u AS (SELECT doc_id, $syntheticUrlSql AS url FROM documents),
      $normalizeSqlCtes,
      ranked AS (SELECT doc_id, reg_domain,
          row_number() OVER (PARTITION BY reg_domain ORDER BY doc_id) AS rk
        FROM n)
      SELECT doc_id, reg_domain, CAST(rk AS BIGINT) AS rk FROM ranked
      WHERE reg_domain NOT IN (${Blocklist.map("'" + _ + "'").mkString(", ")})
        AND rk <= $CapPerDomain
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q145UrlNormalize, q146DomainCaps)
}
