package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerplate-removal step between
  * a raw crawl and every text operator in this engine (C4 started from
  * stripped WET text; RefinedWeb re-extracted with trafilatura
  * precisely because naive stripping keeps nav/footer debris). The
  * heuristic is the published text-density family (Arc90 readability /
  * jusText / trafilatura): segment the page into blocks, score each
  * block by VISIBLE text length and LINK DENSITY (chars inside anchors
  * / visible chars), keep long low-link blocks — navigation is short
  * and link-saturated, content is long and link-sparse.
  *
  * The documents table carries no HTML, so q190 synthesizes a
  * deterministic page per document (title, link-heavy nav, content
  * paragraphs, link-bearing footer) from (doc_id, source, text) — the
  * q145/q69 convention: synthesize the wrapper, then run the REAL
  * operator. Correctness is self-validating: the kept blocks must
  * reconstruct exactly the document's text and the dropped blocks are
  * exactly the injected chrome.
  *
  * Engine parity: one shared regex subset (`<[^>]*>` tag strip,
  * `<a[^>]*>([^<]*)</a>` anchor contents) that both Java regex and
  * DuckDB's RE2 implement identically — no lookarounds, no
  * backreferences, no lazy quantifiers.
  *
  * Scale: a narrow per-document projection (split → per-block regex
  * arithmetic → filtered join), no shuffle at all before the output
  * epilogue; block count is per-document local. */
object HtmlOps {

  private val MinVisible = 15   // chars a content block must carry
  private val MaxLinkDensity = 1.0 / 3.0

  /** q190: synthesize page → extract main content by text density. */
  val q190HtmlExtract: QueryDef = QueryDef(
    "q190_html_extract",
    (s, dir) => {
      val html = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("html", concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>"),
          lit("<div><p>"), col("text"), lit("</p></div>"),
          lit("<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a> (c) "), col("source"),
          lit("</footer></body></html>")))
      val blocks = html
        .select(col("doc_id"), col("text"),
          posexplode(split(col("html"), "</(p|nav|footer|title)>"))
            .as(Seq("block_idx", "block")))
        .withColumn("visible",
          regexp_replace(col("block"), "<[^>]*>", ""))
        .withColumn("link_chars",
          expr("""aggregate(regexp_extract_all(block, '<a[^>]*>([^<]*)</a>', 1),
                 |  0L, (acc, x) -> acc + length(x))""".stripMargin))
        .withColumn("n_visible", length(col("visible")).cast("long"))
        .withColumn("link_density",
          when(col("n_visible") === 0L, lit(1.0))
            .otherwise(col("link_chars").cast("double") / col("n_visible")))
        .withColumn("kept",
          col("n_visible") >= MinVisible &&
            col("link_density") <= MaxLinkDensity)
      blocks
        .groupBy(col("doc_id"), col("text"))
        .agg(
          count(lit(1)).as("n_blocks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          concat_ws("", transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("block_idx"), col("visible"))))),
            x => x("visible"))).as("extracted"))
        .select(col("doc_id"), col("n_blocks"), col("n_kept"),
          col("extracted"), (col("extracted") === col("text")).as("clean"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH h AS (SELECT doc_id, text,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</title></head><body>' ||
          '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
          '<div><p>' || text || '</p></div>' ||
          '<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> (c) ' || source ||
          '</footer></body></html>' AS html
        FROM documents),
      b AS (SELECT doc_id, text, t.i - 1 AS block_idx, sp[t.i] AS block
        FROM (SELECT doc_id, text,
            regexp_split_to_array(html, '</(p|nav|footer|title)>') AS sp
          FROM h) x, unnest(range(1, len(sp) + 1)) AS t(i)),
      m AS (SELECT doc_id, text, block_idx,
          regexp_replace(block, '<[^>]*>', '', 'g') AS visible,
          CAST(coalesce(len(array_to_string(
            regexp_extract_all(block, '<a[^>]*>([^<]*)</a>', 1), '')), 0) AS BIGINT)
            AS link_chars
        FROM b),
      sc AS (SELECT doc_id, text, block_idx, visible,
          CAST(length(visible) AS BIGINT) AS n_visible,
          CASE WHEN length(visible) = 0 THEN 1.0
               ELSE CAST(link_chars AS DOUBLE) / length(visible) END AS link_density
        FROM m),
      k AS (SELECT doc_id, text, block_idx, visible,
          n_visible >= $MinVisible AND link_density <= 1.0 / 3.0 AS kept
        FROM sc)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        coalesce(string_agg(CASE WHEN kept THEN visible END, ''
          ORDER BY block_idx), '') AS extracted,
        coalesce(string_agg(CASE WHEN kept THEN visible END, ''
          ORDER BY block_idx), '') = text AS clean
      FROM k GROUP BY doc_id, text ORDER BY doc_id"""),
    headline = false)

  val all: Seq[QueryDef] = Seq(q190HtmlExtract)
}
