package graft.operators

import graft.{QueryDef, Tables}
import graft.tools.Pdf
import org.apache.spark.sql.functions._

/** D1/D23 text extraction as an oracle-checked operator: build a PDF per
  * document (the deterministic fixture generator in graft.tools.Pdf),
  * extract text back through the real x2text path — FlateDecode,
  * content-stream tokenization — and verify the round trip against the
  * raw documents table (reference extract tier:
  * legacy_executor.py:189-321, sdk1/adapters/x2text/).
  *
  * Scale design: one decode per row, a pure narrow map — no shuffle, no
  * driver involvement; binary never leaves its partition. The page/line
  * math (80 chars/line, 40 lines/page) is mirrored in SQL by the oracle,
  * and the extracted text must hash-match the original byte-for-byte.
  */
object PdfOps {

  val q29PdfExtract: QueryDef = QueryDef(
    "q29_pdf_extract",
    (s, dir) => {
      // CPU-bound narrow map over unsplittable test parquet → equalize
      val docs = Tables.loadParallel(s, dir, "documents")
      // null text → null struct (oracle's length(NULL) math is all-NULL);
      // empty text still builds a real 1-page/1-line PDF, mirrored by the
      // greatest(…, 1) floor in the oracle.
      val roundTrip = udf { (t: String) =>
        if (t == null) null
        else {
          val d = Pdf.extract(Pdf.build(t))
          (d.nPages, d.lines.size, d.text)
        }
      }
      docs.select(col("doc_id"), roundTrip(col("text")).as("x"))
        .select(col("doc_id"),
          col("x._1").as("n_pages"),
          col("x._2").as("n_lines"),
          col("x._3").as("extracted"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(ceil(greatest(ceil(length(text)/80.0), 1)/40.0) AS INT) AS n_pages,
      CAST(greatest(ceil(length(text)/80.0), 1) AS INT) AS n_lines,
      text AS extracted
      FROM documents ORDER BY doc_id"""),
    headline = true)

  /** A2 pages-processed rollup: the per-document n_pages that q29's
    * extraction emits, summed per run (source) — the reference folds the
    * same counter into run metadata at the destination
    * (destination.py:697-699). Partial aggregation (map-side combine)
    * keeps the shuffle to one row per (source, partition). */
  val q65PagesRollup: QueryDef = QueryDef(
    "q65_pages_rollup",
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val nPages = udf { (t: String) =>
        if (t == null) null.asInstanceOf[java.lang.Integer]
        else Int.box(Pdf.extract(Pdf.build(t)).nPages)
      }
      docs.select(col("source"), nPages(col("text")).as("n_pages"))
        .groupBy(col("source"))
        .agg(sum(col("n_pages")).as("pages_processed"),
          count(col("n_pages")).as("files_processed"))
        .orderBy(col("source"))
    },
    Some("""SELECT source,
      CAST(sum(CAST(ceil(greatest(ceil(length(text)/80.0), 1)/40.0) AS INT)) AS BIGINT) AS pages_processed,
      count(text) AS files_processed
      FROM documents GROUP BY source ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(q29PdfExtract, q65PagesRollup)
}
