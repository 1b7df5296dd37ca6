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

  val all: Seq[QueryDef] = Seq(q29PdfExtract)
}
