package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-stage operators (SURVEY.md §2.1-2.2): listing caps, glob/MIME
  * filters, ordering, content-hash dedup, history anti-join — expressed
  * over the `documents` table standing in for a file listing (doc_id ↔
  * file id, source ↔ connector folder, n_chars ↔ size, text ↔ content).
  *
  * At 100 TB these run against `binaryFile`/parquet listings; all
  * predicates here are pushdown-able and the dedup joins shuffle only the
  * (hash, id) projection, never the content column.
  */
object SourceOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** S2/F3: case-insensitive glob filter on the source "folder". */
  val q20GlobFilter: QueryDef = QueryDef(
    "q20_glob_filter",
    (s, dir) =>
      docs(s, dir)
        .filter(globMatch(col("source"), "src1*"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source")),
    Some("""SELECT source, count(*) AS n_docs FROM documents
      WHERE lower(source) LIKE 'src1%'
      GROUP BY source ORDER BY source"""))

  /** S3/S4/W1/W4: ordered listing with cap (FIFO by size desc, id tiebreak). */
  val q21ListingOrderLimit: QueryDef = QueryDef(
    "q21_listing_order_limit",
    (s, dir) =>
      docs(s, dir)
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("n_chars").desc, col("doc_id")),
    Some("""SELECT doc_id, source, n_chars FROM documents
      ORDER BY n_chars DESC, doc_id LIMIT 100"""))

  /** F1/P2/S5: exact content dedup via sha256 — keep min doc_id per hash
    * (the reference's FileHistory cache_key semantics, source.py:938-954). */
  val q22ShaDedup: QueryDef = QueryDef(
    "q22_sha_dedup",
    (s, dir) =>
      docs(s, dir)
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("content_hash")),
    Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS keep_doc_id,
      count(*) AS n_copies
      FROM documents GROUP BY sha256(text) ORDER BY content_hash"""))

  /** P3/J1: history dedup — anti-join against a COMPLETED history set
    * (modeled as every doc whose id ≡ 0 mod 10 having a history row). */
  val q23HistoryAntiJoin: QueryDef = QueryDef(
    "q23_history_anti_join",
    (s, dir) => {
      val d = docs(s, dir)
      val history = d.filter(col("doc_id") % 10 === 0)
        .select(sha2(col("text"), 256).as("cache_key"),
          lit("COMPLETED").as("status"))
      d.join(history.filter(col("status") === "COMPLETED"),
          sha2(d("text"), 256) === history("cache_key"), "left_anti")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source FROM documents d
      WHERE NOT EXISTS (
        SELECT 1 FROM documents h
        WHERE h.doc_id % 10 = 0 AND sha256(h.text) = sha256(d.text))
      ORDER BY doc_id"""))

  /** P5: NA → null sanitize over string columns. */
  val q24NaSanitize: QueryDef = QueryDef(
    "q24_na_sanitize",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          naSanitize(col("lang")).as("lang_clean"),
          naSanitize(substring(col("text"), 1, 2)).as("head_clean"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CASE WHEN lower(trim(lang)) = 'na' THEN NULL ELSE lang END AS lang_clean,
      CASE WHEN lower(trim(substr(text, 1, 2))) = 'na' THEN NULL
           ELSE substr(text, 1, 2) END AS head_clean
      FROM documents ORDER BY doc_id"""))

  /** P10: allow-list filter (MIME gate analog on lang). */
  val q25AllowList: QueryDef = QueryDef(
    "q25_allow_list",
    (s, dir) =>
      docs(s, dir)
        .filter(col("lang").isin("en", "de", "es"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
      FROM documents WHERE lang IN ('en', 'de', 'es')
      GROUP BY lang ORDER BY lang"""))

  /** W2: file_number sequence over the listing order (row_number).
    * The reference caps sortable listings at 40 000 files
    * (endpoint_v2/constants.py:196-198); applying the same cap BEFORE the
    * window bounds the sequence stage — TakeOrdered keeps the top rows
    * per-partition and the numbering window only ever sees ≤40k rows,
    * never the whole (100 TB) listing. */
  val q26FileNumber: QueryDef = QueryDef(
    "q26_file_number",
    (s, dir) => {
      val capped = docs(s, dir)
        .select(col("doc_id"), col("source"))
        .orderBy(col("source"), col("doc_id"))
        .limit(40000)
      Ranks.sequenceNumber(capped, Seq(col("source"), col("doc_id")), "file_number")
        .orderBy(col("file_number"))
    },
    Some("""SELECT doc_id, source,
      row_number() OVER (ORDER BY source, doc_id) AS file_number
      FROM (SELECT doc_id, source FROM documents
            ORDER BY source, doc_id LIMIT 40000) capped
      ORDER BY file_number"""))

  val all: Seq[QueryDef] = Seq(
    q20GlobFilter, q21ListingOrderLimit, q22ShaDedup, q23HistoryAntiJoin,
    q24NaSanitize, q25AllowList, q26FileNumber)
}
