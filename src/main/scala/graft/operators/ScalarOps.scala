package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining scalar-function surface (SURVEY.md §2.8): base64 (F4),
  * parse_string literal-eval (P8) via try_cast, unicode handling (F9).
  * sha256/json/uuid/now are exercised by SourceOps/ExtractOps/Sinks.
  */
object ScalarOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** F4: base64 of content (the manual-review queue encodes file bytes —
    * destination.py:1090-1143). */
  val q27Base64: QueryDef = QueryDef(
    "q27_base64",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          base64(substring(col("text"), 1, 30).cast("binary")).as("b64_head"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, to_base64(encode(substr(text, 1, 30))) AS b64_head
      FROM documents ORDER BY doc_id"""))

  /** P8: parse_string — string → typed literal when parseable, else
    * passthrough/null (destination.py:559-591) via try_cast. */
  val q28ParseString: QueryDef = QueryDef(
    "q28_parse_string",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          concat(col("n_chars").cast("string"), lit("."), (col("doc_id") % 10).cast("string")).as("numstr"),
          element_at(split(trim(col("text")), "\\s+"), 1).as("wordstr"))
        .select(col("doc_id"),
          col("numstr").try_cast("double").as("parsed_num"),
          col("wordstr").try_cast("double").as("parsed_word"),
          coalesce(col("wordstr").try_cast("double").cast("string"), col("wordstr")).as("literal_or_passthrough"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      TRY_CAST(numstr AS DOUBLE) AS parsed_num,
      TRY_CAST(wordstr AS DOUBLE) AS parsed_word,
      coalesce(CAST(TRY_CAST(wordstr AS DOUBLE) AS VARCHAR), wordstr) AS literal_or_passthrough
      FROM (SELECT doc_id,
        CAST(n_chars AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR) AS numstr,
        regexp_split_to_array(trim(text), '\s+')[1] AS wordstr
      FROM documents) x ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q27Base64, q28ParseString)
}
