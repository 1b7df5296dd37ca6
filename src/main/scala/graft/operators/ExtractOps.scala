package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structure-pipeline operators (SURVEY.md D1-D2, D10-D18, A1) with the
  * deterministic mock LLM expressed at the Column level — every
  * "completion" is a pure function of the document text, mirroring the
  * reference's LLM_MOCK_RESPONSE e2e strategy, so the whole extraction
  * chain is oracle-checkable.
  *
  * The same conversions run behind the UDF-based pipeline surface
  * (graft.pipeline.Extraction) — see ExtractionSpec for the unit tier.
  */
object ExtractOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** Occurrences of word `w` via length arithmetic (identical across
    * engines: pure integer ops). Plain `replace`, not `regexp_replace`:
    * the literal-substring scan skips the regex engine entirely in the
    * hottest narrow map of the extraction tier. */
  private def occurrences(c: org.apache.spark.sql.Column, w: String) =
    ((length(c) - length(call_function("replace", c, lit(w)))) / w.length).cast("long")

  private def occurrencesSql(c: String, w: String) =
    s"CAST((length($c) - length(replace($c, '$w', ''))) / ${w.length} AS BIGINT)"

  /** D1+D10-D14: full typed-field extraction over the scanned docs —
    * number, boolean, text, date, summary (D2) fields in one narrow
    * stage. */
  val q36TypedExtraction: QueryDef = QueryDef(
    "q36_typed_extraction",
    (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        occurrences(col("text"), "batch").cast("double").as("n_batch"),
        col("text").contains("spark").as("mentions_spark"),
        naSanitize(element_at(split(trim(col("text")), "\\s+"), 1)).as("first_word"),
        date_add(lit("2024-01-01").cast("date"), (col("doc_id") % 365).cast("int")).as("review_date"),
        substring(col("text"), 1, 64).as("summary"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
      CAST(${occurrencesSql("text", "batch")} AS DOUBLE) AS n_batch,
      contains(text, 'spark') AS mentions_spark,
      CASE WHEN lower(trim(regexp_split_to_array(trim(text), '\\s+')[1])) = 'na'
           THEN NULL ELSE regexp_split_to_array(trim(text), '\\s+')[1] END AS first_word,
      DATE '2024-01-01' + CAST(doc_id % 365 AS INT) AS review_date,
      substr(text, 1, 64) AS summary
      FROM documents ORDER BY doc_id"""),
    headline = true)

  /** D17 single-pass fusion: all fields computed from ONE shared struct
    * (one "LLM call"), then unpacked — results identical to per-field
    * extraction; the plan shows a single projection. */
  val q37SinglePass: QueryDef = QueryDef(
    "q37_single_pass",
    (s, dir) => {
      val fused = struct(
        occurrences(col("text"), "batch").cast("double").as("n_batch"),
        col("text").contains("spark").as("mentions_spark"),
        naSanitize(element_at(split(trim(col("text")), "\\s+"), 1)).as("first_word"))
      docs(s, dir)
        .withColumn("__sp", fused)
        .select(col("doc_id"), col("__sp.n_batch").as("n_batch"),
          col("__sp.mentions_spark").as("mentions_spark"),
          col("__sp.first_word").as("first_word"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
      CAST(${occurrencesSql("text", "batch")} AS DOUBLE) AS n_batch,
      contains(text, 'spark') AS mentions_spark,
      CASE WHEN lower(trim(regexp_split_to_array(trim(text), '\\s+')[1])) = 'na'
           THEN NULL ELSE regexp_split_to_array(trim(text), '\\s+')[1] END AS first_word
      FROM documents ORDER BY doc_id"""))

  /** D18 challenge: a second, independent "model" (token-wise count vs
    * substring count) verifies the n_batch answer; disagreements are
    * flagged (legacy_executor.py:1539-1595). */
  val q38Challenge: QueryDef = QueryDef(
    "q38_challenge",
    (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        occurrences(col("text"), "batch").as("answer"),
        size(filter(split(trim(col("text")), "\\s+"), w => w === "batch")).cast("long").as("challenge"))
        .withColumn("verified", col("answer") === col("challenge"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id, answer, challenge, answer = challenge AS verified FROM (
      SELECT doc_id,
        ${occurrencesSql("text", "batch")} AS answer,
        CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w = 'batch')) AS BIGINT) AS challenge
      FROM documents) x ORDER BY doc_id"""))

  /** D14/P7/P8: JSON answer extraction — structured output serialized to
    * JSON and parsed back (round-trip through both engines' JSON
    * formatters must agree). */
  val q39JsonField: QueryDef = QueryDef(
    "q39_json_field",
    (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        to_json(struct(col("lang"), col("n_chars"))).as("payload"))
        .withColumn("parsed_chars", get_json_object(col("payload"), "$.n_chars").cast("long"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, payload,
      CAST(json_extract_string(payload, '$.n_chars') AS BIGINT) AS parsed_chars
      FROM (SELECT doc_id,
        to_json(struct_pack(lang := lang, n_chars := n_chars)) AS payload
      FROM documents) x ORDER BY doc_id"""))

  /** A1: token-usage rollup — per-source sums of prompt/completion token
    * counts and cost (usage_v2/helper.py:55-95). */
  val q40UsageRollup: QueryDef = QueryDef(
    "q40_usage_rollup",
    (s, dir) => {
      val tokens = tokenCount(col("text"))
      docs(s, dir)
        .select(col("source"), tokens.as("prompt_tokens"),
          (tokens + lit(12L)).as("total_tokens"))
        .groupBy(col("source"))
        .agg(sum(col("prompt_tokens")).as("prompt_tokens"),
          sum(col("total_tokens")).as("total_tokens"),
          count(lit(1)).as("n_runs"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, CAST(sum(prompt_tokens) AS BIGINT) AS prompt_tokens,
      CAST(sum(total_tokens) AS BIGINT) AS total_tokens, count(*) AS n_runs FROM (
        SELECT source,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS prompt_tokens,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) + 12 AS BIGINT) AS total_tokens
        FROM documents) x
      GROUP BY source ORDER BY source"""))

  /** D22 classify: bin documents by dominant topic keyword, 'unknown'
    * fallback (tools/classifier/src/main.py:22-162) — routing becomes
    * write.partitionBy(classification) at the sink. */
  val q41Classify: QueryDef = QueryDef(
    "q41_classify",
    (s, dir) => {
      val cJoin = occurrences(col("text"), "join")
      val cAgg = occurrences(col("text"), "agg")
      val cScan = occurrences(col("text"), "scan")
      docs(s, dir).select(col("doc_id"), cJoin.as("c_join"), cAgg.as("c_agg"), cScan.as("c_scan"))
        .withColumn("classification",
          when(col("c_join") === 0 && col("c_agg") === 0 && col("c_scan") === 0, "unknown")
            .when(col("c_join") >= col("c_agg") && col("c_join") >= col("c_scan"), "joins")
            .when(col("c_agg") >= col("c_scan"), "aggs")
            .otherwise("scans"))
        .groupBy(col("classification"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("classification"))
    },
    Some(s"""SELECT classification, count(*) AS n_docs FROM (
      SELECT CASE
        WHEN c_join = 0 AND c_agg = 0 AND c_scan = 0 THEN 'unknown'
        WHEN c_join >= c_agg AND c_join >= c_scan THEN 'joins'
        WHEN c_agg >= c_scan THEN 'aggs'
        ELSE 'scans' END AS classification FROM (
          SELECT ${occurrencesSql("text", "join")} AS c_join,
                 ${occurrencesSql("text", "agg")} AS c_agg,
                 ${occurrencesSql("text", "scan")} AS c_scan
          FROM documents) c) x
      GROUP BY classification ORDER BY classification"""))

  /** A4 answered-prompt rollup: of the typed prompts q36 runs per
    * document, count the non-null outputs per run (source) — the
    * reference counts successful prompt outputs into execution metadata
    * (legacy_executor.py:719-720). Here first_word is genuinely nullable
    * (NA-sanitized), so answered < total where documents start with
    * "NA". */
  val q66AnsweredRollup: QueryDef = QueryDef(
    "q66_answered_rollup",
    (s, dir) => {
      val outputs = Seq(
        occurrences(col("text"), "batch").cast("double").as("n_batch"),
        col("text").contains("spark").as("mentions_spark"),
        naSanitize(element_at(split(trim(col("text")), "\\s+"), 1)).as("first_word"))
      val answered = outputs.map(c => when(c.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _)
      docs(s, dir)
        .select(col("source"), answered.as("n_answered"))
        .groupBy(col("source"))
        .agg(sum(col("n_answered")).as("answered_prompts"),
          (count(lit(1)) * outputs.size).as("total_prompts"))
        .orderBy(col("source"))
    },
    Some(s"""SELECT source,
      CAST(sum(n_answered) AS BIGINT) AS answered_prompts,
      CAST(count(*) * 3 AS BIGINT) AS total_prompts FROM (
        SELECT source,
          (CASE WHEN ${occurrencesSql("text", "batch")} IS NOT NULL THEN 1 ELSE 0 END) +
          (CASE WHEN contains(text, 'spark') IS NOT NULL THEN 1 ELSE 0 END) +
          (CASE WHEN (CASE WHEN lower(trim(regexp_split_to_array(trim(text), '\\s+')[1])) = 'na'
                THEN NULL ELSE regexp_split_to_array(trim(text), '\\s+')[1] END) IS NOT NULL
             THEN 1 ELSE 0 END) AS n_answered
        FROM documents) x
      GROUP BY source ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(
    q36TypedExtraction, q37SinglePass, q38Challenge, q39JsonField,
    q40UsageRollup, q41Classify, q66AnsweredRollup)
}
