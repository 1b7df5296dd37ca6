package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D15/D16: table and line-item extraction — the reference's
  * plugin-backed generators (legacy_executor.py:2002-2162) as Spark
  * Generator shapes: window the document, extract per window, merge rows
  * by union/explode.
  */
object LineItemOps {

  private val Win = 64 // "page" window size, chars

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** D16 line-item: explode doc into page windows, per-window mock
    * extraction (count of 'line'), keep itemized windows. */
  val q42LineItems: QueryDef = QueryDef(
    "q42_line_items",
    (s, dir) =>
      docs(s, dir)
        .withColumn("window_id", explode(sequence(lit(0L),
          greatest(ceil(col("n_chars").cast("double") / Win).cast("long"), lit(1L)) - 1)))
        .withColumn("page", expr(s"substring(text, cast(window_id * $Win + 1 as int), $Win)"))
        .select(col("doc_id"), col("window_id"),
          ((length(col("page")) - length(call_function("replace", col("page"), lit("line")))) / 4).cast("long").as("n_line"))
        .filter(col("n_line") > 0)
        .orderBy(col("doc_id"), col("window_id")),
    Some(s"""SELECT doc_id, window_id,
      CAST((length(page) - length(replace(page, 'line', ''))) / 4 AS BIGINT) AS n_line
      FROM (
        SELECT doc_id, window_id,
          substr(text, CAST(window_id * $Win + 1 AS INT), $Win) AS page
        FROM (
          SELECT doc_id, text, unnest(generate_series(0,
            greatest(CAST(ceil(n_chars / $Win.0) AS BIGINT), 1) - 1)) AS window_id
          FROM documents) w) p
      WHERE CAST((length(page) - length(replace(page, 'line', ''))) / 4 AS BIGINT) > 0
      ORDER BY doc_id, window_id"""))

  /** D15 table extraction (row form): per-doc keyword table unpivoted to
    * (doc_id, word, cnt) rows via stack — the Generator/UDTF shape. */
  val q43Unpivot: QueryDef = QueryDef(
    "q43_unpivot",
    (s, dir) => {
      def cnt(w: String) =
        ((length(col("text")) - length(call_function("replace", col("text"), lit(w)))) / w.length).cast("long")
      docs(s, dir)
        .select(col("doc_id"), cnt("join").as("c_join"), cnt("agg").as("c_agg"), cnt("scan").as("c_scan"))
        .select(col("doc_id"),
          expr("stack(3, 'agg', c_agg, 'join', c_join, 'scan', c_scan) as (word, cnt)"))
        .orderBy(col("doc_id"), col("word"))
    },
    Some("""WITH c AS (SELECT doc_id,
        CAST((length(text) - length(replace(text, 'join', ''))) / 4 AS BIGINT) AS c_join,
        CAST((length(text) - length(replace(text, 'agg', ''))) / 3 AS BIGINT) AS c_agg,
        CAST((length(text) - length(replace(text, 'scan', ''))) / 4 AS BIGINT) AS c_scan
      FROM documents)
      SELECT doc_id, word, cnt FROM (
        SELECT doc_id, 'agg' AS word, c_agg AS cnt FROM c
        UNION ALL SELECT doc_id, 'join', c_join FROM c
        UNION ALL SELECT doc_id, 'scan', c_scan FROM c) u
      ORDER BY doc_id, word"""))

  /** D15 directory mode: per-document keyword tables merged into ONE
    * table per directory (`source` stands for the scanned directory)
    * with provenance and a per-directory row id — the table_executor
    * plugin's whole-directory output (legacy_executor.py:2002-2074).
    * The row-number window is PARTITIONED by directory, so numbering
    * scales with directories instead of funneling the corpus. */
  val q67TableDirectory: QueryDef = QueryDef(
    "q67_table_directory",
    (s, dir) => {
      def cnt(w: String) =
        ((length(col("text")) - length(call_function("replace", col("text"), lit(w)))) / w.length).cast("long")
      val rows = docs(s, dir)
        .select(col("source"), col("doc_id"),
          cnt("join").as("c_join"), cnt("agg").as("c_agg"), cnt("scan").as("c_scan"))
        .select(col("source"), col("doc_id"),
          expr("stack(3, 'agg', c_agg, 'join', c_join, 'scan', c_scan) as (word, cnt)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"), col("word"))
      rows.withColumn("table_row", row_number().over(w))
        .orderBy(col("source"), col("table_row"))
    },
    Some("""WITH c AS (SELECT source, doc_id,
        CAST((length(text) - length(replace(text, 'join', ''))) / 4 AS BIGINT) AS c_join,
        CAST((length(text) - length(replace(text, 'agg', ''))) / 3 AS BIGINT) AS c_agg,
        CAST((length(text) - length(replace(text, 'scan', ''))) / 4 AS BIGINT) AS c_scan
      FROM documents),
      u AS (SELECT source, doc_id, 'agg' AS word, c_agg AS cnt FROM c
        UNION ALL SELECT source, doc_id, 'join', c_join FROM c
        UNION ALL SELECT source, doc_id, 'scan', c_scan FROM c)
      SELECT source, doc_id, word, cnt,
        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id, word) AS INT) AS table_row
      FROM u ORDER BY source, table_row"""))

  val all: Seq[QueryDef] = Seq(q42LineItems, q43Unpivot, q67TableDirectory)
}
