package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Chunker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-stage operators (SURVEY.md D3-D4): chunk explode, index keying
  * (doc_id = sha256 of content-hash + adapter configs + chunk params),
  * index-exists probe (anti-join form), and the seen-params CSE dedup.
  *
  * Scale: chunking is explode (narrow); the chunk table is written
  * partitioned by index_key prefix so the D4 probe is a partition-pruned
  * lookup, and reindex = delete-then-insert on one key.
  */
object IndexOps {

  private val Size = 128
  private val Overlap = 32

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  /** D3: chunk every document into sliding character windows. */
  val q34ChunkExplode: QueryDef = QueryDef(
    "q34_chunk_explode",
    (s, dir) =>
      Chunker.explodeChunks(docs(s, dir), "text", "n_chars", Size, Overlap)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
          length(col("chunk_text")).as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""SELECT doc_id, chunk_id, chunk_text, length(chunk_text) AS chunk_len FROM (
      SELECT doc_id, i AS chunk_id,
        substr(text, CAST(i * ${Size - Overlap} + 1 AS INT), $Size) AS chunk_text FROM (
          SELECT doc_id, text, unnest(generate_series(0,
            greatest(CAST(ceil((n_chars - $Overlap.0) / ${Size - Overlap}.0) AS BIGINT) - 1, 0))) AS i
          FROM documents) w) c
      ORDER BY doc_id, chunk_id"""))

  /** D3/D4: index keying + the seen-params dedup — one index entry per
    * distinct (content, adapter-config) pair; duplicate configs collapse
    * (legacy_executor.py:927-978, sdk1/index.py:460-516). */
  val q35IndexKeys: QueryDef = QueryDef(
    "q35_index_keys",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          Chunker.indexKey(sha2(col("text"), 256), "mock-emb", "mock-vdb",
            "plain-text", Size, Overlap).as("index_key"))
        .groupBy(col("index_key"))
        .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_docs"))
        .orderBy(col("index_key")),
    Some(s"""SELECT index_key, min(doc_id) AS first_doc, count(*) AS n_docs FROM (
      SELECT doc_id, sha256(concat_ws('|', sha256(text), 'mock-emb', 'mock-vdb',
        'plain-text', '$Size', '$Overlap')) AS index_key
      FROM documents) x GROUP BY index_key ORDER BY index_key"""))

  /** D3+D5 capstone: the whole index pipeline in one query — chunk every
    * document, embed each chunk with the deterministic mock embedder
    * (8 dims from sha256 nibble pairs, zero-centered), then retrieve the
    * top-5 chunks nearest the query chunk (doc 0, chunk 0) by dot
    * product. Chunking and embedding are narrow maps; retrieval is a
    * broadcast query vector + TakeOrdered — the same shape the real
    * pipeline runs with an HTTP embedding adapter.
    */
  val q58IndexPipeline: QueryDef = QueryDef(
    "q58_index_pipeline",
    (s, dir) => {
      // mock embedding: element k = (nibble(2k)*16 + nibble(2k+1))/255 - 0.5
      // 255.0D/0.5D: Spark parses bare decimal literals as DecimalType and
      // the division would truncate to 6 digits; DuckDB computes in double
      val embedExpr =
        """transform(sequence(0, 7), k ->
          |  (
          |    (instr('0123456789abcdef', substr(h, k * 2 + 1, 1)) - 1) * 16 +
          |    (instr('0123456789abcdef', substr(h, k * 2 + 2, 1)) - 1)
          |  ) / 255.0D - 0.5D)""".stripMargin
      val chunks = Chunker.explodeChunks(docs(s, dir), "text", "n_chars", Size, Overlap)
        .select(col("doc_id"), col("chunk_id"),
          expr("substr(sha2(chunk_text, 256), 1, 16)").as("h"))
        .withColumn("emb", expr(embedExpr))
        .drop("h")
      val qv = chunks.filter(col("doc_id") === 0 && col("chunk_id") === 0)
        .select(col("emb").as("qv"))
      chunks.crossJoin(broadcast(qv))
        .filter(!(col("doc_id") === 0 && col("chunk_id") === 0))
        .select(col("doc_id"), col("chunk_id"),
          // raw double: both engines run the same sequential fold, so the
          // bits match exactly; round() would diverge at half-ulp
          // boundaries (seen at sf0.1)
          expr("aggregate(zip_with(emb, qv, (x, y) -> x * y), 0D, (a, x) -> a + x)").as("score"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
        .limit(5)
    },
    Some(s"""WITH chunks AS (
        SELECT doc_id, chunk_id,
          substr(sha256(chunk_text), 1, 16) AS h FROM (
          SELECT doc_id, i AS chunk_id,
            substr(text, CAST(i * ${Size - Overlap} + 1 AS INT), $Size) AS chunk_text FROM (
            SELECT doc_id, text, unnest(generate_series(0,
              greatest(CAST(ceil((n_chars - $Overlap.0) / ${Size - Overlap}.0) AS BIGINT) - 1, 0))) AS i
            FROM documents) w) c),
      embedded AS (
        SELECT doc_id, chunk_id,
          [((instr('0123456789abcdef', substr(h, k * 2 + 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef', substr(h, k * 2 + 2, 1)) - 1)) / 255.0 - 0.5
           for k in range(0, 8)] AS emb
        FROM chunks),
      q AS (SELECT emb AS qv FROM embedded WHERE doc_id = 0 AND chunk_id = 0)
      SELECT doc_id, chunk_id,
        list_sum(list_transform(list_zip(emb, qv), x -> x[1] * x[2])) AS score
      FROM embedded, q
      WHERE NOT (doc_id = 0 AND chunk_id = 0)
      ORDER BY score DESC, doc_id, chunk_id LIMIT 5"""),
    headline = true)

  val all: Seq[QueryDef] = Seq(q34ChunkExplode, q35IndexKeys, q58IndexPipeline)
}
