package graft.sinks

import java.sql.Connection

/** pgvector protocol store — the SQL surface under BOTH the
  * reference's Postgres adapter (adapters/vectordb/postgres/src/
  * postgres.py:85-95, llama-index PGVectorStore.from_params with a
  * `data_<collection>` table pinned to embed_dim) and its Supabase
  * adapter (adapters/vectordb/supabase/src/supabase.py:82-88 — the
  * same Postgres wire behind a connection string), so one store covers
  * the two roster rows.
  *
  * Layout mirrors PGVectorStore's: one table per collection named
  * `data_<collection>`, an `embedding vector(dim)` column, cosine
  * distance via the `<=>` operator, and a doc-scoped delete for the
  * reindex path (index.py:408-419 delete(ref_doc_id) before add).
  * The store owns no pool: it takes a connection factory so each
  * executor task opens its own connection (the same per-task-slot
  * pattern as the DB sink), and statements are always parameterized —
  * doc ids and text are data, never SQL.
  *
  * Vectors bind in pgvector's text form `[x,y,…]` cast with
  * `?::vector`, the representation psycopg2/vecs use on the wire. */
final class PgVectorChunkStore(mkConn: () => Connection,
    override val name: String = "pgvector") extends ChunkStore {

  @transient private lazy val conn = mkConn()

  private def table(collection: String): String = {
    require(collection.matches("[A-Za-z0-9_]+"),
      s"collection must be a bare identifier: $collection")
    "\"data_" + collection + "\""
  }

  private def vecText(v: Array[Float]): String =
    v.mkString("[", ",", "]")

  def testConnection(): Boolean =
    scala.util.Try {
      val st = conn.createStatement()
      try { val rs = st.executeQuery("SELECT 1"); rs.next() }
      finally st.close()
    }.getOrElse(false)

  def ensureCollection(collection: String, dim: Int): Unit = {
    val tn = table(collection)
    val st = conn.createStatement()
    try {
      st.execute("CREATE EXTENSION IF NOT EXISTS vector")
      st.execute(s"CREATE TABLE IF NOT EXISTS $tn (" +
        "id TEXT PRIMARY KEY, doc_id TEXT, chunk_id BIGINT, " +
        s"text TEXT, embedding vector($dim))")
      // the two indexes PGVectorStore maintains: ANN on the embedding
      // (hnsw, cosine opclass) and a btree on the delete/filter key
      st.execute(s"""CREATE INDEX IF NOT EXISTS "data_${collection}_emb_idx" """ +
        s"ON $tn USING hnsw (embedding vector_cosine_ops)")
      st.execute(s"""CREATE INDEX IF NOT EXISTS "data_${collection}_doc_idx" """ +
        s"ON $tn (doc_id)")
    } finally st.close()
  }

  def deleteDoc(collection: String, docId: String): Unit = {
    val ps = conn.prepareStatement(
      s"DELETE FROM ${table(collection)} WHERE doc_id = ?")
    try { ps.setString(1, docId); ps.executeUpdate(); () }
    finally ps.close()
  }

  def upsert(collection: String, points: Seq[ChunkPoint]): Unit = {
    if (points.isEmpty) return
    val ps = conn.prepareStatement(
      s"INSERT INTO ${table(collection)} " +
        "(id, doc_id, chunk_id, text, embedding) " +
        "VALUES (?, ?, ?, ?, ?::vector) " +
        "ON CONFLICT (id) DO UPDATE SET doc_id = EXCLUDED.doc_id, " +
        "chunk_id = EXCLUDED.chunk_id, text = EXCLUDED.text, " +
        "embedding = EXCLUDED.embedding")
    try {
      points.foreach { p =>
        ps.setString(1, p.id)
        ps.setString(2, p.docId)
        ps.setLong(3, p.chunkId)
        ps.setString(4, p.text)
        ps.setString(5, vecText(p.embedding))
        ps.addBatch()
      }
      ps.executeBatch()
      ()
    } finally ps.close()
  }

  def countDoc(collection: String, docId: String): Long = {
    val ps = conn.prepareStatement(
      s"SELECT count(*) FROM ${table(collection)} WHERE doc_id = ?")
    try {
      ps.setString(1, docId)
      val rs = ps.executeQuery()
      if (rs.next()) rs.getLong(1) else 0L
    } finally ps.close()
  }

  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    val where = if (docId.isDefined) "WHERE doc_id = ? " else ""
    val ps = conn.prepareStatement(
      "SELECT id, doc_id, chunk_id, text, " +
        s"1 - (embedding <=> ?::vector) AS score " +
        s"FROM ${table(collection)} $where" +
        "ORDER BY embedding <=> ?::vector, id LIMIT ?")
    try {
      val vt = vecText(vector)
      var i = 1
      ps.setString(i, vt); i += 1
      docId.foreach { d => ps.setString(i, d); i += 1 }
      ps.setString(i, vt); i += 1
      ps.setInt(i, k)
      val rs = ps.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[(ChunkPoint, Double)]
      while (rs.next()) {
        out += ((ChunkPoint(rs.getString(1), rs.getString(2), rs.getLong(3),
          rs.getString(4), Array.emptyFloatArray), rs.getDouble(5)))
      }
      out.toSeq
    } finally ps.close()
  }
}
