package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import graft.tools.HttpTransport
import org.apache.spark.sql.{DataFrame, Row}

/** Vector-store export/sync contract — the K-side dual of the queue
  * connector: the engine's chunk DataFrame (the SURVEY-chosen index
  * representation, D3) synchronized out to an external vector store
  * for serving-path parity with the reference's vector-DB adapter tier
  * (sdk1/adapters/vectordb/: qdrant, pinecone, milvus, weaviate,
  * postgres…; llama-index upsert semantics in sdk1/index.py:389-516).
  *
  * Semantics mirrored from the reference:
  *  - reindex = DELETE every point of the doc_id, then insert the new
  *    chunks (index.py:408-419 delete(ref_doc_id) before add) — never
  *    merge, so stale chunks of a shrunk document cannot survive;
  *  - the index-exists probe (D4) is a doc_id count;
  *  - retrieval = top-k cosine with an optional doc_id filter
  *    (retrievers/simple.py:33-41).
  */
final case class ChunkPoint(id: String, docId: String, chunkId: Long,
    text: String, embedding: Array[Float])

trait ChunkStore extends Serializable {
  def name: String
  def testConnection(): Boolean
  /** Create the collection if missing, pinned to `dim` vectors. */
  def ensureCollection(collection: String, dim: Int): Unit
  /** Remove every point belonging to `docId` (reindex precondition). */
  def deleteDoc(collection: String, docId: String): Unit
  def upsert(collection: String, points: Seq[ChunkPoint]): Unit
  /** D4 probe: how many points exist for `docId`. */
  def countDoc(collection: String, docId: String): Long
  /** Post-bulk-ingest hook, called driver-side once after a sync
    * completes. Default no-op; backends whose index must train on
    * loaded data (pgvector ivfflat list centroids are sampled at
    * CREATE INDEX time — an index built on an empty table has
    * degraded recall forever) build it here, mirroring vecs'
    * create_index-after-upsert flow. */
  def finalizeIngest(collection: String): Unit = ()
  /** Top-k cosine query; `docId` scopes to one document when set. */
  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String] = None): Seq[(ChunkPoint, Double)]
}

object ChunkStores {

  /** The export/sync operator: push a chunk DataFrame
    * (doc_id, chunk_id, text, emb ARRAY<FLOAT>) into a store with
    * delete-then-insert per document. Repartitioned by doc_id so each
    * document's delete + inserts execute on ONE task — no
    * cross-partition race can interleave another task's inserts with
    * this doc's delete. Batched upserts bound request sizes; at 100 TB
    * the store's ingest rate is the bottleneck, not the shuffle.
    *
    * Duplicate-attempt safety: a speculative or retried twin of the
    * SAME partition could interleave — attempt B's deleteDoc wiping
    * attempt A's fresh inserts before B is killed. Two defenses:
    * (1) speculation is disabled for the sync job (external-side-effect
    * writes must run one attempt per task — same rule as foreachBatch
    * sinks); (2) after each document's final flush the task verifies
    * countDoc == expected and rewrites once on mismatch, failing
    * loudly if the count still diverges (catches retry overlap, which
    * speculation=false alone does not). */
  def sync(chunks: DataFrame, mkStore: () => ChunkStore, collection: String,
      dim: Int, batchSize: Int = 256): Unit = {
    val spark = chunks.sparkSession
    // ensure once, driver-side (executors would race the create)
    mkStore().ensureCollection(collection, dim)
    // Best-effort: core confs are not runtime-modifiable on every
    // deployment (SET rejects Spark-core keys by default) — the
    // per-doc verify below is the defense that always holds.
    val prevSpec = spark.conf.getOption("spark.speculation")
    val specSet = scala.util.Try(
      spark.conf.set("spark.speculation", "false")).isSuccess
    try {
      chunks.select("doc_id", "chunk_id", "text", "emb")
        .repartition(org.apache.spark.sql.functions.col("doc_id"))
        .sortWithinPartitions("doc_id", "chunk_id")
        .foreachPartition { (it: Iterator[Row]) =>
          val store = mkStore()
          def writeDoc(doc: String, pts: Seq[ChunkPoint]): Unit = {
            store.deleteDoc(collection, doc)
            pts.grouped(batchSize).foreach(store.upsert(collection, _))
          }
          var currentDoc: String = null
          val docPts = scala.collection.mutable.ArrayBuffer.empty[ChunkPoint]
          def finishDoc(): Unit = if (currentDoc != null) {
            writeDoc(currentDoc, docPts.toSeq)
            val n = store.countDoc(collection, currentDoc)
            if (n != docPts.length.toLong) { // duplicate-attempt overlap
              writeDoc(currentDoc, docPts.toSeq)
              val n2 = store.countDoc(collection, currentDoc)
              require(n2 == docPts.length.toLong,
                s"chunk sync verify failed for doc '$currentDoc': " +
                  s"expected ${docPts.length}, store has $n2 after rewrite")
            }
            docPts.clear()
          }
          it.foreach { r =>
            val doc = r.get(0).toString
            val chunkId = r.getLong(1)
            if (doc != currentDoc) { finishDoc(); currentDoc = doc }
            docPts += ChunkPoint(s"$doc:$chunkId", doc, chunkId,
              r.getString(2), r.getSeq[Float](3).toArray)
          }
          finishDoc()
        }
      // data is loaded — let centroid-training indexes build now
      mkStore().finalizeIngest(collection)
    } finally {
      if (specSet) prevSpec match {
        case Some(v) => spark.conf.set("spark.speculation", v)
        case None    => spark.conf.unset("spark.speculation")
      }
    }
  }

  private[sinks] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}

/** DataFrame-backed store: the engine-native backend (the chunk table
  * IS a DataFrame; this wraps a shared in-JVM map the way a Delta/
  * parquet chunk table would back it on a cluster). Also the contract
  * reference implementation the protocol backends are tested against. */
final class MemoryChunkStore(storeId: String = "default",
    override val name: String = "memory") extends ChunkStore {
  import MemoryChunkStore._

  private def coll(c: String) =
    state.computeIfAbsent(storeId + "/" + c,
      _ => new java.util.concurrent.ConcurrentHashMap[String, ChunkPoint]())

  def testConnection(): Boolean = true
  def ensureCollection(collection: String, dim: Int): Unit = { coll(collection); () }
  def deleteDoc(collection: String, docId: String): Unit = {
    val m = coll(collection)
    m.keySet.removeIf(k => m.get(k) != null && m.get(k).docId == docId)
  }
  def upsert(collection: String, points: Seq[ChunkPoint]): Unit =
    points.foreach(p => coll(collection).put(p.id, p))
  def countDoc(collection: String, docId: String): Long = {
    import scala.jdk.CollectionConverters._
    coll(collection).values.asScala.count(_.docId == docId).toLong
  }
  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    import scala.jdk.CollectionConverters._
    coll(collection).values.asScala.toSeq
      .filter(p => docId.forall(_ == p.docId))
      .map(p => p -> ChunkStores.cosine(p.embedding, vector))
      .sortBy { case (p, s) => (-s, p.id) }
      .take(k)
  }
}

object MemoryChunkStore {
  /** JVM-global backing (MiniRedis pattern): executor tasks in local
    * mode and driver share one map per storeId. */
  private val state = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentHashMap[String, ChunkPoint]]()
  def clear(storeId: String): Unit =
    state.keySet.removeIf(_.startsWith(storeId + "/"))
}

/** Pinecone data-plane protocol store (public REST API, the wire
  * surface under the reference's pinecone adapter —
  * adapters/vectordb/pinecone/). The store binds to ONE index host;
  * `collection` maps to a Pinecone NAMESPACE (the API's own
  * multi-tenancy seam — namespaces are implicit, so ensureCollection
  * verifies the index dimension instead of creating):
  *  - POST {host}/describe_index_stats {}            — probe + dim
  *    check; with {"filter": …} it is also the doc count (D4)
  *  - POST {host}/vectors/upsert  {"namespace","vectors":[{id, values,
  *         metadata}]} — string ids, so the chunk key IS the id
  *  - POST {host}/vectors/delete  {"namespace","filter":
  *         {"doc_id":{"$eq":…}}} — the filtered reindex delete
  *  - POST {host}/query {"namespace","vector","topK","filter",
  *         "includeMetadata":true} → matches[{id, score, metadata}]
  * Auth: `Api-Key` header. */
final class PineconeChunkStore(indexHost: String, apiKey: String,
    mkTransport: () => HttpTransport,
    override val name: String = "pinecone") extends ChunkStore {

  private val mapper = new ObjectMapper()
  @transient private lazy val t = mkTransport()
  private def headers = Map("Api-Key" -> apiKey,
    "Content-Type" -> "application/json")

  private def post(path: String,
      body: com.fasterxml.jackson.databind.JsonNode): graft.tools.HttpResponse =
    t.request("POST", s"$indexHost$path", headers, mapper.writeValueAsBytes(body))

  private def expectOk(r: graft.tools.HttpResponse, what: String): Unit =
    require(r.status == 200,
      s"pinecone $what -> HTTP ${r.status} ${r.text.take(200)}")

  private def docFilter(docId: String) = {
    val f = mapper.createObjectNode()
    f.putObject("doc_id").put("$eq", docId)
    f
  }

  def testConnection(): Boolean =
    scala.util.Try(
      post("/describe_index_stats", mapper.createObjectNode()).status == 200
    ).getOrElse(false)

  def ensureCollection(collection: String, dim: Int): Unit = {
    val r = post("/describe_index_stats", mapper.createObjectNode())
    expectOk(r, "describe_index_stats")
    val d = mapper.readTree(r.text).path("dimension").asInt(-1)
    require(d == dim, s"pinecone index dimension $d != expected $dim")
  }

  def deleteDoc(collection: String, docId: String): Unit = {
    val body = mapper.createObjectNode()
    body.put("namespace", collection)
    body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(docId))
    expectOk(post("/vectors/delete", body), "vectors/delete")
  }

  def upsert(collection: String, points: Seq[ChunkPoint]): Unit = {
    if (points.isEmpty) return
    val body = mapper.createObjectNode()
    body.put("namespace", collection)
    val arr = body.putArray("vectors")
    points.foreach { p =>
      val n = arr.addObject()
      n.put("id", p.id)
      val v = n.putArray("values")
      p.embedding.foreach(v.add)
      val meta = n.putObject("metadata")
      meta.put("doc_id", p.docId)
      meta.put("chunk_id", p.chunkId)
      meta.put("text", p.text)
    }
    expectOk(post("/vectors/upsert", body), "vectors/upsert")
  }

  def countDoc(collection: String, docId: String): Long = {
    val body = mapper.createObjectNode()
    body.put("namespace", collection)
    body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(docId))
    val r = post("/describe_index_stats", body)
    expectOk(r, "describe_index_stats(filter)")
    mapper.readTree(r.text).path("totalVectorCount").asLong(0)
  }

  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    val body = mapper.createObjectNode()
    body.put("namespace", collection)
    val v = body.putArray("vector")
    vector.foreach(v.add)
    body.put("topK", k)
    body.put("includeMetadata", true)
    docId.foreach(d =>
      body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(d)))
    val r = post("/query", body)
    expectOk(r, "query")
    val matches = mapper.readTree(r.text).path("matches")
    (0 until matches.size()).map { i =>
      val m = matches.get(i)
      val meta = m.path("metadata")
      (ChunkPoint(m.path("id").asText(""), meta.path("doc_id").asText(""),
        meta.path("chunk_id").asLong(0), meta.path("text").asText(""),
        Array.emptyFloatArray),
        m.path("score").asDouble(0))
    }
  }
}

/** Qdrant REST protocol store (public HTTP API, the wire surface under
  * the reference's qdrant_client — adapters/vectordb/qdrant/):
  *  - GET  /collections                      — reachability probe
  *  - GET  /collections/{c}  → 200|404       — existence
  *  - PUT  /collections/{c} {"vectors":{"size":d,"distance":"Cosine"}}
  *  - PUT  /collections/{c}/points?wait=true {"points":[{id, vector,
  *         payload}]} — wait=true makes the ack read-your-writes
  *  - POST /collections/{c}/points/delete?wait=true {"filter": doc_id
  *         match}
  *  - POST /collections/{c}/points/count  {"filter", "exact":true}
  *  - POST /collections/{c}/points/search {"vector","limit","filter",
  *         "with_payload":true}
  * Point ids are UUIDv5 of the chunk key (Qdrant requires UUID/uint
  * ids — the reference prefixes ids with doc_id for deletability,
  * index.py:433-441 TODO comment; payload carries the original key). */
final class QdrantChunkStore(baseUrl: String, apiKey: String,
    mkTransport: () => HttpTransport,
    override val name: String = "qdrant") extends ChunkStore {

  private val mapper = new ObjectMapper()
  @transient private lazy val t = mkTransport()
  private def headers = Map("api-key" -> apiKey,
    "Content-Type" -> "application/json")

  private def pointUuid(id: String): String =
    java.util.UUID.nameUUIDFromBytes(id.getBytes("UTF-8")).toString

  private def docFilter(docId: String) = {
    val f = mapper.createObjectNode()
    val m = f.putArray("must").addObject()
    m.put("key", "doc_id")
    m.putObject("match").put("value", docId)
    f
  }

  private def expectOk(r: graft.tools.HttpResponse, what: String): Unit =
    require(r.status == 200, s"qdrant $what -> HTTP ${r.status} ${r.text.take(200)}")

  def testConnection(): Boolean =
    scala.util.Try(
      t.request("GET", s"$baseUrl/collections", headers).status == 200
    ).getOrElse(false)

  def ensureCollection(collection: String, dim: Int): Unit = {
    val probe = t.request("GET", s"$baseUrl/collections/$collection", headers)
    if (probe.status == 404) {
      val body = mapper.createObjectNode()
      body.putObject("vectors").put("size", dim).put("distance", "Cosine")
      expectOk(t.request("PUT", s"$baseUrl/collections/$collection",
        headers, mapper.writeValueAsBytes(body)), "create collection")
    } else expectOk(probe, "collection probe")
  }

  def deleteDoc(collection: String, docId: String): Unit = {
    val body = mapper.createObjectNode()
    body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(docId))
    // ?wait=true: Qdrant acks before applying by default; the verify
    // pass reads an exact count right after this call, so the delete
    // must be committed (not just enqueued) or countDoc sees stale
    // state and triggers a spurious rewrite-then-require() failure
    expectOk(t.request("POST",
      s"$baseUrl/collections/$collection/points/delete?wait=true",
      headers, mapper.writeValueAsBytes(body)), "points/delete")
  }

  def upsert(collection: String, points: Seq[ChunkPoint]): Unit = {
    if (points.isEmpty) return
    val body = mapper.createObjectNode()
    val arr = body.putArray("points")
    points.foreach { p =>
      val n = arr.addObject()
      n.put("id", pointUuid(p.id))
      val v = n.putArray("vector")
      p.embedding.foreach(v.add)
      val pay = n.putObject("payload")
      pay.put("chunk_key", p.id)
      pay.put("doc_id", p.docId)
      pay.put("chunk_id", p.chunkId)
      pay.put("text", p.text)
    }
    // ?wait=true for the same read-your-writes reason as deleteDoc
    expectOk(t.request("PUT",
      s"$baseUrl/collections/$collection/points?wait=true",
      headers, mapper.writeValueAsBytes(body)), "points upsert")
  }

  def countDoc(collection: String, docId: String): Long = {
    val body = mapper.createObjectNode()
    body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(docId))
    body.put("exact", true)
    val r = t.request("POST", s"$baseUrl/collections/$collection/points/count",
      headers, mapper.writeValueAsBytes(body))
    expectOk(r, "points/count")
    mapper.readTree(r.text).path("result").path("count").asLong(0)
  }

  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    val body = mapper.createObjectNode()
    val v = body.putArray("vector")
    vector.foreach(v.add)
    body.put("limit", k)
    body.put("with_payload", true)
    docId.foreach(d =>
      body.set[com.fasterxml.jackson.databind.JsonNode]("filter", docFilter(d)))
    val r = t.request("POST", s"$baseUrl/collections/$collection/points/search",
      headers, mapper.writeValueAsBytes(body))
    expectOk(r, "points/search")
    val res = mapper.readTree(r.text).path("result")
    (0 until res.size()).map { i =>
      val row = res.get(i)
      val pay = row.path("payload")
      // the embedding is not round-tripped (payload-only read)
      (ChunkPoint(pay.path("chunk_key").asText(""),
        pay.path("doc_id").asText(""), pay.path("chunk_id").asLong(0),
        pay.path("text").asText(""), Array.emptyFloatArray),
        row.path("score").asDouble(0))
    }
  }
}
