package graft.sinks

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.tools.{HttpResponse, HttpTransport}

/** Milvus RESTful v2 protocol store (the public HTTP surface under the
  * reference's Milvus adapter — adapters/vectordb/milvus/src/milvus.py:
  * 85-90 binds MilvusVectorStore(uri, token, dim) and llama-index's
  * MilvusClient speaks exactly this API):
  *  - POST /v2/vectordb/collections/list {}            — probe
  *  - POST /v2/vectordb/collections/has {collectionName}
  *  - POST /v2/vectordb/collections/create {collectionName, dimension,
  *         metricType:COSINE, idType:VarChar, primaryFieldName:id,
  *         vectorFieldName:vector} — quick-create; dynamic fields carry
  *         doc_id/chunk_id/text (autoschema, like the reference's
  *         dim-pinned create)
  *  - POST /v2/vectordb/entities/upsert {collectionName, data:[{id,
  *         vector, doc_id, chunk_id, text}]}
  *  - POST /v2/vectordb/entities/delete {collectionName, filter:
  *         'doc_id == "…"'} — the filtered reindex delete
  *  - POST /v2/vectordb/entities/query  {collectionName, filter,
  *         outputFields:["count(*)"]} — the D4 doc-count probe
  *  - POST /v2/vectordb/entities/search {collectionName, data:[[…]],
  *         annsField:vector, limit, filter, outputFields}
  * Every response wraps in {"code":0,"data":…}; a non-zero code is an
  * error even under HTTP 200. With metricType COSINE the search
  * "distance" field IS the cosine similarity (higher = closer).
  * Auth: `Authorization: Bearer <token>` (milvus.py:20 TOKEN). */
final class MilvusChunkStore(baseUrl: String, token: String,
    mkTransport: () => HttpTransport,
    override val name: String = "milvus") extends ChunkStore {

  private val mapper = new ObjectMapper()
  @transient private lazy val t = mkTransport()
  private def headers = Map("Authorization" -> s"Bearer $token",
    "Content-Type" -> "application/json")

  private def post(path: String, body: JsonNode): JsonNode = {
    val r = t.request("POST", s"$baseUrl/v2/vectordb$path", headers,
      mapper.writeValueAsBytes(body))
    require(r.status == 200,
      s"milvus $path -> HTTP ${r.status} ${r.text.take(200)}")
    val root = mapper.readTree(r.text)
    require(root.path("code").asInt(-1) == 0,
      s"milvus $path -> code ${root.path("code")} ${root.path("message").asText("")}")
    root
  }

  /** Milvus filter expressions quote strings with double quotes;
    * escape the value so a crafted doc_id cannot break out of the
    * literal and become a filter injection. */
  private def docFilter(docId: String): String =
    "doc_id == \"" +
      docId.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def collBody(collection: String) = {
    val b = mapper.createObjectNode()
    b.put("collectionName", collection)
    b
  }

  def testConnection(): Boolean =
    scala.util.Try {
      post("/collections/list", mapper.createObjectNode())
      true
    }.getOrElse(false)

  def ensureCollection(collection: String, dim: Int): Unit = {
    val has = post("/collections/has", collBody(collection))
      .path("data").path("has").asBoolean(false)
    if (!has) {
      val b = collBody(collection)
      b.put("dimension", dim)
      b.put("metricType", "COSINE")
      b.put("idType", "VarChar")
      b.put("primaryFieldName", "id")
      b.put("vectorFieldName", "vector")
      b.putObject("params").put("max_length", "256")
      post("/collections/create", b)
    }
  }

  def deleteDoc(collection: String, docId: String): Unit = {
    val b = collBody(collection)
    b.put("filter", docFilter(docId))
    post("/entities/delete", b)
  }

  def upsert(collection: String, points: Seq[ChunkPoint]): Unit = {
    if (points.isEmpty) return
    val b = collBody(collection)
    val arr = b.putArray("data")
    points.foreach { p =>
      val n = arr.addObject()
      n.put("id", p.id)
      val v = n.putArray("vector")
      p.embedding.foreach(v.add)
      n.put("doc_id", p.docId)
      n.put("chunk_id", p.chunkId)
      n.put("text", p.text)
    }
    post("/entities/upsert", b)
  }

  def countDoc(collection: String, docId: String): Long = {
    val b = collBody(collection)
    b.put("filter", docFilter(docId))
    b.putArray("outputFields").add("count(*)")
    post("/entities/query", b).path("data").path(0)
      .path("count(*)").asLong(0)
  }

  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    val b = collBody(collection)
    val v = b.putArray("data").addArray()
    vector.foreach(v.add)
    b.put("annsField", "vector")
    b.put("limit", k)
    docId.foreach(d => b.put("filter", docFilter(d)))
    val of = b.putArray("outputFields")
    Seq("doc_id", "chunk_id", "text").foreach(of.add)
    val data = post("/entities/search", b).path("data")
    (0 until data.size()).map { i =>
      val row = data.get(i)
      (ChunkPoint(row.path("id").asText(""), row.path("doc_id").asText(""),
        row.path("chunk_id").asLong(0), row.path("text").asText(""),
        Array.emptyFloatArray),
        row.path("distance").asDouble(0)) // COSINE metric: similarity
    }
  }
}

/** Weaviate protocol store (public REST v1 + GraphQL — the surface
  * under the reference's weaviate adapter,
  * adapters/vectordb/weaviate/src/weaviate.py:73-96: api-key auth,
  * class created with vectorizer "none" + autoschema, and — a mirrored
  * reference quirk — the collection name capitalized, weaviate.py:68-71):
  *  - GET  /v1/schema            — reachability probe
  *  - GET  /v1/schema/{Class} → 200|404; POST /v1/schema
  *         {"class","vectorizer":"none"} when missing
  *  - POST /v1/batch/objects?consistency_level=ALL
  *         {"objects":[{class, id (UUIDv5 of the chunk key — Weaviate
  *         ids must be UUIDs, same constraint the Qdrant store
  *         handles), properties, vector}]} — ALL makes the ack
  *         read-your-writes for the count verify
  *  - DELETE /v1/batch/objects?consistency_level=ALL
  *         {"match":{"class","where": doc_id Equal}}
  *  - POST /v1/graphql Aggregate{meta{count}}  — the D4 count probe
  *  - POST /v1/graphql Get(nearVector, limit, where) — search; Weaviate
  *    reports certainty = (1+cosine)/2, mapped back to cosine so every
  *    backend scores on the same scale. */
final class WeaviateChunkStore(baseUrl: String, apiKey: String,
    mkTransport: () => HttpTransport,
    override val name: String = "weaviate") extends ChunkStore {

  private val mapper = new ObjectMapper()
  @transient private lazy val t = mkTransport()
  private def headers = Map("Authorization" -> s"Bearer $apiKey",
    "Content-Type" -> "application/json")

  private def clazz(collection: String): String = collection.capitalize

  private def objectUuid(id: String): String =
    java.util.UUID.nameUUIDFromBytes(id.getBytes("UTF-8")).toString

  private def expectOk(r: HttpResponse, what: String): Unit =
    require(r.status == 200,
      s"weaviate $what -> HTTP ${r.status} ${r.text.take(200)}")

  private def gql(query: String): JsonNode = {
    val b = mapper.createObjectNode()
    b.put("query", query)
    val r = t.request("POST", s"$baseUrl/v1/graphql", headers,
      mapper.writeValueAsBytes(b))
    expectOk(r, "graphql")
    val root = mapper.readTree(r.text)
    require(root.path("errors").isMissingNode || root.path("errors").size() == 0,
      s"weaviate graphql errors: ${root.path("errors").toString.take(200)}")
    root.path("data")
  }

  /** GraphQL string literal with escapes — doc_ids are data, not query
    * syntax. */
  private def gqlStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def whereDoc(docId: String): String =
    s"""where: {path: ["doc_id"], operator: Equal, valueText: ${gqlStr(docId)}}"""

  def testConnection(): Boolean =
    scala.util.Try(
      t.request("GET", s"$baseUrl/v1/schema", headers).status == 200
    ).getOrElse(false)

  def ensureCollection(collection: String, dim: Int): Unit = {
    val c = clazz(collection)
    val probe = t.request("GET", s"$baseUrl/v1/schema/$c", headers)
    if (probe.status == 404) {
      val b = mapper.createObjectNode()
      b.put("class", c)
      b.put("vectorizer", "none")
      expectOk(t.request("POST", s"$baseUrl/v1/schema", headers,
        mapper.writeValueAsBytes(b)), "schema create")
    } else expectOk(probe, "schema probe")
  }

  /** Weaviate caps batch-delete matches per request (server default
    * 10,000), so one call is not a guarantee the doc is gone: a
    * document with more chunks than the cap would silently retain
    * stale points. Loop until the server reports zero matches, and
    * fail loudly if it never drains (a defensive bound far above any
    * cap/chunk-count ratio a sane deployment would see). */
  def deleteDoc(collection: String, docId: String): Unit = {
    val b = mapper.createObjectNode()
    val m = b.putObject("match")
    m.put("class", clazz(collection))
    val w = m.putObject("where")
    w.putArray("path").add("doc_id")
    w.put("operator", "Equal")
    w.put("valueText", docId)
    val body = mapper.writeValueAsBytes(b)
    val maxRounds = 1000
    var round = 0
    while (round < maxRounds) {
      // consistency_level=ALL: the verify pass reads an Aggregate count
      // right after this drains, so the ack must mean every replica
      // committed — otherwise countDoc can observe stale state and
      // trigger a spurious rewrite on a healthy sync
      val r = t.request("DELETE",
        s"$baseUrl/v1/batch/objects?consistency_level=ALL", headers, body)
      expectOk(r, "batch delete")
      val matches = mapper.readTree(r.text)
        .path("results").path("matches").asLong(0L)
      if (matches == 0L) return
      round += 1
    }
    throw new IllegalStateException(
      s"weaviate batch delete for doc '$docId' did not drain after " +
        s"$maxRounds rounds — server still reports matches")
  }

  def upsert(collection: String, points: Seq[ChunkPoint]): Unit = {
    if (points.isEmpty) return
    val b = mapper.createObjectNode()
    val arr = b.putArray("objects")
    points.foreach { p =>
      val n = arr.addObject()
      n.put("class", clazz(collection))
      n.put("id", objectUuid(p.id))
      val props = n.putObject("properties")
      props.put("chunk_key", p.id)
      props.put("doc_id", p.docId)
      props.put("chunk_id", p.chunkId)
      props.put("text", p.text)
      val v = n.putArray("vector")
      p.embedding.foreach(v.add)
    }
    // consistency_level=ALL for the same read-your-writes reason as
    // deleteDoc (the count verify runs immediately after)
    val r = t.request("POST",
      s"$baseUrl/v1/batch/objects?consistency_level=ALL", headers,
      mapper.writeValueAsBytes(b))
    expectOk(r, "batch upsert")
    // Weaviate returns HTTP 200 even when individual objects fail —
    // each element of the response array carries result.status /
    // result.errors. Surface partial failures instead of letting the
    // collection silently diverge from the chunk frame (same contract
    // the Milvus store enforces via its code!=0 check).
    val resp = mapper.readTree(r.text)
    if (resp.isArray) {
      val it = resp.elements()
      while (it.hasNext) {
        val o = it.next()
        val res = o.path("result")
        val failed = res.path("status").asText("") == "FAILED" ||
          (res.has("errors") && res.path("errors").path("error").size() > 0)
        if (failed)
          throw new IllegalStateException(
            "weaviate batch upsert: object " +
              o.path("id").asText("?") + " failed: " +
              res.path("errors").toString.take(300))
      }
    }
  }

  def countDoc(collection: String, docId: String): Long = {
    val c = clazz(collection)
    val data = gql(
      s"""{ Aggregate { $c(${whereDoc(docId)}) { meta { count } } } }""")
    data.path("Aggregate").path(c).path(0).path("meta").path("count").asLong(0)
  }

  def query(collection: String, vector: Array[Float], k: Int,
      docId: Option[String]): Seq[(ChunkPoint, Double)] = {
    val c = clazz(collection)
    val near = s"nearVector: {vector: [${vector.mkString(",")}]}"
    val args = (Seq(near, s"limit: $k") ++ docId.map(whereDoc)).mkString(", ")
    val data = gql(s"""{ Get { $c($args) """ +
      """{ chunk_key doc_id chunk_id text _additional { certainty } } } }""")
    val rows = data.path("Get").path(c)
    (0 until rows.size()).map { i =>
      val row = rows.get(i)
      (ChunkPoint(row.path("chunk_key").asText(""),
        row.path("doc_id").asText(""), row.path("chunk_id").asLong(0),
        row.path("text").asText(""), Array.emptyFloatArray),
        2.0 * row.path("_additional").path("certainty").asDouble(0) - 1.0)
    }
  }
}
