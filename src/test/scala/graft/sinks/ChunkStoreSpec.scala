package graft.sinks

import graft.SparkSpec

/** Vector-store export/sync contract, run against all three backends:
  * the engine-native memory store and the Qdrant + Pinecone REST
  * protocols over canned servers — proving D3's delete-then-insert
  * reindex semantics hold wherever chunks are exported. */
class ChunkStoreSpec extends SparkSpec {

  private def contract(mk: () => ChunkStore, coll: String): Unit = {
    val s = mk()
    assert(s.testConnection())
    s.ensureCollection(coll, 4)
    s.ensureCollection(coll, 4) // idempotent

    s.upsert(coll, Seq(
      ChunkPoint("docA:0", "docA", 0, "alpha", Array(1f, 0f, 0f, 0f)),
      ChunkPoint("docA:1", "docA", 1, "beta", Array(0f, 1f, 0f, 0f)),
      ChunkPoint("docB:0", "docB", 0, "gamma", Array(0.9f, 0.1f, 0f, 0f))))
    assert(s.countDoc(coll, "docA") == 2L)
    assert(s.countDoc(coll, "docB") == 1L)
    assert(s.countDoc(coll, "missing") == 0L)

    // top-k cosine: exact match first, near match second
    val hits = s.query(coll, Array(1f, 0f, 0f, 0f), 2)
    assert(hits.map(_._1.text) == Seq("alpha", "gamma"))
    assert(hits.head._2 > hits(1)._2 && hits(1)._2 > 0.9)
    // doc_id filter scopes the search (retrievers/simple.py:33-41)
    val scoped = s.query(coll, Array(1f, 0f, 0f, 0f), 5, Some("docB"))
    assert(scoped.map(_._1.text) == Seq("gamma"))

    // reindex = delete-then-insert: the shrunk doc's stale chunk dies
    s.deleteDoc(coll, "docA")
    assert(s.countDoc(coll, "docA") == 0L)
    s.upsert(coll, Seq(
      ChunkPoint("docA:0", "docA", 0, "alpha v2", Array(0f, 0f, 1f, 0f))))
    assert(s.countDoc(coll, "docA") == 1L)
    assert(s.query(coll, Array(0f, 0f, 1f, 0f), 1).head._1.text == "alpha v2")
  }

  test("memory store satisfies the contract") {
    MemoryChunkStore.clear("spec1")
    contract(() => new MemoryChunkStore("spec1"), "chunks")
  }

  test("Qdrant protocol store satisfies the same contract (canned server)") {
    ChunkStoreSpec.resetQdrant()
    contract(() => new QdrantChunkStore(ChunkStoreSpec.qBase, "qd-key",
      () => ChunkStoreSpec.qdrantServer()), "chunks")
    // bad key is rejected at the probe
    assert(!new QdrantChunkStore(ChunkStoreSpec.qBase, "wrong",
      () => ChunkStoreSpec.qdrantServer()).testConnection())
  }

  test("Pinecone protocol store satisfies the same contract (canned server)") {
    ChunkStoreSpec.resetPinecone()
    contract(() => new PineconeChunkStore(ChunkStoreSpec.pcHost, "pc-key",
      () => ChunkStoreSpec.pineconeServer()), "chunks")
    assert(!new PineconeChunkStore(ChunkStoreSpec.pcHost, "wrong",
      () => ChunkStoreSpec.pineconeServer()).testConnection())
    // dimension mismatch fails fast at ensureCollection
    val s = new PineconeChunkStore(ChunkStoreSpec.pcHost, "pc-key",
      () => ChunkStoreSpec.pineconeServer())
    intercept[IllegalArgumentException](s.ensureCollection("chunks", 128))
  }

  test("sync exports a chunk DataFrame with per-doc reindex, executor-side, on all three backends") {
    import spark.implicits._
    def chunkDf(rows: Seq[(String, Long, String, Seq[Float])]) =
      rows.toDF("doc_id", "chunk_id", "text", "emb")

    for ((mk, label) <- Seq[(() => ChunkStore, String)](
        (() => new MemoryChunkStore("spec-sync"), "memory"),
        (() => new QdrantChunkStore(ChunkStoreSpec.qBase, "qd-key",
          () => ChunkStoreSpec.qdrantServer()), "qdrant"),
        (() => new PineconeChunkStore(ChunkStoreSpec.pcHost, "pc-key",
          () => ChunkStoreSpec.pineconeServer()), "pinecone"))) {
      MemoryChunkStore.clear("spec-sync")
      ChunkStoreSpec.resetQdrant()
      ChunkStoreSpec.resetPinecone()
      val v1 = chunkDf(Seq(
        ("d1", 0L, "one-a", Seq(1f, 0f, 0f, 0f)),
        ("d1", 1L, "one-b", Seq(0f, 1f, 0f, 0f)),
        ("d1", 2L, "one-c", Seq(0f, 0f, 1f, 0f)),
        ("d2", 0L, "two-a", Seq(0f, 0f, 0f, 1f))))
      ChunkStores.sync(v1, mk, "corpus", 4, batchSize = 2)
      val s = mk()
      assert(s.countDoc("corpus", "d1") == 3L, label)
      assert(s.countDoc("corpus", "d2") == 1L, label)

      // re-sync d1 SHRUNK to 1 chunk: old chunk_ids must not survive
      ChunkStores.sync(chunkDf(Seq(
        ("d1", 0L, "one-a2", Seq(0.5f, 0.5f, 0f, 0f)))), mk, "corpus", 4)
      assert(s.countDoc("corpus", "d1") == 1L, label)
      assert(s.countDoc("corpus", "d2") == 1L, label) // untouched doc intact
      assert(s.query("corpus", Array(0.5f, 0.5f, 0f, 0f), 1)
        .head._1.text == "one-a2", label)
    }
  }

  test("sync's per-doc verify repairs a store that silently drops chunks once") {
    import spark.implicits._
    MemoryChunkStore.clear("spec-flaky")
    ChunkStoreSpec.resetFlaky()
    ChunkStores.sync(Seq(
        ("d1", 0L, "a", Seq(1f, 0f, 0f, 0f)),
        ("d1", 1L, "b", Seq(0f, 1f, 0f, 0f)),
        ("d1", 2L, "c", Seq(0f, 0f, 1f, 0f)),
        ("d2", 0L, "x", Seq(0f, 0f, 0f, 1f)))
      .toDF("doc_id", "chunk_id", "text", "emb"),
      () => new ChunkStoreSpec.FlakyStore(new MemoryChunkStore("spec-flaky")),
      "corpus", 4, batchSize = 2)
    // the flaky wrapper dropped d1's first batch's last point on the
    // first write; sync's countDoc verify must have caught the short
    // count and rewritten the whole doc
    val s = new MemoryChunkStore("spec-flaky")
    assert(s.countDoc("corpus", "d1") == 3L)
    assert(s.countDoc("corpus", "d2") == 1L)
    assert(ChunkStoreSpec.flakyDrops.get() >= 1, "the fault must have fired")
  }
}

/** Canned Qdrant REST server (companion object: transports ship to
  * executor tasks in sync()). In-memory collections with real cosine
  * scoring, api-key enforcement, and the routes QdrantChunkStore
  * speaks. */
object ChunkStoreSpec {

  /** Drops the last point of doc d1's FIRST upsert batch, once —
    * simulating a partial batch failure the backend did not report
    * (the Weaviate 200-with-errors shape) or a duplicate task
    * attempt's delete landing between a twin's writes. JVM-global
    * state: the flag must be shared with executor tasks in local mode. */
  val flakyDrops = new java.util.concurrent.atomic.AtomicInteger(0)
  private val flakyArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
  def resetFlaky(): Unit = { flakyDrops.set(0); flakyArmed.set(true) }

  final class FlakyStore(inner: ChunkStore) extends ChunkStore {
    override def name: String = "flaky-" + inner.name
    def testConnection(): Boolean = inner.testConnection()
    def ensureCollection(c: String, dim: Int): Unit =
      inner.ensureCollection(c, dim)
    def deleteDoc(c: String, docId: String): Unit = inner.deleteDoc(c, docId)
    def upsert(c: String, points: Seq[ChunkPoint]): Unit = {
      val pts =
        if (points.exists(_.docId == "d1") &&
            flakyArmed.compareAndSet(true, false)) {
          flakyDrops.incrementAndGet()
          points.dropRight(1)
        } else points
      inner.upsert(c, pts)
    }
    def countDoc(c: String, docId: String): Long = inner.countDoc(c, docId)
    def query(c: String, v: Array[Float], k: Int,
        docId: Option[String]): Seq[(ChunkPoint, Double)] =
      inner.query(c, v, k, docId)
  }

  val qBase = "https://qdrant.example.com"

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  // collection -> point uuid -> (vector, payload json text)
  private val colls = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentHashMap[String, (Array[Float], String)]]()

  def resetQdrant(): Unit = colls.clear()

  def qdrantServer(): graft.tools.CannedTransport = {
    import graft.tools.{HttpResponse => R}
    new graft.tools.CannedTransport({ (method, url, headers, body) =>
      if (headers.get("api-key") != Some("qd-key"))
        R.status(401, """{"status":{"error":"unauthorized"}}""")
      else route(method, url, body)
    })
  }

  // ---- canned Pinecone data plane (dim-4 index, namespace state) ----

  val pcHost = "https://idx-1.svc.example.pinecone.io"

  // namespace -> id -> (vector, metadata json)
  private val pcState = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentHashMap[String, (Array[Float], String)]]()

  def resetPinecone(): Unit = pcState.clear()

  def pineconeServer(): graft.tools.CannedTransport = {
    import graft.tools.{HttpResponse => R}
    import scala.jdk.CollectionConverters._
    new graft.tools.CannedTransport({ (method, url, headers, body) =>
      if (headers.get("Api-Key") != Some("pc-key"))
        R.status(401, """{"message":"unauthorized"}""")
      else if (method != "POST") R.status(405, url)
      else {
        val req = mapper.readTree(body)
        val ns = req.path("namespace").asText("")
        def nsMap = pcState.computeIfAbsent(ns,
          _ => new java.util.concurrent.ConcurrentHashMap())
        def pcMatches(meta: String,
            f: com.fasterxml.jackson.databind.JsonNode): Boolean = {
          if (f == null || f.isMissingNode) return true
          val m = mapper.readTree(meta)
          val it = f.properties().iterator()
          var ok = true
          while (it.hasNext) {
            val e = it.next()
            ok &&= m.path(e.getKey).asText() ==
              e.getValue.path("$eq").asText()
          }
          ok
        }
        url.stripPrefix(pcHost) match {
          case "/describe_index_stats" =>
            val filter = req.path("filter")
            val n =
              if (filter.isMissingNode)
                pcState.values.asScala.map(_.size).sum
              else nsMap.values.asScala.count(v => pcMatches(v._2, filter))
            R.ok(s"""{"dimension":4,"totalVectorCount":$n,"namespaces":{}}""")
          case "/vectors/upsert" =>
            val vecs = req.path("vectors")
            (0 until vecs.size()).foreach { i =>
              val p = vecs.get(i)
              val values = p.path("values")
              nsMap.put(p.path("id").asText(),
                (Array.tabulate(values.size())(j => values.get(j).floatValue()),
                  mapper.writeValueAsString(p.path("metadata"))))
            }
            R.ok(s"""{"upsertedCount":${vecs.size()}}""")
          case "/vectors/delete" =>
            val filter = req.path("filter")
            nsMap.keySet.removeIf(k => pcMatches(nsMap.get(k)._2, filter))
            R.ok("{}")
          case "/query" =>
            val qv = req.path("vector")
            val q = Array.tabulate(qv.size())(j => qv.get(j).floatValue())
            val k = req.path("topK").asInt(10)
            val filter = req.path("filter")
            val hits = nsMap.asScala.toSeq
              .filter { case (_, (_, meta)) => pcMatches(meta, filter) }
              .map { case (id, (vec, meta)) =>
                (ChunkStores.cosine(vec, q), id, meta) }
              .sortBy(h => (-h._1, h._2)).take(k)
              .map { case (s, id, meta) =>
                s"""{"id":${mapper.writeValueAsString(id)},"score":$s,"metadata":$meta}""" }
            R.ok(s"""{"matches":[${hits.mkString(",")}],"namespace":"$ns"}""")
          case p => R.status(404, p)
        }
      }
    })
  }

  private def matchesFilter(payload: String,
      filter: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    if (filter == null || filter.isMissingNode) return true
    val pay = mapper.readTree(payload)
    val must = filter.path("must")
    (0 until must.size()).forall { i =>
      val cond = must.get(i)
      pay.path(cond.path("key").asText()).asText() ==
        cond.path("match").path("value").asText()
    }
  }

  private def route(method: String, url: String,
      body: Array[Byte]): graft.tools.HttpResponse = {
    import graft.tools.{HttpResponse => R}
    import scala.jdk.CollectionConverters._
    val full = url.stripPrefix(qBase)
    val (path, query) = full.indexOf('?') match {
      case -1 => (full, "")
      case i  => (full.substring(0, i), full.substring(i + 1))
    }
    val CollRe = "^/collections/([^/]+)$".r
    val PointsRe = "^/collections/([^/]+)/points$".r
    val OpRe = "^/collections/([^/]+)/points/(delete|count|search)$".r
    // read-your-writes enforcement: the store's sync verify reads an
    // exact count immediately after mutating, so mutations MUST carry
    // ?wait=true — a store that omits it fails the contract here
    val isMutation = (method == "PUT" && PointsRe.matches(path)) ||
      (method == "POST" && path.endsWith("/points/delete"))
    if (isMutation && query != "wait=true")
      return R.status(400,
        """{"status":{"error":"test server requires ?wait=true on mutations"}}""")
    (method, path) match {
      case ("GET", "/collections") =>
        R.ok(s"""{"result":{"collections":[]},"status":"ok"}""")
      case ("GET", CollRe(c)) =>
        if (colls.containsKey(c)) R.ok("""{"result":{},"status":"ok"}""")
        else R.status(404, """{"status":{"error":"not found"}}""")
      case ("PUT", CollRe(c)) =>
        colls.computeIfAbsent(c, _ => new java.util.concurrent.ConcurrentHashMap())
        R.ok("""{"result":true,"status":"ok"}""")
      case ("PUT", PointsRe(c)) =>
        val m = colls.get(c)
        if (m == null) R.status(404, "no collection")
        else {
          val pts = mapper.readTree(body).path("points")
          (0 until pts.size()).foreach { i =>
            val p = pts.get(i)
            val vec = p.path("vector")
            m.put(p.path("id").asText(),
              (Array.tabulate(vec.size())(j => vec.get(j).floatValue()),
                mapper.writeValueAsString(p.path("payload"))))
          }
          R.ok("""{"result":{"status":"acknowledged"},"status":"ok"}""")
        }
      case ("POST", OpRe(c, op)) =>
        val m = colls.get(c)
        if (m == null) R.status(404, "no collection")
        else {
          val req = mapper.readTree(body)
          val filter = req.path("filter")
          op match {
            case "delete" =>
              m.keySet.removeIf(k => matchesFilter(m.get(k)._2, filter))
              R.ok("""{"result":{"status":"acknowledged"},"status":"ok"}""")
            case "count" =>
              val n = m.values.asScala.count(v => matchesFilter(v._2, filter))
              R.ok(s"""{"result":{"count":$n},"status":"ok"}""")
            case "search" =>
              val qv = req.path("vector")
              val q = Array.tabulate(qv.size())(j => qv.get(j).floatValue())
              val k = req.path("limit").asInt(10)
              val hits = m.values.asScala.toSeq
                .filter(v => matchesFilter(v._2, filter))
                .map { case (vec, pay) => (ChunkStores.cosine(vec, q), pay) }
                .sortBy(-_._1).take(k)
                .map { case (s, pay) =>
                  s"""{"score":$s,"payload":$pay}""" }
              R.ok(s"""{"result":[${hits.mkString(",")}],"status":"ok"}""")
          }
        }
      case _ => R.status(404, path)
    }
  }
}
