package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D1 HTTP x2text adapters against canned transports — the adapter code
  * is production code; only the transport is a test double. */
class X2TextSpec extends SparkSpec {

  import X2TextSpec.{base, whispererTransport}

  test("LLMWhisperer v2: test-connection, sync whisper, async poll, bounded timeout") {
    val a = new LLMWhispererV2Adapter(base, "k1", () => whispererTransport())
    assert(a.testConnection())
    assert(!new LLMWhispererV2Adapter(base, "wrong", () => whispererTransport())
      .testConnection())

    val sync = a.process("a.txt", "hello doc".getBytes("UTF-8"))
    assert(sync.extractedText === "TEXT:hello doc")
    assert(sync.metadata("whisper_hash") === "h-sync")

    // async: 202 → whisper-retrieve polled until 200
    val slow = a.process("b.txt", "slow doc".getBytes("UTF-8"))
    assert(slow.extractedText === "TEXT:slow doc")

    // a job that never completes surfaces as an error, not a spin
    val stuck = new CannedTransport({ (m, url, _, _) =>
      if (url.contains("whisper-retrieve")) HttpResponse.status(202, "{}")
      else if (m == "POST") HttpResponse.status(202, """{"whisper_hash":"h"}""")
      else HttpResponse.ok("{}")
    })
    val bounded = new LLMWhispererV2Adapter(base, "k1", () => stuck, maxPolls = 5)
    val e = intercept[IllegalStateException](
      bounded.process("c.txt", "x".getBytes("UTF-8")))
    assert(e.getMessage.contains("timed out"))
  }

  test("Unstructured: element texts concatenate; non-200 throws") {
    val t = new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("unstructured-api-key") != Some("k2"))
        HttpResponse.status(401, "bad key")
      else HttpResponse.ok(
        """[{"type":"Title","text":"Heading"},{"type":"NarrativeText","text":"Body."},{"type":"Image","text":""}]""")
    })
    val a = new UnstructuredAdapter("https://unstructured.example.com/general/v0/general",
      "k2", () => t)
    assert(a.testConnection())
    val r = a.process("doc.pdf", "bytes".getBytes("UTF-8"))
    assert(r.extractedText === "Heading\n\nBody.")
    assert(r.metadata("n_elements") === "3")
    val bad = new UnstructuredAdapter("https://unstructured.example.com/x", "nope", () => t)
    assert(!bad.testConnection())
    intercept[IllegalStateException](bad.process("d.pdf", Array[Byte](1)))
  }

  test("extractUdf: distributed per-row extraction with error rows, via TextExtractorTool") {
    import spark.implicits._
    X2Text.register("canned_whisperer",
      () => new LLMWhispererV2Adapter(base, "k1", () => whispererTransport()))
    try {
      val df = Seq(
        ("a.txt", "hello doc".getBytes("UTF-8")),
        ("b.txt", "slow doc".getBytes("UTF-8")),
        ("c.txt", "bad doc".getBytes("UTF-8"))).toDF("file_name", "content")
      val out = graft.pipeline.TextExtractorTool(df,
        Map("adapter" -> "canned_whisperer"))
        .select("file_name", "text", "error_message")
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2))).toMap
      assert(out("a.txt")._1 === "TEXT:hello doc" && out("a.txt")._2 == null)
      assert(out("b.txt")._1 === "TEXT:slow doc" && out("b.txt")._2 == null)
      // the 500 is an error ROW — the batch survives one bad document
      assert(out("c.txt")._1 == null)
      assert(out("c.txt")._2.startsWith("x2text_failed:"))
    } finally X2Text.unregister("canned_whisperer")
  }

  test("LLMWhisperer v1: /v1 endpoints, hyphenated hash key, status-then-retrieve async, header hash") {
    import X2TextSpec.whispererV1Transport
    val a = new LLMWhispererV1Adapter(base, "k1", () => whispererV1Transport())
    assert(a.testConnection())
    assert(!new LLMWhispererV1Adapter(base, "wrong", () => whispererV1Transport())
      .testConnection())

    // sync 200: text from top-level `text`, hash from the response header
    val sync = a.process("a.txt", "hello doc".getBytes("UTF-8"))
    assert(sync.extractedText === "V1:hello doc")
    assert(sync.metadata("whisper_hash") === "hdr-sync")

    // async 202: whisper-status polled (processing → processed), one retrieve
    val slow = a.process("b.txt", "slow doc".getBytes("UTF-8"))
    assert(slow.extractedText === "V1:slow doc")
    assert(slow.metadata("whisper_hash") === "hdr-async")

    // a job stuck at `processing` surfaces as an error, never spins
    val stuck = new CannedTransport({ (m, url, _, _) =>
      if (url.contains("whisper-status"))
        HttpResponse.ok("""{"status":"processing"}""")
      else if (m == "POST") HttpResponse.status(202, """{"whisper-hash":"h"}""")
      else HttpResponse.ok("{}")
    })
    val bounded = new LLMWhispererV1Adapter(base, "k1", () => stuck, maxPolls = 5)
    val e = intercept[IllegalStateException](
      bounded.process("c.txt", "x".getBytes("UTF-8")))
    assert(e.getMessage.contains("never reached processed"))

    // non-200 whisper is a terminal error (raise_for_status parity)
    intercept[IllegalStateException](
      a.process("bad.txt", "bad doc".getBytes("UTF-8")))
  }

  test("LlamaParse: multipart upload, job poll to SUCCESS, result fetch; ERROR jobs and timeouts throw") {
    import X2TextSpec.llamaParseTransport
    val a = new LlamaParseAdapter(base, "lp-key", () => llamaParseTransport())
    assert(a.testConnection())
    assert(!new LlamaParseAdapter(base, "bad-key", () => llamaParseTransport())
      .testConnection())

    val r = a.process("doc.pdf", "pdf bytes".getBytes("UTF-8"))
    assert(r.extractedText === "LP:pdf bytes")
    assert(r.metadata("job_id").nonEmpty)

    // markdown result type routes to /result/markdown
    val md = new LlamaParseAdapter(base, "lp-key", () => llamaParseTransport(),
      resultType = "markdown")
    assert(md.process("doc.pdf", "pdf bytes".getBytes("UTF-8"))
      .extractedText === "# LP:pdf bytes")

    // a job that lands in ERROR throws (ignore_errors=False parity)
    intercept[IllegalStateException](
      a.process("doc.pdf", "error doc".getBytes("UTF-8")))
    // a job that never leaves PENDING is bounded
    val pending = new LlamaParseAdapter(base, "lp-key",
      () => llamaParseTransport(), maxPolls = 4)
    val e = intercept[IllegalStateException](
      pending.process("doc.pdf", "pending doc".getBytes("UTF-8")))
    assert(e.getMessage.contains("timed out"))
  }

  test("v1 and LlamaParse plug the same registry/UDF plumbing as v2") {
    import spark.implicits._
    import X2TextSpec.{whispererV1Transport, llamaParseTransport}
    X2Text.register("canned_v1",
      () => new LLMWhispererV1Adapter(base, "k1", () => whispererV1Transport()))
    X2Text.register("canned_lp",
      () => new LlamaParseAdapter(base, "lp-key", () => llamaParseTransport()))
    try {
      val df = Seq(("a.txt", "hello doc".getBytes("UTF-8")),
        ("bad.txt", "bad doc".getBytes("UTF-8"))).toDF("file_name", "content")
      val v1 = graft.pipeline.TextExtractorTool(df, Map("adapter" -> "canned_v1"))
        .select("file_name", "text", "error_message").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
      assert(v1("a.txt")._1 === "V1:hello doc" && v1("a.txt")._2 == null)
      assert(v1("bad.txt")._1 == null &&
        v1("bad.txt")._2.startsWith("x2text_failed:"))
      val lp = graft.pipeline.TextExtractorTool(df, Map("adapter" -> "canned_lp"))
        .select("file_name", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(lp("a.txt") === "LP:hello doc")
    } finally { X2Text.unregister("canned_v1"); X2Text.unregister("canned_lp") }
  }

  test("JdkHttpTransport refuses non-https and link-local targets without touching the network") {
    val t = new JdkHttpTransport()
    intercept[SecurityException](t.request("GET", "http://plain.example.com/x"))
    intercept[SecurityException](t.request("GET", "https://169.254.169.254/meta"))
    intercept[SecurityException](t.request("GET", "https://localhost/x"))
  }
}

/** Canned services live on the companion OBJECT: closures shipped to
  * executors must not capture the (non-serializable) suite instance. */
object X2TextSpec {
  val base = "https://whisper.example.com"

  /** Canned LLMWhisperer v2: sync for small docs, async (202 + two
    * retrieve polls) for bodies containing "slow", 500 for "bad". */
  def whispererTransport(): CannedTransport = {
    val polls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("unstract-key") != Some("k1"))
        HttpResponse.status(401, "bad key")
      else if (method == "GET" && url.startsWith(s"$base/api/v2/test-connection"))
        HttpResponse.ok("""{"status":"ok"}""")
      else if (method == "POST" && url.startsWith(s"$base/api/v2/whisper?")) {
        val text = new String(body, "UTF-8")
        if (text.contains("bad")) HttpResponse.status(500, "boom")
        else if (text.contains("slow"))
          HttpResponse.status(202, """{"whisper_hash":"h-slow"}""")
        else HttpResponse.ok(
          s"""{"whisper_hash":"h-sync","extraction":{"result_text":"TEXT:$text"}}""")
      } else if (method == "GET" && url.startsWith(s"$base/api/v2/whisper-retrieve")) {
        val n = polls.merge("h-slow", 1, (a, b) => a + b)
        if (n < 3) HttpResponse.status(202, """{"status":"processing"}""")
        else HttpResponse.ok(
          """{"whisper_hash":"h-slow","extraction":{"result_text":"TEXT:slow doc"}}""")
      } else HttpResponse.status(404, url)
    })
  }

  /** Canned LLMWhisperer v1: /v1 endpoints, `whisper-hash` (hyphen)
    * keys, header-borne hash, status-then-retrieve async protocol. */
  def whispererV1Transport(): CannedTransport = {
    val polls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("unstract-key") != Some("k1"))
        HttpResponse.status(401, "bad key")
      else if (method == "GET" && url.startsWith(s"$base/v1/test-connection"))
        HttpResponse.ok("""{"status":"ok"}""")
      else if (method == "POST" && url.startsWith(s"$base/v1/whisper?")) {
        // the adapter must send the reference's default param set
        assert(url.contains("output_json=true") && url.contains("add_line_nos=true")
          && url.contains("page_seperator="), s"missing v1 params: $url")
        val text = new String(body, "UTF-8")
        if (text.contains("bad")) HttpResponse.status(500, "boom")
        else if (text.contains("slow"))
          HttpResponse(202, Map("whisper-hash" -> "hdr-async"),
            """{"whisper-hash":"h-v1"}""".getBytes("UTF-8"))
        else HttpResponse(200, Map("whisper-hash" -> "hdr-sync"),
          s"""{"text":"V1:$text"}""".getBytes("UTF-8"))
      } else if (method == "GET" && url.startsWith(s"$base/v1/whisper-status")) {
        assert(url.contains("whisper-hash=h-v1"), s"wrong hash key: $url")
        val n = polls.merge("h-v1", 1, (a, b) => a + b)
        if (n < 3) HttpResponse.ok("""{"status":"processing"}""")
        else HttpResponse.ok("""{"status":"processed"}""")
      } else if (method == "GET" && url.startsWith(s"$base/v1/whisper-retrieve")) {
        assert(url.contains("whisper-hash=h-v1"), s"wrong hash key: $url")
        HttpResponse.ok("""{"text":"V1:slow doc"}""")
      } else HttpResponse.status(404, url)
    })
  }

  /** Canned LlamaParse (LlamaCloud parsing API): multipart upload →
    * job id, PENDING→SUCCESS poll, typed result endpoints. */
  def llamaParseTransport(): CannedTransport = {
    val jobs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val polls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val ids = new java.util.concurrent.atomic.AtomicInteger()
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("Authorization") != Some("Bearer lp-key"))
        HttpResponse.status(401, "bad key")
      else if (method == "POST" && url == s"$base/api/parsing/upload") {
        val raw = new String(body, "UTF-8")
        // multipart sanity: boundary framing + file part present
        assert(headers.get("Content-Type").exists(_.contains("boundary=")) &&
          raw.contains("""name="file""""), "not multipart/form-data")
        val content = raw.substring(raw.indexOf("\r\n\r\n") + 4,
          raw.lastIndexOf("\r\n--"))
        val id = s"job-${ids.incrementAndGet()}"
        jobs.put(id, content)
        HttpResponse.ok(s"""{"id":"$id","status":"PENDING"}""")
      } else if (method == "GET" && url.matches(s"$base/api/parsing/job/[^/]+")) {
        val id = url.substring(url.lastIndexOf('/') + 1)
        val content = jobs.getOrDefault(id, "")
        val status =
          if (content.contains("error")) "ERROR"
          else if (content.contains("pending")) "PENDING"
          else if (polls.merge(id, 1, (a, b) => a + b) < 3) "PENDING"
          else "SUCCESS"
        HttpResponse.ok(s"""{"id":"$id","status":"$status"}""")
      } else if (method == "GET" && url.endsWith("/result/text")) {
        val id = url.split("/").dropRight(2).last
        HttpResponse.ok(s"""{"text":"LP:${jobs.get(id)}"}""")
      } else if (method == "GET" && url.endsWith("/result/markdown")) {
        val id = url.split("/").dropRight(2).last
        HttpResponse.ok(s"""{"markdown":"# LP:${jobs.get(id)}"}""")
      } else HttpResponse.status(404, url)
    })
  }
}
