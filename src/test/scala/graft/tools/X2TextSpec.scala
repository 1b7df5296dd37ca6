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
}
