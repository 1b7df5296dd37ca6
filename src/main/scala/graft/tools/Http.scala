package graft.tools

/** Minimal HTTP response surface the adapter/connector tier consumes. */
final case class HttpResponse(
    status: Int, headers: Map[String, String], body: Array[Byte]) {
  def text: String = new String(body, java.nio.charset.StandardCharsets.UTF_8)
  def header(k: String): Option[String] =
    headers.collectFirst { case (h, v) if h.equalsIgnoreCase(k) => v }
}

/** Injectable HTTP transport — the seam between the engine and every
  * HTTP-backed service (x2text adapters, the fsspec-style HTTP
  * connector). Serializable so a per-partition instance can ride into
  * executors; implementations must be either stateless or
  * lazily-connected. Tests inject [[CannedTransport]]; production uses
  * [[JdkHttpTransport]]. The same inversion the reference gets from
  * `requests`/fsspec being mockable. */
trait HttpTransport extends Serializable {
  def request(method: String, url: String,
      headers: Map[String, String] = Map.empty,
      body: Array[Byte] = Array.emptyByteArray): HttpResponse
}

/** JDK-only production transport (HttpURLConnection — zero added
  * dependencies). Every request passes the same SSRF guard as webhook
  * delivery (Postprocess.urlAllowed): adapters take user-configured
  * URLs, and a crafted one must not become a proxy into link-local or
  * metadata endpoints from inside the cluster. */
final class JdkHttpTransport(connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 120000) extends HttpTransport with SseTransport {

  /** True incremental SSE: lines surface as the server flushes them,
    * not after the response completes. Same SSRF guard as [[request]];
    * the connection closes when the iterator is exhausted. */
  override def streamLines(method: String, url: String,
      headers: Map[String, String], body: Array[Byte]): Iterator[String] = {
    if (!graft.pipeline.Postprocess.urlAllowed(url))
      throw new SecurityException(s"transport url rejected: $url")
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setInstanceFollowRedirects(false)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body.nonEmpty) {
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
    }
    val status = conn.getResponseCode
    if (status >= 400) {
      val es = conn.getErrorStream
      val msg = if (es == null) "" else
        try new String(es.readAllBytes(), "UTF-8").take(200) finally es.close()
      conn.disconnect()
      throw new IllegalStateException(s"stream request failed: HTTP $status $msg")
    }
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      conn.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    new Iterator[String] {
      private var nextLine: String = reader.readLine()
      def hasNext: Boolean = {
        if (nextLine == null) { reader.close(); conn.disconnect() }
        nextLine != null
      }
      def next(): String = {
        val l = nextLine; nextLine = reader.readLine(); l
      }
    }
  }

  def request(method: String, url: String, headers: Map[String, String],
      body: Array[Byte]): HttpResponse = {
    if (!graft.pipeline.Postprocess.urlAllowed(url))
      throw new SecurityException(s"transport url rejected: $url")
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setInstanceFollowRedirects(false) // a redirect could re-target a guarded host
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (body.nonEmpty) {
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(body) finally os.close()
      }
      val status = conn.getResponseCode
      val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val bytes =
        if (is == null) Array.emptyByteArray
        else try is.readAllBytes() finally is.close()
      val hdrs = {
        import scala.jdk.CollectionConverters._
        conn.getHeaderFields.asScala.collect {
          case (k, vs) if k != null && !vs.isEmpty => k -> vs.get(0)
        }.toMap
      }
      HttpResponse(status, hdrs, bytes)
    } finally conn.disconnect()
  }
}

/** Line-streaming extension for server-sent-event endpoints (the LLM
  * providers' `stream:true` surface). The default delegates to
  * [[HttpTransport.request]] and splits the buffered body — correct
  * framing, not incremental; [[JdkHttpTransport]] overrides with a
  * lazily-read connection so chunks surface as they arrive. */
trait SseTransport { self: HttpTransport =>
  def streamLines(method: String, url: String,
      headers: Map[String, String] = Map.empty,
      body: Array[Byte] = Array.emptyByteArray): Iterator[String] = {
    val r = request(method, url, headers, body)
    if (r.status >= 400)
      throw new IllegalStateException(
        s"stream request failed: HTTP ${r.status} ${r.text.take(200)}")
    r.text.linesIterator
  }
}

/** Canned transport: routes every request through a handler — the
  * sandbox/test double for services unreachable from here (LLMWhisperer,
  * Unstructured, an HTTP file server). Handlers are driver-defined
  * closures; keep them pure so executor-side replays are safe.
  * Streaming reads use the buffered [[SseTransport]] default: a canned
  * SSE reply is its full body, split into lines. */
final class CannedTransport(
    handler: (String, String, Map[String, String], Array[Byte]) => HttpResponse)
    extends HttpTransport with SseTransport {
  def request(method: String, url: String, headers: Map[String, String],
      body: Array[Byte]): HttpResponse = handler(method, url, headers, body)
}

object HttpResponse {
  def ok(text: String): HttpResponse =
    HttpResponse(200, Map("Content-Type" -> "application/json"),
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  def status(code: Int, text: String = ""): HttpResponse =
    HttpResponse(code, Map.empty,
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
