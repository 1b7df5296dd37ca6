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
    readTimeoutMs: Int = 120000) extends HttpTransport {

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

/** Canned transport: routes every request through a handler — the
  * sandbox/test double for services unreachable from here (LLMWhisperer,
  * Unstructured, an HTTP file server). Handlers are driver-defined
  * closures; keep them pure so executor-side replays are safe. */
final class CannedTransport(
    handler: (String, String, Map[String, String], Array[Byte]) => HttpResponse)
    extends HttpTransport {
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
