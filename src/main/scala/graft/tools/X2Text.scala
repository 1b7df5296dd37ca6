package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions.udf

/** D1 x2text adapter tier over HTTP — the reference's text-extraction
  * SDK adapters (sdk1/adapters/x2text/: llm_whisperer_v2, unstructured,
  * llama_parse, no_op) re-expressed against the injectable
  * [[HttpTransport]] seam. Protocol shapes mirror the reference
  * helpers; the transport is canned in-sandbox and [[JdkHttpTransport]]
  * in production — adapter code is identical either way.
  */
final case class TextExtractionResult(
    extractedText: String, metadata: Map[String, String])

trait X2TextAdapter extends Serializable {
  def name: String
  /** Cheap reachability/credential probe (test_connection). */
  def testConnection(): Boolean
  /** Extract text from one document's bytes. Throws on a terminal
    * service error — the UDF wrapper turns that into an error ROW. */
  def process(fileName: String, content: Array[Byte]): TextExtractionResult
}

private object Json {
  val mapper = new ObjectMapper()
  def parse(s: String): JsonNode = mapper.readTree(s)
  def str(n: JsonNode, field: String): String = {
    val v = n.path(field)
    if (v.isMissingNode || v.isNull) "" else v.asText()
  }
}

/** LLMWhisperer v2 protocol (llm_whisperer_v2/src/helper.py):
  *  - GET  {base}/api/v2/test-connection            → 200 = reachable
  *  - POST {base}/api/v2/whisper?...  (raw bytes)   → 200 sync result |
  *    202 accepted with whisper_hash
  *  - GET  {base}/api/v2/whisper-retrieve?whisper_hash=h → 202 still
  *    processing | 200 result
  * Result JSON carries `whisper_hash` and `extraction.result_text`.
  * Polling is bounded: a stuck job surfaces as an error, never spins. */
final class LLMWhispererV2Adapter(baseUrl: String, apiKey: String,
    mkTransport: () => HttpTransport, mode: String = "form",
    maxPolls: Int = 60, pollDelayMs: Long = 0L) extends X2TextAdapter {

  val name = "llm_whisperer_v2"
  @transient private lazy val transport = mkTransport()
  private def auth = Map("unstract-key" -> apiKey)

  def testConnection(): Boolean =
    scala.util.Try(
      transport.request("GET", s"$baseUrl/api/v2/test-connection", auth).status == 200
    ).getOrElse(false)

  def process(fileName: String, content: Array[Byte]): TextExtractionResult = {
    val r = transport.request("POST",
      s"$baseUrl/api/v2/whisper?mode=$mode&output_mode=layout_preserving" +
        s"&file_name=${java.net.URLEncoder.encode(fileName, "UTF-8")}",
      auth ++ Map("Content-Type" -> "application/octet-stream"), content)
    r.status match {
      case 200 => result(Json.parse(r.text))
      case 202 =>
        val hash = Json.str(Json.parse(r.text), "whisper_hash")
        poll(hash, maxPolls)
      case s => throw new IllegalStateException(
        s"whisper failed: HTTP $s ${r.text.take(200)}")
    }
  }

  @annotation.tailrec
  private def poll(hash: String, remaining: Int): TextExtractionResult = {
    if (remaining <= 0)
      throw new IllegalStateException(s"whisper-retrieve timed out: $hash")
    val r = transport.request("GET",
      s"$baseUrl/api/v2/whisper-retrieve?whisper_hash=$hash", auth)
    r.status match {
      case 200 => result(Json.parse(r.text))
      case 202 =>
        if (pollDelayMs > 0) Thread.sleep(pollDelayMs)
        poll(hash, remaining - 1)
      case s => throw new IllegalStateException(
        s"whisper-retrieve failed: HTTP $s ${r.text.take(200)}")
    }
  }

  private def result(n: JsonNode): TextExtractionResult =
    TextExtractionResult(
      Json.str(n.path("extraction"), "result_text"),
      Map("whisper_hash" -> Json.str(n, "whisper_hash")))
}

/** Unstructured community/enterprise protocol
  * (unstructured_community/src/): POST the document to the partition
  * endpoint; the response is a JSON array of elements whose `text`
  * fields concatenate into the extracted text. */
final class UnstructuredAdapter(url: String, apiKey: String,
    mkTransport: () => HttpTransport) extends X2TextAdapter {

  val name = "unstructured"
  @transient private lazy val transport = mkTransport()

  def testConnection(): Boolean =
    scala.util.Try {
      // the reference probes with a trivial partition request
      val r = transport.request("POST", url,
        Map("unstructured-api-key" -> apiKey, "filename" -> "probe.txt"),
        "probe".getBytes("UTF-8"))
      r.status == 200
    }.getOrElse(false)

  def process(fileName: String, content: Array[Byte]): TextExtractionResult = {
    val r = transport.request("POST", url,
      Map("unstructured-api-key" -> apiKey, "filename" -> fileName), content)
    if (r.status != 200)
      throw new IllegalStateException(
        s"unstructured failed: HTTP ${r.status} ${r.text.take(200)}")
    val arr = Json.parse(r.text)
    val texts = (0 until arr.size()).map(i => Json.str(arr.get(i), "text"))
      .filter(_.nonEmpty)
    TextExtractionResult(texts.mkString("\n\n"),
      Map("n_elements" -> arr.size().toString))
  }
}

/** Per-row extraction result for the Column-level plumbing — errors are
  * rows, not job failures (one bad document must not abort a 100 TB
  * batch). */
final case class X2TextRow(
    text: String, metadata: Map[String, String], error_message: String)

object X2Text {

  /** Adapter registry (register.py analog): name → factory. Factories
    * construct ON the executor (transport sockets don't serialize). */
  private val registry =
    scala.collection.concurrent.TrieMap[String, () => X2TextAdapter]()
  def register(name: String, mk: () => X2TextAdapter): Unit =
    registry.put(name, mk)
  def unregister(name: String): Unit = registry.remove(name)
  def get(name: String): Option[() => X2TextAdapter] = registry.get(name)
  def list: Seq[String] = registry.keys.toSeq.sorted

  /** Distributed extraction: one adapter per executor (lazy), one
    * request per row, error rows instead of task failures.
    * Nondeterministic for the same reason as the LLM UDF: an external
    * service call must never be re-executed or duplicated by the
    * optimizer. */
  def extractUdf(mkAdapter: () => X2TextAdapter)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    lazy val adapter = mkAdapter()
    udf { (fileName: String, content: Array[Byte]) =>
      try {
        val r = adapter.process(fileName, content)
        X2TextRow(r.extractedText, r.metadata, null)
      } catch {
        case scala.util.control.NonFatal(e) =>
          X2TextRow(null, Map.empty,
            s"x2text_failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }.asNondeterministic()
  }
}
