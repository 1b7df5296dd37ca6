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

/** LLMWhisperer v1 protocol (adapters/x2text/llm_whisperer/src/
  * llm_whisperer.py:75-136,215-307 + constants.py) — distinct from v2
  * in four observable ways this adapter reproduces:
  *  - endpoints live under `{base}/v1/` (test-connection, whisper,
  *    whisper-status, whisper-retrieve) instead of `/api/v2/`;
  *  - the async identifier key is hyphenated `whisper-hash` (constants
  *    X2TextConstants.WHISPER_HASH) and ALSO arrives as a response
  *    HEADER on the initial whisper POST (llm_whisperer.py:442-444);
  *  - async completion is a separate status poll (`whisper-status` →
  *    {"status": processing|processed|delivered}) before ONE retrieve,
  *    not a retrieve-until-200 loop (llm_whisperer.py:215-269);
  *  - the result JSON carries the text under top-level `text`
  *    (llm_whisperer.py:355), not `extraction.result_text`.
  * Defaults mirror WhispererDefaults (output_json=true, add_line_nos
  * =true, line_splitter_tolerance=0.75, page_seperator "<<< >>>" —
  * reference's own spelling). */
final class LLMWhispererV1Adapter(baseUrl: String, apiKey: String,
    mkTransport: () => HttpTransport,
    processingMode: String = "text", outputMode: String = "line-printer",
    maxPolls: Int = 30, pollDelayMs: Long = 0L) extends X2TextAdapter {

  val name = "llm_whisperer_v1"
  @transient private lazy val transport = mkTransport()
  private def auth = Map("unstract-key" -> apiKey)
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  def testConnection(): Boolean =
    scala.util.Try(
      transport.request("GET", s"$baseUrl/v1/test-connection", auth).status == 200
    ).getOrElse(false)

  def process(fileName: String, content: Array[Byte]): TextExtractionResult = {
    val params = Seq(
      "processing_mode" -> processingMode,
      "output_mode" -> outputMode,
      "force_text_processing" -> "false",
      "line_splitter_tolerance" -> "0.75",
      "horizontal_stretch_factor" -> "1.0",
      "pages_to_extract" -> "",
      "add_line_nos" -> "true",
      "output_json" -> "true",
      "page_seperator" -> "<<< >>>", // sic — the reference's param name/value
      "median_filter_size" -> "0",
      "gaussian_blur_radius" -> "0.0")
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val r = transport.request("POST", s"$baseUrl/v1/whisper?$params",
      auth ++ Map("Content-Type" -> "application/octet-stream"), content)
    val headerHash = r.header("whisper-hash").getOrElse("")
    r.status match {
      case 200 =>
        TextExtractionResult(Json.str(Json.parse(r.text), "text"),
          Map("whisper_hash" -> headerHash))
      case 202 =>
        val hash = Json.str(Json.parse(r.text), "whisper-hash")
        awaitStatus(hash, maxPolls)
        retrieve(hash, if (headerHash.nonEmpty) headerHash else hash)
      case s => throw new IllegalStateException(
        s"whisper failed: HTTP $s ${r.text.take(200)}")
    }
  }

  /** Poll whisper-status until processed/delivered; bounded. */
  @annotation.tailrec
  private def awaitStatus(hash: String, remaining: Int): Unit = {
    if (remaining <= 0)
      throw new IllegalStateException(
        s"whisper-status never reached processed: $hash")
    val r = transport.request("GET",
      s"$baseUrl/v1/whisper-status?whisper-hash=${enc(hash)}&output_json=true", auth)
    if (r.status != 200)
      throw new IllegalStateException(
        s"whisper-status failed: HTTP ${r.status} ${r.text.take(200)}")
    Json.str(Json.parse(r.text), "status") match {
      case "processed" | "delivered" => ()
      case _ =>
        if (pollDelayMs > 0) Thread.sleep(pollDelayMs)
        awaitStatus(hash, remaining - 1)
    }
  }

  private def retrieve(hash: String, metaHash: String): TextExtractionResult = {
    val r = transport.request("GET",
      s"$baseUrl/v1/whisper-retrieve?whisper-hash=${enc(hash)}&output_json=true", auth)
    if (r.status != 200)
      throw new IllegalStateException(
        s"whisper-retrieve failed: HTTP ${r.status} ${r.text.take(200)}")
    TextExtractionResult(Json.str(Json.parse(r.text), "text"),
      Map("whisper_hash" -> metaHash))
  }
}

/** LlamaParse protocol (adapters/x2text/llama_parse/src/llama_parse.py
  * wraps the open-source `llama_parse` client; this speaks that
  * client's LlamaCloud REST protocol directly):
  *  - POST {base}/api/parsing/upload  (multipart/form-data `file`,
  *    Bearer auth) → {"id": job_id}
  *  - GET  {base}/api/parsing/job/{id} → {"status": PENDING|SUCCESS|
  *    ERROR|CANCELED} polled until terminal
  *  - GET  {base}/api/parsing/job/{id}/result/{text|markdown} →
  *    {"text"|"markdown": …}
  * The reference adapter joins document texts with "\n\n"
  * (llama_parse.py:101) and treats connect/API errors as AdapterError
  * (llama_parse.py:90-99) — here a thrown IllegalStateException the
  * UDF wrapper turns into an error row. */
final class LlamaParseAdapter(baseUrl: String, apiKey: String,
    mkTransport: () => HttpTransport, resultType: String = "text",
    maxPolls: Int = 60, pollDelayMs: Long = 0L) extends X2TextAdapter {

  val name = "llama_parse"
  @transient private lazy val transport = mkTransport()
  private def auth = Map("Authorization" -> s"Bearer $apiKey")

  def testConnection(): Boolean =
    // the reference probes by parsing a tiny static doc end-to-end
    scala.util.Try(
      process("test_input.doc", "probe".getBytes("UTF-8")).extractedText != null
    ).getOrElse(false)

  def process(fileName: String, content: Array[Byte]): TextExtractionResult = {
    val boundary = "graft-" + java.util.UUID.nameUUIDFromBytes(
      java.security.MessageDigest.getInstance("SHA-256").digest(content))
    val head = (s"--$boundary\r\n" +
      s"""Content-Disposition: form-data; name="file"; filename="$fileName"\r\n""" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8")
    val tail = s"\r\n--$boundary--\r\n".getBytes("UTF-8")
    val body = head ++ content ++ tail
    val up = transport.request("POST", s"$baseUrl/api/parsing/upload",
      auth ++ Map("Content-Type" -> s"multipart/form-data; boundary=$boundary"),
      body)
    if (up.status != 200)
      throw new IllegalStateException(
        s"llama-parse upload failed: HTTP ${up.status} ${up.text.take(200)}")
    val jobId = Json.str(Json.parse(up.text), "id")
    awaitJob(jobId, maxPolls)
    val res = transport.request("GET",
      s"$baseUrl/api/parsing/job/$jobId/result/$resultType", auth)
    if (res.status != 200)
      throw new IllegalStateException(
        s"llama-parse result failed: HTTP ${res.status} ${res.text.take(200)}")
    TextExtractionResult(Json.str(Json.parse(res.text), resultType),
      Map("job_id" -> jobId))
  }

  @annotation.tailrec
  private def awaitJob(jobId: String, remaining: Int): Unit = {
    if (remaining <= 0)
      throw new IllegalStateException(s"llama-parse job timed out: $jobId")
    val r = transport.request("GET", s"$baseUrl/api/parsing/job/$jobId", auth)
    if (r.status != 200)
      throw new IllegalStateException(
        s"llama-parse status failed: HTTP ${r.status} ${r.text.take(200)}")
    Json.str(Json.parse(r.text), "status") match {
      case "SUCCESS" => ()
      case "ERROR" | "CANCELED" => throw new IllegalStateException(
        s"llama-parse job failed: $jobId")
      case _ => // PENDING
        if (pollDelayMs > 0) Thread.sleep(pollDelayMs)
        awaitJob(jobId, remaining - 1)
    }
  }
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
