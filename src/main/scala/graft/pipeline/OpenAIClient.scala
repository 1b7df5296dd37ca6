package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import graft.tools.{HttpResponse, HttpTransport}
import org.apache.spark.util.LongAccumulator

/** Real-protocol LLM/embedding provider adapters: the OpenAI-compatible
  * REST surface (chat-completions + embeddings), the wire shape that
  * litellm normalizes ~15 providers onto for the reference
  * (sdk1/llm.py:332-437 builds [system, user] messages and reads
  * `choices[0].message.content` + `usage`; sdk1/embedding.py the
  * embeddings analog). This gives [[LLMClient]] one real-protocol
  * implementation next to the deterministic mock — same trait, so the
  * whole D10-D17 extraction chain runs through either.
  *
  * Retry mirrors the reference's is_retryable predicate + backoff
  * (sdk1/utils/retry_utils.py:20,36-61,90-119): transient transport
  * exceptions and HTTP {408, 429, 500, 502, 503, 504} retry with
  * exponential backoff (base 1 s, ×2, cap 60 s; jitter omitted — the
  * sleeper is injectable and determinism wins in an engine whose tasks
  * Spark already retries); every other status is terminal.
  */
object OpenAIProtocol {
  val RetryableStatus: Set[Int] = Set(408, 429, 500, 502, 503, 504)

  private[pipeline] val mapper = new ObjectMapper()

  /** Backoff schedule for attempt i (0-based): min(1·2^i, 60) seconds,
    * the reference's _get_retry_delay without jitter. */
  def backoffMs(attempt: Int): Long =
    math.min(1000L << math.min(attempt, 10), 60000L)

  /** Bounded retry around one HTTP exchange. `maxRetries` is the extra
    * attempts AFTER the first (reference call_with_retry semantics). */
  private[pipeline] def withRetry(maxRetries: Int, sleeper: Long => Unit)(
      fn: => HttpResponse): HttpResponse = {
    require(maxRetries >= 0, s"max_retries must be >= 0, got $maxRetries")
    var attempt = 0
    var out: HttpResponse = null
    while (out == null) {
      val r = try Right(fn) catch {
        case scala.util.control.NonFatal(e) => Left(e)
      }
      r match {
        case Right(resp) if resp.status < 400 => out = resp
        case Right(resp) if RetryableStatus(resp.status) && attempt < maxRetries =>
          sleeper(backoffMs(attempt)); attempt += 1
        case Right(resp) =>
          throw new IllegalStateException(
            s"LLM provider error: HTTP ${resp.status} ${resp.text.take(200)}")
        case Left(e) if attempt < maxRetries => // transient transport failure
          sleeper(backoffMs(attempt)); attempt += 1
        case Left(e) => throw e
      }
    }
    out
  }
}

/** Chat-completions client: [[WireChatClient]] pinned to the OpenAI
  * wire. One instance per executor partition (the factory pattern
  * every adapter here uses); `usage` token counts flow into the
  * optional accumulators — the reference's _record_usage on every
  * call, provider-reported numbers, not whitespace estimates. Vision
  * (sdk1/llm.py:438-476 complete_vision) sends [text, image_url]
  * content parts with the image inlined as a data URL. */
final class OpenAIChatClient(baseUrl: String, apiKey: String, model: String,
    mkTransport: () => HttpTransport, systemPrompt: String = "",
    temperature: Double = 0.003, maxRetries: Int = 2,
    sleeper: Long => Unit = Thread.sleep,
    promptTokens: Option[LongAccumulator] = None,
    completionTokens: Option[LongAccumulator] = None)
  extends WireChatClient(OpenAIWire, baseUrl, apiKey, model, mkTransport,
    systemPrompt, temperature, maxRetries, sleeper, promptTokens,
    completionTokens)

/** Embedding adapter surface (sdk1/embedding.py): batch-first, because
  * at 100 TB the per-request overhead dominates single-text calls. */
trait EmbeddingClient extends Serializable {
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** OpenAI-compatible /v1/embeddings client: [[WireEmbeddingClient]]
  * pinned to the OpenAI wire. The response's `data` array is
  * index-keyed; results are re-ordered by that index, not arrival
  * order (the API contract allows permuted rows). */
final class OpenAIEmbeddingClient(baseUrl: String, apiKey: String,
    model: String, mkTransport: () => HttpTransport, maxRetries: Int = 2,
    sleeper: Long => Unit = Thread.sleep,
    usageTokens: Option[LongAccumulator] = None)
  extends WireEmbeddingClient(OpenAIEmbeddingWire, baseUrl, apiKey, model,
    mkTransport, maxRetries, sleeper, usageTokens)

object OpenAIEmbedding {
  /** Column-level embedding with per-partition client reuse — the
    * plumbing mirror of LLM.completeUdf (nondeterministic for the same
    * no-double-billing reason). Engine-internal embeddings stay
    * expression-based; this is the provider-adapter path. */
  def embedUdf(mkClient: () => EmbeddingClient)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    lazy val client = mkClient()
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) null else client.embed(Seq(text)).head
    }.asNondeterministic()
  }
}
