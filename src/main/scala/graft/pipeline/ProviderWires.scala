package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.tools.HttpTransport
import org.apache.spark.util.LongAccumulator

/** Provider wire flavors.
  *
  * The reference's LLM tier is a roster of 14 provider adapters
  * (sdk1/adapters/llm1/: openai, azure_openai, anthropic, ollama,
  * gemini, mistral, openrouter, anyscale, nvidia_build, minimax,
  * azure_ai_foundry, openai_compatible, bedrock, vertexai) that litellm
  * normalizes onto a handful of actual wire protocols. This file
  * implements those wire protocols directly — endpoint addressing,
  * auth header, request body shape, response parse — as [[ChatWire]] /
  * [[EmbeddingWire]] strategies consumed by one generic client each
  * ([[WireChatClient]], [[WireEmbeddingClient]]) sharing the
  * retry/backoff/usage plumbing of [[OpenAIProtocol]]. Adding a
  * provider is a wire, not a client.
  *
  * All request/response shapes here are the providers' public REST
  * documentation, nothing else:
  *  - OpenAI:    POST /v1/chat/completions, Authorization: Bearer
  *  - Azure:     POST /openai/deployments/{m}/chat/completions
  *               ?api-version=…, api-key header (same body as OpenAI)
  *  - Anthropic: POST /v1/messages, x-api-key + anthropic-version;
  *               top-level system, content blocks, usage.input_tokens
  *  - Ollama:    POST /api/chat, no auth, stream:false,
  *               prompt_eval_count/eval_count
  *  - Gemini:    POST /v1beta/models/{m}:generateContent,
  *               x-goog-api-key header, contents/parts, usageMetadata
  *  - Bedrock:   POST /model/{id}/converse (the Converse API), SigV4
  *               auth via the [[graft.tools.SigV4Transport]] decorator
  *  - VertexAI:  the Gemini shape on the project/location-scoped path,
  *               OAuth2 bearer from the service-account JWT exchange
  *               ([[graft.tools.ServiceAccountAuth]])
  */
final case class ChatReply(content: Option[String], promptTokens: Long,
    completionTokens: Long, finishReason: String)

/** One provider wire: where to POST, how to authenticate, how to shape
  * the request, how to read the reply. `image` is the optional vision
  * attachment (bytes, mime) — each wire speaks its own multimodal
  * block shape (sdk1/llm.py:438 complete_vision via litellm). */
trait ChatWire extends Serializable {
  def chatUrl(baseUrl: String, model: String): String
  def headers(apiKey: String): Map[String, String]
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte]
  def parse(json: String): ChatReply
}

object ChatWire {
  private[pipeline] def mapper: ObjectMapper = OpenAIProtocol.mapper
  private[pipeline] def b64(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)
  private[pipeline] def textOpt(n: JsonNode): Option[String] =
    if (n.isMissingNode || n.isNull) None else Some(n.asText())
}

/** One incremental piece of a streamed completion: a text delta and/or
  * trailing usage (the include_usage final chunk carries counts and an
  * empty choices array). */
final case class StreamDelta(text: Option[String], promptTokens: Long,
    completionTokens: Long, finishReason: Option[String])

/** Wires with a server-sent-events streaming form (the reference's
  * stream_complete, sdk1/llm.py:529-583: litellm normalizes every
  * provider's stream onto the OpenAI chunk shape, so the
  * OpenAI-shaped wires are the faithful scope). */
trait StreamingChatWire extends ChatWire {
  def streamChatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double): Array[Byte]
  /** Parse one SSE `data:` payload. */
  def parseChunk(json: String): StreamDelta
  /** The stream-end sentinel payload (OpenAI: `[DONE]`). */
  def isTerminator(data: String): Boolean
}

/** The OpenAI shape — also the wire of every "OpenAI-compatible"
  * roster member (mistral, openrouter, anyscale, nvidia_build, minimax,
  * azure_ai_foundry, openai_compatible): same path/body, different
  * baseUrl + key. */
case object OpenAIWire extends ChatWire with StreamingChatWire {
  import ChatWire._
  def chatUrl(baseUrl: String, model: String) = s"$baseUrl/v1/chat/completions"
  def headers(apiKey: String) = Map("Authorization" -> s"Bearer $apiKey")
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    val msgs = root.putArray("messages")
    if (systemPrompt.nonEmpty) {
      val m = msgs.addObject(); m.put("role", "system"); m.put("content", systemPrompt)
    }
    val u = msgs.addObject(); u.put("role", "user")
    image match {
      case None => u.put("content", prompt)
      case Some((bytes, mime)) =>
        val parts = u.putArray("content")
        val tp = parts.addObject(); tp.put("type", "text"); tp.put("text", prompt)
        val ip = parts.addObject(); ip.put("type", "image_url")
        ip.putObject("image_url").put("url", s"data:$mime;base64,${b64(bytes)}")
    }
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String): ChatReply = {
    val node = mapper.readTree(json)
    val choice = node.path("choices").path(0)
    val usage = node.path("usage")
    ChatReply(textOpt(choice.path("message").path("content")),
      usage.path("prompt_tokens").asLong(0),
      usage.path("completion_tokens").asLong(0),
      choice.path("finish_reason").asText("?"))
  }

  /** chatBody + stream:true + stream_options.include_usage (the
    * reference always asks for the usage trailer, llm.py:560-562). */
  def streamChatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double): Array[Byte] = {
    val root = mapper.readTree(
      chatBody(model, systemPrompt, prompt, temperature, None))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.put("stream", true)
    root.putObject("stream_options").put("include_usage", true)
    mapper.writeValueAsBytes(root)
  }
  def parseChunk(json: String): StreamDelta = {
    val node = mapper.readTree(json)
    val choice = node.path("choices").path(0)
    val usage = node.path("usage")
    StreamDelta(
      textOpt(choice.path("delta").path("content")).filter(_.nonEmpty),
      usage.path("prompt_tokens").asLong(0),
      usage.path("completion_tokens").asLong(0),
      textOpt(choice.path("finish_reason")))
  }
  def isTerminator(data: String): Boolean = data == "[DONE]"
}

/** Azure OpenAI: deployment-scoped path + api-version query + api-key
  * header; body/response/stream are the OpenAI shape (the deployment
  * name IS the model — reference base1.py:708-717 folds
  * deployment_name into the model field the same way). */
final case class AzureOpenAIWire(apiVersion: String = "2024-02-01")
    extends ChatWire with StreamingChatWire {
  def chatUrl(baseUrl: String, model: String) =
    s"$baseUrl/openai/deployments/$model/chat/completions?api-version=$apiVersion"
  def headers(apiKey: String) = Map("api-key" -> apiKey)
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] =
    OpenAIWire.chatBody(model, systemPrompt, prompt, temperature, image)
  def parse(json: String): ChatReply = OpenAIWire.parse(json)
  def streamChatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double): Array[Byte] =
    OpenAIWire.streamChatBody(model, systemPrompt, prompt, temperature)
  def parseChunk(json: String): StreamDelta = OpenAIWire.parseChunk(json)
  def isTerminator(data: String): Boolean = OpenAIWire.isTerminator(data)
}

/** MiniMax ChatCompletion v2 (public MiniMax API reference): the
  * OpenAI body/response shape served at /v1/text/chatcompletion_v2
  * with Bearer auth — reference adapters/llm1/minimax.py names exactly
  * this surface through litellm. One wire-level deviation worth
  * implementing: MiniMax reports API-level errors inside a `base_resp`
  * envelope ON HTTP 200 (status_code != 0), so the parse surfaces that
  * as a loud failure instead of returning an empty reply. */
case object MiniMaxWire extends ChatWire {
  import ChatWire.mapper
  def chatUrl(baseUrl: String, model: String) =
    s"$baseUrl/v1/text/chatcompletion_v2"
  def headers(apiKey: String) = Map("Authorization" -> s"Bearer $apiKey")
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] =
    OpenAIWire.chatBody(model, systemPrompt, prompt, temperature, image)
  def parse(json: String): ChatReply = {
    val root = mapper.readTree(json)
    val base = root.path("base_resp")
    val sc = base.path("status_code").asLong(0L)
    if (sc != 0L)
      throw new IllegalStateException(
        s"minimax error $sc: ${base.path("status_msg").asText("")}")
    OpenAIWire.parse(json)
  }
}

/** OpenRouter: the OpenAI shape at openrouter.ai/api with Bearer auth,
  * plus the two OPTIONAL app-attribution headers its public docs
  * define (HTTP-Referer, X-Title) — reference
  * adapters/llm1/openrouter.py. */
final case class OpenRouterWire(referer: Option[String] = None,
    title: Option[String] = None) extends ChatWire with StreamingChatWire {
  def chatUrl(baseUrl: String, model: String) =
    OpenAIWire.chatUrl(baseUrl, model)
  def headers(apiKey: String) =
    Map("Authorization" -> s"Bearer $apiKey") ++
      referer.map("HTTP-Referer" -> _) ++ title.map("X-Title" -> _)
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] =
    OpenAIWire.chatBody(model, systemPrompt, prompt, temperature, image)
  def parse(json: String): ChatReply = OpenAIWire.parse(json)
  def streamChatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double): Array[Byte] =
    OpenAIWire.streamChatBody(model, systemPrompt, prompt, temperature)
  def parseChunk(json: String): StreamDelta = OpenAIWire.parseChunk(json)
  def isTerminator(data: String): Boolean = OpenAIWire.isTerminator(data)
}

/** Anthropic Messages API: /v1/messages, x-api-key + anthropic-version
  * headers, REQUIRED max_tokens, top-level `system`, reply content as
  * typed blocks (text concatenated), usage.input_tokens/output_tokens,
  * stop_reason. Vision is a base64 image source block before the text
  * block. */
final case class AnthropicWire(version: String = "2023-06-01",
    maxTokens: Int = 1024) extends ChatWire {
  import ChatWire._
  def chatUrl(baseUrl: String, model: String) = s"$baseUrl/v1/messages"
  def headers(apiKey: String) =
    Map("x-api-key" -> apiKey, "anthropic-version" -> version)
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("max_tokens", maxTokens)
    root.put("temperature", temperature)
    if (systemPrompt.nonEmpty) root.put("system", systemPrompt)
    val u = root.putArray("messages").addObject()
    u.put("role", "user")
    image match {
      case None => u.put("content", prompt)
      case Some((bytes, mime)) =>
        val parts = u.putArray("content")
        val ip = parts.addObject(); ip.put("type", "image")
        val src = ip.putObject("source")
        src.put("type", "base64"); src.put("media_type", mime)
        src.put("data", b64(bytes))
        val tp = parts.addObject(); tp.put("type", "text"); tp.put("text", prompt)
    }
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String): ChatReply = {
    val node = mapper.readTree(json)
    val blocks = node.path("content")
    val texts = (0 until blocks.size()).map(blocks.get)
      .filter(_.path("type").asText() == "text").map(_.path("text").asText())
    val usage = node.path("usage")
    ChatReply(if (texts.isEmpty) None else Some(texts.mkString),
      usage.path("input_tokens").asLong(0),
      usage.path("output_tokens").asLong(0),
      node.path("stop_reason").asText("?"))
  }
}

/** Ollama /api/chat: no auth, stream:false (one JSON object, not
  * NDJSON), options.temperature, per-message `images` array for
  * vision, token counts in prompt_eval_count/eval_count. */
case object OllamaWire extends ChatWire {
  import ChatWire._
  def chatUrl(baseUrl: String, model: String) = s"$baseUrl/api/chat"
  def headers(apiKey: String) = Map.empty // local daemon, no auth
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("stream", false)
    root.putObject("options").put("temperature", temperature)
    val msgs = root.putArray("messages")
    if (systemPrompt.nonEmpty) {
      val m = msgs.addObject(); m.put("role", "system"); m.put("content", systemPrompt)
    }
    val u = msgs.addObject(); u.put("role", "user"); u.put("content", prompt)
    image.foreach { case (bytes, _) => u.putArray("images").add(b64(bytes)) }
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String): ChatReply = {
    val node = mapper.readTree(json)
    ChatReply(textOpt(node.path("message").path("content")).filter(_.nonEmpty),
      node.path("prompt_eval_count").asLong(0),
      node.path("eval_count").asLong(0),
      node.path("done_reason").asText("?"))
  }
}

/** Gemini generateContent: model-scoped path, x-goog-api-key header,
  * contents/parts request, systemInstruction, generationConfig,
  * candidates[0].content.parts reply, usageMetadata counts. Vision is
  * an inlineData part (mimeType + base64). */
case object GeminiWire extends ChatWire {
  import ChatWire._
  def chatUrl(baseUrl: String, model: String) =
    s"$baseUrl/v1beta/models/$model:generateContent"
  def headers(apiKey: String) = Map("x-goog-api-key" -> apiKey)
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] = {
    val root = mapper.createObjectNode()
    if (systemPrompt.nonEmpty)
      root.putObject("systemInstruction").putArray("parts")
        .addObject().put("text", systemPrompt)
    root.putObject("generationConfig").put("temperature", temperature)
    val content = root.putArray("contents").addObject()
    content.put("role", "user")
    val parts = content.putArray("parts")
    image.foreach { case (bytes, mime) =>
      val d = parts.addObject().putObject("inlineData")
      d.put("mimeType", mime); d.put("data", b64(bytes))
    }
    parts.addObject().put("text", prompt)
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String): ChatReply = {
    val node = mapper.readTree(json)
    val cand = node.path("candidates").path(0)
    val parts = cand.path("content").path("parts")
    val texts = (0 until parts.size()).map(parts.get)
      .flatMap(p => textOpt(p.path("text")))
    val usage = node.path("usageMetadata")
    ChatReply(if (texts.isEmpty) None else Some(texts.mkString),
      usage.path("promptTokenCount").asLong(0),
      usage.path("candidatesTokenCount").asLong(0),
      cand.path("finishReason").asText("?"))
  }
}

/** Bedrock Converse API (the provider-agnostic chat surface AWS
  * documents for every hosted model): POST /model/{id}/converse with
  * system as a top-level block list, content as typed blocks, reply at
  * output.message.content[], usage.inputTokens/outputTokens,
  * stopReason. Auth is SigV4 and lives in the transport — construct
  * the client with a [[graft.tools.SigV4Transport]]-wrapped transport
  * (region/credentials there), which is why this wire adds no auth
  * headers. Vision is an image block with format + base64 bytes. */
case object BedrockWire extends ChatWire {
  import ChatWire._
  def chatUrl(baseUrl: String, model: String) = {
    // model ids carry ':' (version suffix) — path-encode them
    val enc = graft.tools.SigV4.encodePathSegment(model)
    s"$baseUrl/model/$enc/converse"
  }
  def headers(apiKey: String) = Map.empty // SigV4Transport signs
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] = {
    val root = mapper.createObjectNode()
    if (systemPrompt.nonEmpty)
      root.putArray("system").addObject().put("text", systemPrompt)
    root.putObject("inferenceConfig").put("temperature", temperature)
    val u = root.putArray("messages").addObject()
    u.put("role", "user")
    val parts = u.putArray("content")
    image.foreach { case (bytes, mime) =>
      val img = parts.addObject().putObject("image")
      img.put("format", mime.stripPrefix("image/"))
      img.putObject("source").put("bytes", b64(bytes))
    }
    parts.addObject().put("text", prompt)
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String): ChatReply = {
    val node = mapper.readTree(json)
    val blocks = node.path("output").path("message").path("content")
    val texts = (0 until blocks.size()).map(blocks.get)
      .flatMap(b => textOpt(b.path("text")))
    val usage = node.path("usage")
    ChatReply(if (texts.isEmpty) None else Some(texts.mkString),
      usage.path("inputTokens").asLong(0),
      usage.path("outputTokens").asLong(0),
      node.path("stopReason").asText("?"))
  }
}

/** Bearer-token source for OAuth-fronted providers. Serializable so a
  * wire holding one can ride into executors; implementations connect
  * lazily. */
trait TokenProvider extends Serializable {
  def token(): String
}

/** Google service-account tokens over the same JWT-bearer exchange the
  * Document AI adapter uses ([[graft.tools.ServiceAccountAuth]]). */
final class ServiceAccountTokenProvider(serviceAccountJson: String,
    mkTransport: () => HttpTransport,
    clock: () => Long = () => System.currentTimeMillis() / 1000)
    extends TokenProvider {
  @transient private lazy val auth = new graft.tools.ServiceAccountAuth(
    serviceAccountJson, mkTransport, clock)
  def token(): String = auth.token()
}

/** Vertex AI generateContent: the Gemini body/response on the
  * project/location/publisher-scoped path with OAuth2 bearer auth
  * (service-account exchange) instead of an API key — the delta
  * between the reference's gemini and vertexai roster rows. The
  * client's apiKey argument is unused; tokens come per-request from
  * the provider (cached until near expiry). */
final case class VertexAIWire(project: String, location: String,
    tokens: TokenProvider) extends ChatWire {
  def chatUrl(baseUrl: String, model: String) =
    s"$baseUrl/v1/projects/$project/locations/$location" +
      s"/publishers/google/models/$model:generateContent"
  def headers(apiKey: String) =
    Map("Authorization" -> s"Bearer ${tokens.token()}")
  def chatBody(model: String, systemPrompt: String, prompt: String,
      temperature: Double, image: Option[(Array[Byte], String)]): Array[Byte] =
    GeminiWire.chatBody(model, systemPrompt, prompt, temperature, image)
  def parse(json: String): ChatReply = GeminiWire.parse(json)
}

/** Generic chat client over any [[ChatWire]]: one HTTP exchange with
  * the shared retry/backoff envelope, provider-reported usage flowing
  * into the accumulators, refusal/empty reply raised (never a silent
  * null row — sdk1/llm.py _raise_for_empty_response). One instance per
  * executor partition via the usual factory pattern. */
class WireChatClient(wire: ChatWire, baseUrl: String, apiKey: String,
    model: String, mkTransport: () => HttpTransport,
    systemPrompt: String = "", temperature: Double = 0.003,
    maxRetries: Int = 2, sleeper: Long => Unit = Thread.sleep,
    promptTokens: Option[LongAccumulator] = None,
    completionTokens: Option[LongAccumulator] = None) extends LLMClient {

  @transient private lazy val transport = mkTransport()

  private def exchange(prompt: String,
      image: Option[(Array[Byte], String)]): String = {
    val r = OpenAIProtocol.withRetry(maxRetries, sleeper) {
      transport.request("POST", wire.chatUrl(baseUrl, model),
        wire.headers(apiKey) + ("Content-Type" -> "application/json"),
        wire.chatBody(model, systemPrompt, prompt, temperature, image))
    }
    val reply = wire.parse(r.text)
    promptTokens.foreach(_.add(reply.promptTokens))
    completionTokens.foreach(_.add(reply.completionTokens))
    reply.content.getOrElse(throw new IllegalStateException(
      s"LLM returned empty content (finish_reason=${reply.finishReason})"))
  }

  override def complete(prompt: String): String = exchange(prompt, None)

  /** Vision completion (sdk1/llm.py:438-476): the wire chooses its own
    * multimodal block shape. */
  def completeVision(prompt: String, image: Array[Byte],
      imageMime: String = "image/png"): String =
    exchange(prompt, Some((image, imageMime)))

  /** Streamed completion (sdk1/llm.py:529-583 stream_complete): text
    * deltas as the provider flushes them, provider-reported usage from
    * the include_usage trailer into the accumulators. Requires a
    * [[StreamingChatWire]] and an SSE-capable transport. A stream that
    * ends without ever yielding content throws — the streaming analog
    * of the empty-reply guard (has_yielded_content, llm.py:556). No
    * mid-stream retry: a failed stream is the caller's retry unit, as
    * in the reference (iter_with_retry wraps stream START, not
    * chunks). */
  def streamComplete(prompt: String): Iterator[String] = {
    val w = wire match {
      case s: StreamingChatWire => s
      case _ => throw new UnsupportedOperationException(
        s"wire $wire has no streaming form")
    }
    val sse = transport match {
      case s: graft.tools.SseTransport => s
      case _ => throw new UnsupportedOperationException(
        "transport does not support SSE streaming")
    }
    val lines = sse.streamLines("POST", w.chatUrl(baseUrl, model),
      w.headers(apiKey) + ("Content-Type" -> "application/json",
        "Accept" -> "text/event-stream"),
      w.streamChatBody(model, systemPrompt, prompt, temperature))
    var yielded = false
    val deltas = lines.flatMap { line =>
      val data = line.stripPrefix("data:").trim
      if (!line.startsWith("data:") || data.isEmpty || w.isTerminator(data))
        None
      else {
        val d = w.parseChunk(data)
        promptTokens.foreach(_.add(d.promptTokens))
        completionTokens.foreach(_.add(d.completionTokens))
        d.text.foreach(_ => yielded = true)
        d.text
      }
    }
    new Iterator[String] {
      def hasNext: Boolean = {
        val more = deltas.hasNext
        if (!more && !yielded)
          throw new IllegalStateException(
            "LLM stream ended without content")
        more
      }
      def next(): String = deltas.next()
    }
  }
}

/** Embedding wire: same split for /embeddings-shaped surfaces
  * (sdk1/adapters/embedding1/: openai, azure_openai, ollama +
  * OpenAI-compatible roster). parse returns rows IN INPUT ORDER plus
  * the provider-reported usage token count. */
trait EmbeddingWire extends Serializable {
  def url(baseUrl: String, model: String): String
  def headers(apiKey: String): Map[String, String]
  def body(model: String, texts: Seq[String]): Array[Byte]
  def parse(json: String, n: Int): (Seq[Array[Float]], Long)
}

case object OpenAIEmbeddingWire extends EmbeddingWire {
  import ChatWire.mapper
  def url(baseUrl: String, model: String) = s"$baseUrl/v1/embeddings"
  def headers(apiKey: String) = Map("Authorization" -> s"Bearer $apiKey")
  def body(model: String, texts: Seq[String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    mapper.writeValueAsBytes(root)
  }
  /** `data` rows are index-keyed and may arrive permuted; re-order by
    * the index field, not arrival order (the API contract). */
  def parse(json: String, n: Int): (Seq[Array[Float]], Long) = {
    val node = mapper.readTree(json)
    val data = node.path("data")
    val out = new Array[Array[Float]](n)
    (0 until data.size()).foreach { i =>
      val row = data.get(i)
      val idx = row.path("index").asInt(i)
      val emb = row.path("embedding")
      out(idx) = Array.tabulate(emb.size())(j => emb.get(j).floatValue())
    }
    require(out.forall(_ != null),
      s"embeddings response missing rows: got ${data.size()} of $n")
    (out.toSeq, node.path("usage").path("total_tokens").asLong(0))
  }
}

final case class AzureOpenAIEmbeddingWire(apiVersion: String = "2024-02-01")
    extends EmbeddingWire {
  def url(baseUrl: String, model: String) =
    s"$baseUrl/openai/deployments/$model/embeddings?api-version=$apiVersion"
  def headers(apiKey: String) = Map("api-key" -> apiKey)
  def body(model: String, texts: Seq[String]): Array[Byte] =
    OpenAIEmbeddingWire.body(model, texts)
  def parse(json: String, n: Int): (Seq[Array[Float]], Long) =
    OpenAIEmbeddingWire.parse(json, n)
}

/** Ollama /api/embed: batch `input`, reply `embeddings` in input order
  * (no index keying in this protocol), prompt_eval_count usage. */
case object OllamaEmbeddingWire extends EmbeddingWire {
  import ChatWire.mapper
  def url(baseUrl: String, model: String) = s"$baseUrl/api/embed"
  def headers(apiKey: String) = Map.empty
  def body(model: String, texts: Seq[String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String, n: Int): (Seq[Array[Float]], Long) = {
    val node = mapper.readTree(json)
    val data = node.path("embeddings")
    require(data.size() == n,
      s"embeddings response missing rows: got ${data.size()} of $n")
    val rows = (0 until n).map { i =>
      val emb = data.get(i)
      Array.tabulate(emb.size())(j => emb.get(j).floatValue())
    }
    (rows, node.path("prompt_eval_count").asLong(0))
  }
}

/** Gemini batchEmbedContents: one request per batch, per-text request
  * objects, reply `embeddings[].values` in input order. The protocol
  * reports no usage counts. */
case object GeminiEmbeddingWire extends EmbeddingWire {
  import ChatWire.mapper
  def url(baseUrl: String, model: String) =
    s"$baseUrl/v1beta/models/$model:batchEmbedContents"
  def headers(apiKey: String) = Map("x-goog-api-key" -> apiKey)
  def body(model: String, texts: Seq[String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    val reqs = root.putArray("requests")
    texts.foreach { t =>
      val r = reqs.addObject()
      r.put("model", s"models/$model")
      r.putObject("content").putArray("parts").addObject().put("text", t)
    }
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String, n: Int): (Seq[Array[Float]], Long) = {
    val data = mapper.readTree(json).path("embeddings")
    require(data.size() == n,
      s"embeddings response missing rows: got ${data.size()} of $n")
    val rows = (0 until n).map { i =>
      val vs = data.get(i).path("values")
      Array.tabulate(vs.size())(j => vs.get(j).floatValue())
    }
    (rows, 0L)
  }
}

/** Vertex AI text-embedding :predict: instances in, predictions out
  * (embeddings.values + statistics.token_count), OAuth2 bearer via the
  * same [[TokenProvider]] as [[VertexAIWire]]. */
final case class VertexAIEmbeddingWire(project: String, location: String,
    tokens: TokenProvider) extends EmbeddingWire {
  import ChatWire.mapper
  def url(baseUrl: String, model: String) =
    s"$baseUrl/v1/projects/$project/locations/$location" +
      s"/publishers/google/models/$model:predict"
  def headers(apiKey: String) =
    Map("Authorization" -> s"Bearer ${tokens.token()}")
  def body(model: String, texts: Seq[String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    val in = root.putArray("instances")
    texts.foreach(t => in.addObject().put("content", t))
    mapper.writeValueAsBytes(root)
  }
  def parse(json: String, n: Int): (Seq[Array[Float]], Long) = {
    val preds = mapper.readTree(json).path("predictions")
    require(preds.size() == n,
      s"embeddings response missing rows: got ${preds.size()} of $n")
    var usage = 0L
    val rows = (0 until n).map { i =>
      val e = preds.get(i).path("embeddings")
      usage += e.path("statistics").path("token_count").asLong(0)
      val vs = e.path("values")
      Array.tabulate(vs.size())(j => vs.get(j).floatValue())
    }
    (rows, usage)
  }
}

/** Generic embedding client over any [[EmbeddingWire]] — batch-first,
  * because at 100 TB per-request overhead dominates single-text calls. */
class WireEmbeddingClient(wire: EmbeddingWire, baseUrl: String,
    apiKey: String, model: String, mkTransport: () => HttpTransport,
    maxRetries: Int = 2, sleeper: Long => Unit = Thread.sleep,
    usageTokens: Option[LongAccumulator] = None) extends EmbeddingClient {

  @transient private lazy val transport = mkTransport()

  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val r = OpenAIProtocol.withRetry(maxRetries, sleeper) {
      transport.request("POST", wire.url(baseUrl, model),
        wire.headers(apiKey) + ("Content-Type" -> "application/json"),
        wire.body(model, texts))
    }
    val (rows, usage) = wire.parse(r.text, texts.length)
    usageTokens.foreach(_.add(usage))
    rows
  }
}

/** Roster registry: the reference's provider key → the wire it speaks
  * (sdk1/adapters/llm1/__init__ roster). The OpenAI-compatible members
  * differ only in baseUrl/key, which are client-constructor inputs, so
  * they all map to [[OpenAIWire]]. bedrock maps to the Converse wire —
  * remember to wrap the transport in [[graft.tools.SigV4Transport]]
  * (region + credentials live there). vertexai takes required
  * project/location/token-provider arguments, so it cannot be built
  * from a name alone: construct [[VertexAIWire]] directly. */
object Providers {
  def chatWire(provider: String): ChatWire = provider.toLowerCase match {
    case "openai" | "mistral" | "anyscale" | "nvidia_build" |
         "azure_ai_foundry" | "openai_compatible" => OpenAIWire
    case "openrouter" => OpenRouterWire()
    case "minimax" => MiniMaxWire
    case "azureopenai" | "azure_openai" | "azure" => AzureOpenAIWire()
    case "anthropic" => AnthropicWire()
    case "ollama" => OllamaWire
    case "gemini" => GeminiWire
    case "bedrock" => BedrockWire
    case other => throw new UnsupportedOperationException(
      s"provider '$other' is unknown or needs constructor arguments " +
        "(vertexai: build VertexAIWire(project, location, tokens)); " +
        "supported by name: openai-compatible roster, azure_openai, " +
        "anthropic, ollama, gemini, bedrock")
  }

  /** Documented public default base URLs for the OpenAI-compatible
    * roster members the reference ships as separate adapter files
    * (each of sdk1/adapters/llm1/{mistral,nvidia_build,minimax,
    * anyscale,openrouter}.py is a litellm config naming exactly this
    * host + bearer auth). A deployment overrides per instance; these
    * are the out-of-the-box values, so constructing a roster client by
    * name needs only an API key + model. */
  val defaultBaseUrl: Map[String, String] = Map(
    "mistral" -> "https://api.mistral.ai",
    "nvidia_build" -> "https://integrate.api.nvidia.com",
    "anyscale" -> "https://api.endpoints.anyscale.com",
    "openrouter" -> "https://openrouter.ai/api",
    "minimax" -> "https://api.minimax.chat")

  /** Named-roster chat client: wire + documented default base URL in
    * one call — `chatClient("mistral", key, "mistral-large-latest",
    * mkTransport)`. Providers outside [[defaultBaseUrl]] require an
    * explicit base. */
  def chatClient(provider: String, apiKey: String, model: String,
      mkTransport: () => HttpTransport,
      baseUrl: Option[String] = None): WireChatClient = {
    val base = baseUrl.orElse(defaultBaseUrl.get(provider.toLowerCase))
      .getOrElse(throw new IllegalArgumentException(
        s"provider '$provider' has no documented default base URL — pass one"))
    new WireChatClient(chatWire(provider), base, apiKey, model, mkTransport)
  }

  def embeddingWire(provider: String): EmbeddingWire =
    provider.toLowerCase match {
      case "openai" | "mistral" | "nvidia_build" | "openai_compatible" =>
        OpenAIEmbeddingWire
      case "azureopenai" | "azure_openai" | "azure" => AzureOpenAIEmbeddingWire()
      case "ollama" => OllamaEmbeddingWire
      case "gemini" => GeminiEmbeddingWire
      case other => throw new UnsupportedOperationException(
        s"embedding provider '$other' is unknown or needs constructor " +
          "arguments (vertexai: build VertexAIEmbeddingWire(project, " +
          "location, tokens); bedrock: use BedrockTitanEmbeddingClient " +
          "— the Titan invoke protocol is one text per request); " +
          "supported by name: openai-compatible roster, azure_openai, " +
          "ollama, gemini")
    }
}

/** Bedrock Titan embeddings: the invoke protocol takes ONE text per
  * request ({"inputText":…} → {"embedding":[…],
  * "inputTextTokenCount":N}), so this is its own [[EmbeddingClient]]
  * looping the batch, not an [[EmbeddingWire]]. SigV4 auth lives in
  * the transport, as for [[BedrockWire]] — pass a
  * [[graft.tools.SigV4Transport]]-wrapped factory. */
final class BedrockTitanEmbeddingClient(baseUrl: String, model: String,
    mkTransport: () => HttpTransport, maxRetries: Int = 2,
    sleeper: Long => Unit = Thread.sleep,
    usageTokens: Option[LongAccumulator] = None) extends EmbeddingClient {

  import ChatWire.mapper

  @transient private lazy val transport = mkTransport()

  def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val root = mapper.createObjectNode()
    root.put("inputText", t)
    val enc = graft.tools.SigV4.encodePathSegment(model)
    val r = OpenAIProtocol.withRetry(maxRetries, sleeper) {
      transport.request("POST", s"$baseUrl/model/$enc/invoke",
        Map("Content-Type" -> "application/json"),
        mapper.writeValueAsBytes(root))
    }
    val node = mapper.readTree(r.text)
    usageTokens.foreach(_.add(node.path("inputTextTokenCount").asLong(0)))
    val vs = node.path("embedding")
    require(vs.isArray && vs.size() > 0, "invoke returned no embedding")
    Array.tabulate(vs.size())(j => vs.get(j).floatValue())
  }
}
