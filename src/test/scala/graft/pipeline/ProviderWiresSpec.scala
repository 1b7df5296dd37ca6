package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import graft.tools.{CannedTransport, HttpResponse => R}
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

/** Provider wire protocols against canned servers. Each server
  * validates the provider's auth header and endpoint shape and answers
  * in that provider's documented reply shape — so the wire layer
  * (addressing, auth, body build, response parse) is what's under
  * test, mirroring how ExtractionSpec pins the OpenAI wire. */
class ProviderWiresSpec extends AnyFunSuite {

  import ProviderWiresSpec._

  private def noSleep: Long => Unit = _ => ()

  // ---- Azure OpenAI ------------------------------------------------------

  test("Azure wire: deployment-scoped path, api-version query, api-key header") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(AzureOpenAIWire("2024-02-01"), azBase, "az-key",
      "gpt4-deploy", () => azureServer(), systemPrompt = "sys",
      sleeper = noSleep, promptTokens = Some(pt), completionTokens = Some(ct))
    assert(c.complete("ping") === "AZURE:sys:ping")
    assert(pt.value === 5L && ct.value === 2L)

    // wrong key → api-key header rejected, terminal 401
    val bad = new WireChatClient(AzureOpenAIWire(), azBase, "wrong",
      "gpt4-deploy", () => azureServer(), sleeper = noSleep)
    val e = intercept[IllegalStateException](bad.complete("x"))
    assert(e.getMessage.contains("401"))
  }

  test("Azure wire: 429 retries with backoff then succeeds") {
    val c = new WireChatClient(AzureOpenAIWire(), azBase, "az-key",
      "gpt4-deploy", () => azureServer(flaky429 = 2), maxRetries = 3,
      sleeper = noSleep)
    assert(c.complete("pong") === "AZURE::pong")
  }

  test("Azure embedding wire: deployment path + api-key, index-keyed reorder") {
    val c = new WireEmbeddingClient(AzureOpenAIEmbeddingWire(), azBase,
      "az-key", "embed-deploy", () => azureServer(), sleeper = noSleep)
    val rows = c.embed(Seq("abc", "z"))
    assert(rows(0).toSeq === Seq(3f, 'a'.toFloat)) // permuted reply, re-keyed
    assert(rows(1).toSeq === Seq(1f, 'z'.toFloat))
  }

  // ---- Anthropic ---------------------------------------------------------

  test("Anthropic wire: /v1/messages, version header, system top-level, block concat") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(AnthropicWire(), anBase, "an-key", "claude-x",
      () => anthropicServer(), systemPrompt = "be terse", sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    // server splits its answer into two text blocks; client concatenates
    assert(c.complete("hello") === "ANTH:be terse:hello")
    assert(pt.value === 9L && ct.value === 4L)
  }

  test("Anthropic wire: empty content blocks raise with stop_reason") {
    val c = new WireChatClient(AnthropicWire(), anBase, "an-key", "claude-x",
      () => anthropicServer(), sleeper = noSleep)
    val e = intercept[IllegalStateException](c.complete("REFUSE"))
    assert(e.getMessage.contains("finish_reason=refusal"))
  }

  test("Anthropic wire: vision sends a base64 source block the server can decode") {
    val c = new WireChatClient(AnthropicWire(), anBase, "an-key", "claude-x",
      () => anthropicServer(), sleeper = noSleep)
    val img = Array.tabulate[Byte](17)(_.toByte)
    assert(c.completeVision("what", img, "image/gif") === "VISION:what:image/gif:17")
  }

  // ---- Ollama ------------------------------------------------------------

  test("Ollama wire: /api/chat non-streaming, options.temperature, eval counts") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(OllamaWire, olBase, apiKey = "", model = "llama3",
      () => ollamaServer(), temperature = 0.25, sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    assert(c.complete("hi") === "OLLAMA:0.25:hi")
    assert(pt.value === 11L && ct.value === 3L)
  }

  test("Ollama wire: vision rides the per-message images array") {
    val c = new WireChatClient(OllamaWire, olBase, "", "llava",
      () => ollamaServer(), sleeper = noSleep)
    assert(c.completeVision("see", Array[Byte](1, 2, 3)) === "VISION:see:3")
  }

  test("Ollama embedding wire: /api/embed rows in input order; short reply fails") {
    val c = new WireEmbeddingClient(OllamaEmbeddingWire, olBase, "", "mxbai",
      () => ollamaServer(), sleeper = noSleep)
    val rows = c.embed(Seq("ab", "wxyz"))
    assert(rows(0).toSeq === Seq(2f) && rows(1).toSeq === Seq(4f))

    val broken = new WireEmbeddingClient(OllamaEmbeddingWire, olBase, "",
      "drop-last", () => ollamaServer(), sleeper = noSleep)
    val e = intercept[IllegalArgumentException](broken.embed(Seq("a", "b")))
    assert(e.getMessage.contains("missing rows"))
  }

  // ---- Gemini ------------------------------------------------------------

  test("Gemini wire: model-scoped generateContent, goog api key, usageMetadata") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(GeminiWire, geBase, "g-key", "gemini-pro",
      () => geminiServer(), systemPrompt = "short", sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    // server answers in two parts; client concatenates
    assert(c.complete("q1") === "GEM:short:q1")
    assert(pt.value === 6L && ct.value === 2L)
  }

  test("Gemini wire: vision inlineData part round-trips mime + bytes") {
    val c = new WireChatClient(GeminiWire, geBase, "g-key", "gemini-pro",
      () => geminiServer(), sleeper = noSleep)
    assert(c.completeVision("look", Array[Byte](9, 9), "image/png")
      === "VISION:look:image/png:2")
  }

  // ---- streaming ---------------------------------------------------------

  test("OpenAI stream: deltas in order, usage trailer into accumulators, [DONE] terminates") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(OpenAIWire, ssBase, "sk-s", "m",
      () => sseServer(), sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    val out = c.streamComplete("stream me").toList
    assert(out === List("STR", "EAM:", "stream me"))
    assert(pt.value === 8L && ct.value === 3L) // from the usage trailer only
  }

  test("Azure stream: same SSE shape through the deployment-scoped wire") {
    val c = new WireChatClient(AzureOpenAIWire("2024-02-01"), ssBase, "sk-s",
      "m", () => sseServer(azure = true), sleeper = noSleep)
    assert(c.streamComplete("x").mkString === "STREAM:x")
  }

  test("stream with no content ever raises; non-streaming wires refuse") {
    val c = new WireChatClient(OpenAIWire, ssBase, "sk-s", "m",
      () => sseServer(), sleeper = noSleep)
    intercept[IllegalStateException](c.streamComplete("EMPTY").toList)

    val an = new WireChatClient(AnthropicWire(), anBase, "an-key", "m",
      () => anthropicServer(), sleeper = noSleep)
    intercept[UnsupportedOperationException](an.streamComplete("x"))
  }

  // ---- Bedrock -----------------------------------------------------------

  private def bedrockTransport() = new graft.tools.SigV4Transport(
    bedrockServer(), "AKID-test", bedrockSecret, "us-east-1", "bedrock",
    clock = () => 1440938160000L)

  test("Bedrock wire: converse path encodes the model id; server verifies the SigV4 signature") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(BedrockWire, brBase, apiKey = "",
      "anthropic.claude-3-haiku:0", () => bedrockTransport(),
      systemPrompt = "brief", temperature = 0.5, sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    assert(c.complete("hey") === "BR:brief:0.5:hey")
    assert(pt.value === 13L && ct.value === 5L)

    // an unsigned request (raw canned transport, no SigV4 decorator)
    // is rejected by the server's verification
    val unsigned = new WireChatClient(BedrockWire, brBase, "",
      "anthropic.claude-3-haiku:0", () => bedrockServer(), sleeper = noSleep)
    val e = intercept[IllegalStateException](unsigned.complete("x"))
    assert(e.getMessage.contains("403"))
  }

  test("Bedrock wire: vision image block carries format + bytes; guardrail stop raises") {
    val c = new WireChatClient(BedrockWire, brBase, "",
      "anthropic.claude-3-haiku:0", () => bedrockTransport(), sleeper = noSleep)
    assert(c.completeVision("scan", Array[Byte](7, 8, 9, 1), "image/jpeg")
      === "VISION:scan:jpeg:4")
    val e = intercept[IllegalStateException](c.complete("REFUSE"))
    assert(e.getMessage.contains("finish_reason=guardrail_intervened"))
  }

  // ---- Vertex AI ---------------------------------------------------------

  test("Vertex wire: Gemini body on the project/location path, OAuth2 bearer from the JWT exchange") {
    import graft.tools.DocumentAISpec
    val grants = new java.util.concurrent.atomic.AtomicInteger()
    val transport = () => vertexServer(grants)
    val wire = VertexAIWire("p1", "eu",
      new ServiceAccountTokenProvider(DocumentAISpec.saJson, transport,
        clock = () => 5000L))
    val c = new WireChatClient(wire, veBase, apiKey = "", "gemini-pro",
      transport, systemPrompt = "vsys", sleeper = noSleep)
    assert(c.complete("vq") === "VERTEX:vsys:vq")
    // token was minted once via the verified JWT grant, then cached
    assert(c.complete("vq2") === "VERTEX:vsys:vq2")
    assert(grants.get() === 1)
  }

  test("Gemini embedding wire: batchEmbedContents rows in order; short reply fails") {
    val c = new WireEmbeddingClient(GeminiEmbeddingWire, geBase, "g-key",
      "text-emb", () => geminiServer(), sleeper = noSleep)
    val rows = c.embed(Seq("abc", "z"))
    assert(rows(0).toSeq === Seq(3f) && rows(1).toSeq === Seq(1f))
    val broken = new WireEmbeddingClient(GeminiEmbeddingWire, geBase, "g-key",
      "drop-last", () => geminiServer(), sleeper = noSleep)
    intercept[IllegalArgumentException](broken.embed(Seq("a", "b")))
  }

  test("Vertex embedding wire: :predict with bearer auth; token_count sums into usage") {
    import graft.tools.DocumentAISpec
    val grants = new java.util.concurrent.atomic.AtomicInteger()
    val transport = () => vertexServer(grants)
    val usage = new LongAccumulator
    val c = new WireEmbeddingClient(
      VertexAIEmbeddingWire("p1", "eu", new ServiceAccountTokenProvider(
        DocumentAISpec.saJson, transport, clock = () => 5000L)),
      veBase, apiKey = "", "text-emb", transport, sleeper = noSleep,
      usageTokens = Some(usage))
    val rows = c.embed(Seq("ab", "wxyz"))
    assert(rows(0).toSeq === Seq(2f) && rows(1).toSeq === Seq(4f))
    assert(usage.value === 6L) // 2 + 4 token_counts summed
    assert(grants.get() === 1)
  }

  test("Bedrock Titan embeddings: one signed invoke per text; usage accumulates") {
    val usage = new LongAccumulator
    val c = new BedrockTitanEmbeddingClient(brBase, "amazon.titan-embed:0",
      () => bedrockTransport(), sleeper = noSleep, usageTokens = Some(usage))
    val rows = c.embed(Seq("abc", "wxyz"))
    assert(rows(0).toSeq === Seq(3f) && rows(1).toSeq === Seq(4f))
    assert(usage.value === 7L) // inputTextTokenCount = text length here

    // unsigned → 403 from the verifying server
    val unsigned = new BedrockTitanEmbeddingClient(brBase,
      "amazon.titan-embed:0", () => bedrockServer(), sleeper = noSleep)
    intercept[IllegalStateException](unsigned.embed(Seq("x")))
  }

  // ---- roster registry ---------------------------------------------------

  // ---- OpenAI-compatible roster labels -----------------------------------

  test("MiniMax wire: chatcompletion_v2 path, bearer auth, base_resp error raises") {
    val pt = new LongAccumulator; val ct = new LongAccumulator
    val c = new WireChatClient(MiniMaxWire, mmBase, "mm-key", "abab6.5s",
      () => minimaxServer(), systemPrompt = "sys", sleeper = noSleep,
      promptTokens = Some(pt), completionTokens = Some(ct))
    assert(c.complete("hello") === "MM:sys:hello")
    assert(pt.value === 3L && ct.value === 2L)
    // MiniMax reports API errors in a base_resp envelope ON HTTP 200 —
    // the wire must surface them, not return an empty reply
    val e = intercept[IllegalStateException](c.complete("ERR"))
    assert(e.getMessage.contains("minimax error 1002"))
  }

  test("OpenRouter wire: openrouter.ai/api path + optional attribution headers") {
    val c = new WireChatClient(
      OpenRouterWire(Some("https://app.example"), Some("graft")),
      orBase, "or-key", "meta/llama", () => openrouterServer(), sleeper = noSleep)
    assert(c.complete("ping") === "OR:https://app.example:graft:ping")
    // headers are optional: absent when not configured
    val bare = new WireChatClient(OpenRouterWire(), orBase, "or-key",
      "meta/llama", () => openrouterServer(), sleeper = noSleep)
    assert(bare.complete("ping") === "OR:::ping")
  }

  test("Mistral / NVIDIA roster labels: documented default base + bearer via Providers.chatClient") {
    for (prov <- Seq("mistral", "nvidia_build")) {
      val host = Providers.defaultBaseUrl(prov)
      val c = Providers.chatClient(prov, "rk", "model-x",
        () => rosterServer(host))
      assert(c.complete("ping") === s"ROSTER:$host:model-x:ping")
    }
    // a provider with no documented default demands an explicit base
    intercept[IllegalArgumentException](
      Providers.chatClient("openai_compatible", "k", "m",
        () => rosterServer("x")))
  }

  test("Providers registry maps the reference roster onto wires") {
    assert(Providers.chatWire("openai") === OpenAIWire)
    assert(Providers.chatWire("mistral") === OpenAIWire)
    assert(Providers.chatWire("openrouter").isInstanceOf[OpenRouterWire])
    assert(Providers.chatWire("minimax") === MiniMaxWire)
    assert(Providers.chatWire("azure_openai").isInstanceOf[AzureOpenAIWire])
    assert(Providers.chatWire("Anthropic").isInstanceOf[AnthropicWire])
    assert(Providers.chatWire("ollama") === OllamaWire)
    assert(Providers.chatWire("gemini") === GeminiWire)
    assert(Providers.chatWire("bedrock") === BedrockWire)
    // vertexai needs project/location/token-provider constructor args
    intercept[UnsupportedOperationException](Providers.chatWire("vertexai"))

    assert(Providers.embeddingWire("openai") === OpenAIEmbeddingWire)
    assert(Providers.embeddingWire("azure_openai")
      .isInstanceOf[AzureOpenAIEmbeddingWire])
    assert(Providers.embeddingWire("ollama") === OllamaEmbeddingWire)
    assert(Providers.embeddingWire("gemini") === GeminiEmbeddingWire)
    // bedrock embeddings are one-text-per-request (Titan invoke): a
    // dedicated client, not a batch wire
    intercept[UnsupportedOperationException](Providers.embeddingWire("bedrock"))
  }

  test("extraction chain runs through a non-OpenAI wire unchanged") {
    // the D10-D14 surface takes any LLMClient factory; prove a wire
    // client slots in where MockLLM/OpenAIChatClient do
    val mk = () => new WireChatClient(AnthropicWire(), anBase, "an-key",
      "claude-x", () => anthropicServer(), sleeper = noSleep): LLMClient
    assert(mk().complete("42?") === "ANTH::42?")
  }
}

/** Canned provider servers on the companion (client factories ship to
  * executors). Each replies with what it SAW (system prompt, user
  * text, temperature, decoded image size) so the assertion proves the
  * request shape, not just the happy path. */
object ProviderWiresSpec {
  val azBase = "https://az.example.com"
  val anBase = "https://anthropic.example.com"
  val olBase = "http://localhost:11434"
  val geBase = "https://gemini.example.com"
  val brBase = "https://bedrock-runtime.us-east-1.amazonaws.com"
  val veBase = "https://eu-aiplatform.example.com"
  val ssBase = "https://sse.example.com"
  val mmBase = "https://api.minimax.chat"
  val orBase = "https://openrouter.ai/api"
  val bedrockSecret = "bedrock-test-secret"

  private def msgOf(m: ObjectMapper, body: Array[Byte], role: String): String = {
    val msgs = m.readTree(body).path("messages")
    (0 until msgs.size()).map(msgs.get)
      .find(_.path("role").asText() == role)
      .map(_.path("content").asText("")).getOrElse("")
  }

  /** Canned MiniMax: chatcompletion_v2 path, bearer auth, answers in
    * the OpenAI choices/usage shape wrapped with the base_resp
    * envelope; an "ERR" prompt returns the envelope-error-on-200 shape
    * the real service uses. */
  def minimaxServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("Authorization") != Some("Bearer mm-key"))
        R.status(401, """{"base_resp":{"status_code":1004,"status_msg":"auth"}}""")
      else if (method == "POST" && url == s"$mmBase/v1/text/chatcompletion_v2") {
        val sys = msgOf(m, body, "system")
        val user = msgOf(m, body, "user")
        if (user == "ERR")
          R.ok("""{"base_resp":{"status_code":1002,"status_msg":"rate limit"}}""")
        else
          R.ok(s"""{"choices":[{"index":0,"message":{"role":"assistant","content":"MM:$sys:$user"},"finish_reason":"stop"}],"usage":{"prompt_tokens":3,"completion_tokens":2},"base_resp":{"status_code":0,"status_msg":"success"}}""")
      } else R.status(404, url)
    })
  }

  /** Canned OpenRouter: /api/v1 chat path, bearer auth, echoes the
    * attribution headers so their presence/absence is what's tested. */
  def openrouterServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("Authorization") != Some("Bearer or-key"))
        R.status(401, "bad key")
      else if (method == "POST" && url == s"$orBase/v1/chat/completions") {
        val user = msgOf(m, body, "user")
        val ref = headers.getOrElse("HTTP-Referer", "")
        val title = headers.getOrElse("X-Title", "")
        R.ok(s"""{"choices":[{"index":0,"message":{"role":"assistant","content":"OR:$ref:$title:$user"},"finish_reason":"stop"}],"usage":{"prompt_tokens":1,"completion_tokens":1}}""")
      } else R.status(404, url)
    })
  }

  /** Canned generic OpenAI-compatible host pinned to `host`: verifies
    * the documented default base URL reached the wire unchanged. */
  def rosterServer(host: String): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("Authorization") != Some("Bearer rk"))
        R.status(401, "bad key")
      else if (method == "POST" && url == s"$host/v1/chat/completions") {
        val model = m.readTree(body).path("model").asText("")
        val user = msgOf(m, body, "user")
        R.ok(s"""{"choices":[{"index":0,"message":{"role":"assistant","content":"ROSTER:$host:$model:$user"},"finish_reason":"stop"}],"usage":{"prompt_tokens":1,"completion_tokens":1}}""")
      } else R.status(404, url)
    })
  }

  /** Canned SSE chat endpoint: requires stream:true +
    * stream_options.include_usage, replies with the OpenAI chunk
    * sequence — role preamble (no content), content deltas split
    * mid-word, an empty delta with finish_reason, the usage trailer
    * with an empty choices array, then [DONE]. */
  def sseServer(azure: Boolean = false): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      val okAuth = if (azure) headers.get("api-key") == Some("sk-s")
                   else headers.get("Authorization") == Some("Bearer sk-s")
      val okUrl = if (azure)
        url == s"$ssBase/openai/deployments/m/chat/completions?api-version=2024-02-01"
      else url == s"$ssBase/v1/chat/completions"
      if (!okAuth) R.status(401, "bad key")
      else if (method == "POST" && okUrl) {
        val req = m.readTree(body)
        require(req.path("stream").asBoolean(false), "stream:true required")
        require(req.path("stream_options").path("include_usage").asBoolean(false),
          "include_usage required")
        val user = req.path("messages").path(0).path("content").asText()
        def chunk(delta: String, fin: String = "null") =
          s"""data: {"choices":[{"index":0,"delta":$delta,"finish_reason":$fin}]}"""
        val contentChunks =
          if (user.startsWith("EMPTY")) Seq.empty
          else Seq(chunk("""{"content":"STR"}"""), "",
            chunk("""{"content":"EAM:"}"""), "",
            chunk(s"""{"content":"$user"}"""), "")
        val lines = Seq(chunk("""{"role":"assistant"}"""), "") ++
          contentChunks ++ Seq(
          chunk("{}", "\"stop\""), "",
          """data: {"choices":[],"usage":{"prompt_tokens":8,"completion_tokens":3}}""", "",
          "data: [DONE]", "")
        R.ok(lines.mkString("\n"))
      } else R.status(404, url)
    })
  }

  private def mapper = new ObjectMapper()

  /** Canned Bedrock: VERIFIES the SigV4 signature by re-deriving it
    * from the received request with the shared secret (the algorithm
    * itself is pinned against AWS's published vector in SigV4Spec),
    * then answers converse requests echoing what it saw. */
  def bedrockServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      val expect = graft.tools.SigV4.sign(method, url,
        headers.view.filterKeys(k =>
          !Set("authorization", "x-amz-date").contains(k.toLowerCase)).toMap,
        body, "AKID-test", bedrockSecret, "us-east-1", "bedrock",
        1440938160000L).headers
      if (headers.get("Authorization") != expect.get("Authorization") ||
          headers.get("x-amz-date") != expect.get("x-amz-date"))
        R.status(403, """{"message":"The request signature we calculated does not match"}""")
      else if (method == "POST" &&
          url == s"$brBase/model/anthropic.claude-3-haiku%3A0/converse") {
        val req = m.readTree(body)
        val sys = req.path("system").path(0).path("text").asText("")
        val temp = req.path("inferenceConfig").path("temperature").asDouble()
        val parts = req.path("messages").path(0).path("content")
        val ps = (0 until parts.size()).map(parts.get)
        val text = ps.find(_.has("text")).map(_.path("text").asText()).getOrElse("")
        if (text.startsWith("REFUSE"))
          R.ok("""{"output":{"message":{"role":"assistant","content":[]}},"stopReason":"guardrail_intervened","usage":{"inputTokens":1,"outputTokens":0}}""")
        else {
          val answer = ps.find(_.has("image")).map(_.path("image")) match {
            case Some(img) =>
              val n = java.util.Base64.getDecoder
                .decode(img.path("source").path("bytes").asText()).length
              s"VISION:$text:${img.path("format").asText()}:$n"
            case None => s"BR:$sys:$temp:$text"
          }
          R.ok(s"""{"output":{"message":{"role":"assistant","content":[{"text":"$answer"}]}},"stopReason":"end_turn","usage":{"inputTokens":13,"outputTokens":5}}""")
        }
      } else if (method == "POST" &&
          url == s"$brBase/model/amazon.titan-embed%3A0/invoke") {
        val t = m.readTree(body).path("inputText").asText()
        R.ok(s"""{"embedding":[${t.length}.0],"inputTextTokenCount":${t.length}}""")
      } else R.status(404, url)
    })
  }

  /** Canned Vertex endpoint + the DocumentAISpec token server (the
    * same signature-verifying JWT exchange): bearer-gated
    * generateContent on the project/location path. */
  def vertexServer(grants: java.util.concurrent.atomic.AtomicInteger): CannedTransport = {
    val m = mapper
    val tokens = graft.tools.DocumentAISpec.tokenServer(grants)
    new CannedTransport({ (method, url, headers, body) =>
      if (url == graft.tools.DocumentAISpec.tokenUri)
        tokens.request(method, url, headers, body)
      else if (!headers.get("Authorization").exists(_.startsWith("Bearer tok-")))
        R.status(401, """{"error":{"code":401}}""")
      else if (method == "POST" && url == s"$veBase/v1/projects/p1/locations/eu" +
          "/publishers/google/models/gemini-pro:generateContent") {
        val req = m.readTree(body)
        val sys = req.path("systemInstruction").path("parts").path(0)
          .path("text").asText("")
        val text = req.path("contents").path(0).path("parts").path(0)
          .path("text").asText("")
        R.ok(s"""{"candidates":[{"content":{"role":"model","parts":[{"text":"VERTEX:$sys:$text"}]},"finishReason":"STOP"}],"usageMetadata":{"promptTokenCount":2,"candidatesTokenCount":1}}""")
      } else if (method == "POST" && url == s"$veBase/v1/projects/p1/locations/eu" +
          "/publishers/google/models/text-emb:predict") {
        val in = m.readTree(body).path("instances")
        val rows = (0 until in.size()).map { i =>
          val t = in.get(i).path("content").asText()
          s"""{"embeddings":{"values":[${t.length}.0],"statistics":{"token_count":${t.length}}}}"""
        }
        R.ok(s"""{"predictions":[${rows.mkString(",")}]}""")
      } else R.status(404, url)
    })
  }

  def azureServer(flaky429: Int = 0): CannedTransport = {
    val m = mapper
    val fails = new java.util.concurrent.atomic.AtomicInteger(flaky429)
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("api-key") != Some("az-key"))
        R.status(401, """{"error":{"code":"401","message":"bad key"}}""")
      else if (fails.getAndDecrement() > 0)
        R.status(429, """{"error":{"code":"429"}}""")
      else if (method == "POST" &&
          url == s"$azBase/openai/deployments/gpt4-deploy/chat/completions?api-version=2024-02-01") {
        val req = m.readTree(body)
        val msgs = req.path("messages")
        val sys = (0 until msgs.size()).map(msgs.get)
          .find(_.path("role").asText() == "system")
          .map(_.path("content").asText()).getOrElse("")
        val user = (0 until msgs.size()).map(msgs.get)
          .find(_.path("role").asText() == "user")
          .map(_.path("content").asText()).getOrElse("")
        R.ok(s"""{"choices":[{"message":{"role":"assistant","content":"AZURE:$sys:$user"},"finish_reason":"stop"}],"usage":{"prompt_tokens":5,"completion_tokens":2}}""")
      } else if (method == "POST" &&
          url == s"$azBase/openai/deployments/embed-deploy/embeddings?api-version=2024-02-01") {
        val in = m.readTree(body).path("input")
        val rows = (in.size() - 1 to 0 by -1).map { i => // permuted on purpose
          val t = in.get(i).asText()
          s"""{"index":$i,"embedding":[${t.length}.0,${t.head.toInt}.0]}"""
        }
        R.ok(s"""{"data":[${rows.mkString(",")}],"usage":{"total_tokens":${in.size()}}}""")
      } else R.status(404, url)
    })
  }

  def anthropicServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("x-api-key") != Some("an-key"))
        R.status(401, """{"type":"error","error":{"type":"authentication_error"}}""")
      else if (headers.get("anthropic-version").isEmpty)
        R.status(400, """{"type":"error","error":{"type":"invalid_request_error","message":"anthropic-version required"}}""")
      else if (method == "POST" && url == s"$anBase/v1/messages") {
        val req = m.readTree(body)
        require(req.path("max_tokens").isInt, "max_tokens is required")
        val sys = req.path("system").asText("")
        val content = req.path("messages").path(0).path("content")
        if (content.isArray) {
          val parts = (0 until content.size()).map(content.get)
          val text = parts.find(_.path("type").asText() == "text")
            .map(_.path("text").asText()).getOrElse("")
          val img = parts.find(_.path("type").asText() == "image")
            .map(_.path("source")).get
          require(img.path("type").asText() == "base64")
          val n = java.util.Base64.getDecoder.decode(img.path("data").asText()).length
          val mime = img.path("media_type").asText()
          R.ok(s"""{"content":[{"type":"text","text":"VISION:$text:$mime:$n"}],"stop_reason":"end_turn","usage":{"input_tokens":1,"output_tokens":1}}""")
        } else if (content.asText().startsWith("REFUSE"))
          R.ok("""{"content":[],"stop_reason":"refusal","usage":{"input_tokens":1,"output_tokens":0}}""")
        else {
          // two text blocks: clients must concatenate, not take head
          val user = content.asText()
          R.ok(s"""{"content":[{"type":"text","text":"ANTH:$sys:"},{"type":"text","text":"$user"}],"stop_reason":"end_turn","usage":{"input_tokens":9,"output_tokens":4}}""")
        }
      } else R.status(404, url)
    })
  }

  def ollamaServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, _, body) =>
      if (method == "POST" && url == s"$olBase/api/chat") {
        val req = m.readTree(body)
        require(!req.path("stream").asBoolean(true), "must request stream:false")
        val temp = req.path("options").path("temperature").asDouble()
        val msgs = req.path("messages")
        val u = (0 until msgs.size()).map(msgs.get)
          .find(_.path("role").asText() == "user").get
        val images = u.path("images")
        val answer =
          if (images.isArray && images.size() > 0) {
            val n = java.util.Base64.getDecoder.decode(images.get(0).asText()).length
            s"VISION:${u.path("content").asText()}:$n"
          } else s"OLLAMA:$temp:${u.path("content").asText()}"
        R.ok(s"""{"model":"x","message":{"role":"assistant","content":"$answer"},"done":true,"done_reason":"stop","prompt_eval_count":11,"eval_count":3}""")
      } else if (method == "POST" && url == s"$olBase/api/embed") {
        val req = m.readTree(body)
        val in = req.path("input")
        val n = if (req.path("model").asText() == "drop-last") in.size() - 1
                else in.size()
        val rows = (0 until n).map(i => s"[${in.get(i).asText().length}.0]")
        R.ok(s"""{"embeddings":[${rows.mkString(",")}],"prompt_eval_count":$n}""")
      } else R.status(404, url)
    })
  }

  def geminiServer(): CannedTransport = {
    val m = mapper
    new CannedTransport({ (method, url, headers, body) =>
      if (headers.get("x-goog-api-key") != Some("g-key"))
        R.status(403, """{"error":{"code":403,"status":"PERMISSION_DENIED"}}""")
      else if (method == "POST" &&
          url == s"$geBase/v1beta/models/gemini-pro:generateContent") {
        val req = m.readTree(body)
        val sys = req.path("systemInstruction").path("parts").path(0)
          .path("text").asText("")
        val parts = req.path("contents").path(0).path("parts")
        val ps = (0 until parts.size()).map(parts.get)
        val text = ps.find(_.has("text")).map(_.path("text").asText()).getOrElse("")
        val reply = ps.find(_.has("inlineData")).map(_.path("inlineData")) match {
          case Some(d) =>
            val n = java.util.Base64.getDecoder.decode(d.path("data").asText()).length
            s"VISION:$text:${d.path("mimeType").asText()}:$n"
          case None => s"GEM:$sys:$text"
        }
        // reply split across two parts: clients must concatenate
        val (a, b) = reply.splitAt(4)
        R.ok(s"""{"candidates":[{"content":{"role":"model","parts":[{"text":"$a"},{"text":"$b"}]},"finishReason":"STOP"}],"usageMetadata":{"promptTokenCount":6,"candidatesTokenCount":2}}""")
      } else if (method == "POST" &&
          url.startsWith(s"$geBase/v1beta/models/") &&
          url.endsWith(":batchEmbedContents")) {
        val reqs = m.readTree(body).path("requests")
        val model = m.readTree(body).path("requests").path(0)
          .path("model").asText("")
        val n = if (model == "models/drop-last") reqs.size() - 1 else reqs.size()
        val rows = (0 until n).map { i =>
          val t = reqs.get(i).path("content").path("parts").path(0)
            .path("text").asText()
          s"""{"values":[${t.length}.0]}"""
        }
        R.ok(s"""{"embeddings":[${rows.mkString(",")}]}""")
      } else R.status(404, url)
    })
  }
}
