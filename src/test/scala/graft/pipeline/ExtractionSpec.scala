package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtractionSpec extends SparkSpec {

  test("MockLLM deterministic answers") {
    val llm = new MockLLM
    val p = LLM.assemblePrompt("count of word 'batch'", lit("x")).toString
    assert(llm.complete("count of word 'batch'\nContext:\nbatch a batch\nAnswer:") == "2")
    assert(llm.complete("does it mention 'spark'\nContext:\nno sp here\nAnswer:") == "no")
    assert(llm.complete("first word\nContext:\n hello world\nAnswer:") == "hello")
    assert(llm.complete("unknown question\nContext:\nabc\nAnswer:") == "NA")
  }

  test("extract end-to-end with mock LLM: typed columns") {
    import spark.implicits._
    val df = Seq(
      (1L, "batch job batch run spark"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val specs = Seq(
      PromptSpec("n_batch", "count of word 'batch'", "number"),
      PromptSpec("has_spark", "does it mention 'spark'", "boolean"),
      PromptSpec("first", "first word", "text"),
      PromptSpec("missing", "what is the invoice date?", "date"))
    val out = Extraction.extract(df, "text", specs, () => new MockLLM)
      .orderBy("doc_id").collect()

    assert(out(0).getAs[Double]("n_batch") == 2.0)
    assert(out(0).getAs[Boolean]("has_spark"))
    assert(out(0).getAs[String]("first") == "batch")
    assert(out(0).isNullAt(out(0).fieldIndex("missing"))) // "NA" -> null
    assert(out(1).getAs[Double]("n_batch") == 0.0)
    assert(!out(1).getAs[Boolean]("has_spark"))
  }

  test("F11 grammar notes: per-word synonym block injected into the prompt") {
    import spark.implicits._
    // reference shape: _build_grammar_notes (answer_prompt.py:175-190)
    val rules = Seq(
      LLM.GrammarRule("invoice", Seq("bill", "receipt")),
      LLM.GrammarRule("", Seq("ignored")),          // no word → skipped
      LLM.GrammarRule("total", Nil),                // no synonyms → skipped
      LLM.GrammarRule("vendor", Seq("supplier")))
    val notes = LLM.grammarNotes(rules)
    assert(notes ===
      "Note: You can consider that the word 'invoice' is the same as " +
        "bill, receipt in both the question and the context.\n" +
        "Note: You can consider that the word 'vendor' is the same as " +
        "supplier in both the question and the context.")
    assert(LLM.grammarNotes(Nil) === "")

    // assembled prompt carries the block between question and context
    val prompt = Seq("ctx").toDF("t")
      .select(LLM.assemblePrompt("what is the invoice total?", col("t"),
        grammar = rules).as("p"))
      .as[String].collect().head
    assert(prompt.contains("what is the invoice total?\nNote: You can consider"))
    assert(prompt.indexOf("'invoice'") < prompt.indexOf("Context:"))
    // and a grammar-free prompt is unchanged — no stray blank note line
    val bare = Seq("ctx").toDF("t")
      .select(LLM.assemblePrompt("q", col("t")).as("p")).as[String].collect().head
    assert(!bare.contains("Note:"))

    // end-to-end: the note block rides along without breaking extraction
    val df = Seq((1L, "batch batch")).toDF("doc_id", "text")
    val out = Extraction.extract(df, "text",
      Seq(PromptSpec("n_batch", "count of word 'batch'", "number",
        grammar = Seq(LLM.GrammarRule("batch", Seq("lot"))))),
      () => new MockLLM).collect().head
    assert(out.getAs[Double]("n_batch") == 2.0)
  }

  test("convert: NA sanitize + try-cast semantics") {
    import spark.implicits._
    val df = Seq("12.5", "NA", "not a number").toDF("a")
    val got = df.select(Extraction.convert(col("a"), "number").as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq == Seq(12.5, null, null))

    val dates = Seq("2024-03-05", "NA", "garbage").toDF("a")
      .select(Extraction.convert(col("a"), "date").as("v"))
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull)
    assert(dates.toSeq == Seq("2024-03-05", null, null))

    val emails = Seq("a@b.com", "nope", "NA").toDF("a")
      .select(Extraction.convert(col("a"), "email").as("v"))
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull)
    assert(emails.toSeq == Seq("a@b.com", null, null))
  }

  test("RetryingLLM retries transient failures and counts usage") {
    val pt = spark.sparkContext.longAccumulator("pt")
    val ct = spark.sparkContext.longAccumulator("ct")
    var calls = 0
    val flaky = new LLMClient {
      override def complete(p: String): String = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        "ok answer"
      }
    }
    val r = new RetryingLLM(flaky, maxAttempts = 5, Some(pt), Some(ct))
    assert(r.complete("two tokens") == "ok answer")
    assert(calls == 3)
    assert(pt.value == 2L && ct.value == 2L)
  }

  test("RetryingLLM is bounded: null-returning client fails, never spins") {
    var calls = 0
    val nullClient = new LLMClient {
      override def complete(p: String): String = { calls += 1; null }
    }
    val r = new RetryingLLM(nullClient, maxAttempts = 3)
    intercept[IllegalStateException](r.complete("q"))
    assert(calls == 3)
  }

  test("RetryingLLM surfaces the final exception after exhausting attempts") {
    var calls = 0
    val broken = new LLMClient {
      override def complete(p: String): String = {
        calls += 1; throw new RuntimeException(s"down $calls")
      }
    }
    val r = new RetryingLLM(broken, maxAttempts = 4)
    val e = intercept[RuntimeException](r.complete("q"))
    assert(e.getMessage == "down 4")
    assert(calls == 4)
  }
}
