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
