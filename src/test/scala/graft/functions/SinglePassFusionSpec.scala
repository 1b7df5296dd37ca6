package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{LLMClientRegistry, LLMComplete}
import graft.pipeline.{Extraction, MockLLM, PromptSpec}
import java.util.concurrent.atomic.AtomicLong

/** D17 single-pass fusion as an optimizer rule: N per-field LLM calls
  * sharing a context fuse into one combined call.
  */
class SinglePassFusionSpec extends SparkSpec {

  /** Counts completions — detects whether fusion actually collapsed the
    * per-field round-trips. */
  class CountingMock extends MockLLM {
    override def complete(p: String): String = {
      if (!p.startsWith("SINGLE_PASS_JSON")) CountingMock.topLevel.incrementAndGet()
      else CountingMock.fused.incrementAndGet()
      super.complete(p)
    }
  }
  object CountingMock {
    val topLevel = new AtomicLong
    val fused = new AtomicLong
  }

  private val specs = Seq(
    PromptSpec("n_batch", "count of word 'batch'", "number"),
    PromptSpec("has_spark", "does it mention 'spark'", "boolean"),
    PromptSpec("first", "first word", "text"))

  test("fusion rule rewrites N sibling calls into one combined call") {
    import spark.implicits._
    LLMClientRegistry.register("counting", () => new CountingMock)
    val df = Seq(
      (1L, "batch job batch run spark"),
      (2L, "nothing here"),
      (3L, "spark batch")).toDF("doc_id", "text")
      // break LocalRelation constant-folding: a local Seq-backed frame
      // gets the whole projection (LLM calls included!) evaluated at
      // optimization time; real scans never fold
      .repartition(2)

    val out = Extraction.extractNative(df, "text", specs, "counting")
      .select("doc_id", "n_batch", "has_spark", "first")

    // the optimized plan carries exactly ONE LLMComplete
    val llmNodes = out.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case l: LLMComplete => l })
    }.flatten
    assert(llmNodes.size == 1, s"expected 1 fused call, got: $llmNodes")
    assert(llmNodes.head.child.toString.contains("SINGLE_PASS_JSON"))

    CountingMock.topLevel.set(0); CountingMock.fused.set(0)
    // no orderBy here: range-partition sampling would execute the
    // projection a second time and double the call count
    val rows = out.collect().sortBy(_.getLong(0))
    // one fused completion per row; the mock answers sub-questions
    // internally (those are not network round-trips)
    assert(CountingMock.fused.get() == 3, s"fused=${CountingMock.fused.get()}")
    assert(CountingMock.topLevel.get() == 0, s"top=${CountingMock.topLevel.get()}")

    // results identical to the unfused UDF path
    val classic = Extraction.extract(df, "text", specs, () => new MockLLM)
      .select("doc_id", "n_batch", "has_spark", "first").collect().sortBy(_.getLong(0))
    assert(rows.map(_.toString).toSeq == classic.map(_.toString).toSeq)
  }

  test("single calls and mixed contexts are left alone") {
    import spark.implicits._
    LLMClientRegistry.register("counting", () => new CountingMock)
    val df = Seq((1L, "ctx one", "ctx two")).toDF("doc_id", "a", "b").repartition(2)
    val one = Extraction.extractNative(df, "a", specs.take(1), "counting")
    val oneNodes = one.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case l: LLMComplete => l })
    }.flatten.distinct
    assert(oneNodes.size == 1)
    assert(!oneNodes.head.child.toString.contains("SINGLE_PASS_JSON"))

    // two different context columns: two independent calls, no fusion
    val mixed = Extraction.extractNative(
      Extraction.extractNative(df, "a", specs.take(1), "counting"),
      "b", Seq(PromptSpec("first_b", "first word", "text")), "counting")
    val mixedNodes = mixed.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case l: LLMComplete => l })
    }.flatten
    assert(mixedNodes.forall(n => !n.child.toString.contains("SINGLE_PASS_JSON")))
  }
}
