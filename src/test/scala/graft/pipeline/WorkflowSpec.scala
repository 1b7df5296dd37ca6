package graft.pipeline

import graft.SparkSpec
import graft.sources.FileScan
import java.nio.file.Files

/** E2E pipeline fixture (FIXTURES.md §7, mirroring the reference's
  * tests/e2e/etl flow with a canned LLM). */
class WorkflowSpec extends SparkSpec {

  test("ETL run end-to-end: scan → dedup → extract → sink + history") {
    val srcDir = Files.createTempDirectory("graft-wf-src")
    Files.write(srcDir.resolve("probe.txt"),
      "ETL probe. This document is about pipeline widgets and invoices.".getBytes)
    Files.write(srcDir.resolve("second.txt"),
      "batch batch spark pipeline".getBytes)
    val outDir = Files.createTempDirectory("graft-wf-out").toString + "/results"
    val histPath = Files.createTempDirectory("graft-wf-hist").toString + "/history"

    val queueRoot = Files.createTempDirectory("graft-wf-queue").toString
    val cacheNs = s"wf-${java.util.UUID.randomUUID()}"
    val cache = new graft.sinks.ResultCache(
      () => new graft.streaming.MemoryQueue(cacheNs), ttlSeconds = 600)
    val spec = Workflow.WorkflowSpec(
      scan = FileScan.ScanConfig(srcDir.toString, glob = "*.txt"),
      prompts = Seq(
        PromptSpec("n_batch", "count of word 'batch'", "number"),
        PromptSpec("mentions_pipeline", "does it mention 'pipeline'", "boolean")),
      historyPath = histPath,
      outputFolder = outDir,
      reviewQueue = Some((() => new graft.streaming.DirectoryQueue(queueRoot), "review:wf-1")),
      resultCache = Some(cache))

    val run1 = Workflow.run(spark, spec, () => new MockLLM)
    assert(run1.listed == 2 && run1.afterDedup == 2 && run1.extracted == 2 && run1.failed == 0)

    // the optional destination hops fired: review packets + pollable cache
    assert(new graft.streaming.DirectoryQueue(queueRoot).llen("review:wf-1") == 2)
    assert(cache.get("wf-1", "ex-1").size == 2)

    // destination rows landed with the mock answers
    val out = spark.read.json(outDir)
    assert(out.count() == 2)
    val byFile = out.collect().map(r =>
      r.getAs[String]("file_name") -> r.getAs[Double]("n_batch")).toMap
    assert(byFile("second.txt") == 2.0)
    assert(byFile("probe.txt") == 0.0)
    assert(out.filter(org.apache.spark.sql.functions.col("status") === "SUCCESS").count() == 2)

    // second run: everything already in history → exactly-once per file
    val run2 = Workflow.run(spark, spec, () => new MockLLM)
    assert(run2.listed == 2 && run2.afterDedup == 0 && run2.extracted == 0)

    // third run with one new file → only the new file processes
    Files.write(srcDir.resolve("third.txt"), "spark spark batch".getBytes)
    val run3 = Workflow.run(spark, spec, () => new MockLLM)
    assert(run3.listed == 3 && run3.afterDedup == 1 && run3.extracted == 1)
    assert(spark.read.parquet(histPath).count() == 3)
  }

  test("extraction is billed once per (row, prompt) — never once per sink action") {
    val srcDir = Files.createTempDirectory("graft-wf1x-src")
    Files.write(srcDir.resolve("a.txt"), "batch pipeline".getBytes)
    Files.write(srcDir.resolve("b.txt"), "batch batch".getBytes)
    val outDir = Files.createTempDirectory("graft-wf1x-out").toString + "/results"
    val histPath = Files.createTempDirectory("graft-wf1x-hist").toString + "/history"
    val queueRoot = Files.createTempDirectory("graft-wf1x-queue").toString
    val cache = new graft.sinks.ResultCache(
      () => new graft.streaming.MemoryQueue(s"wf1x-${java.util.UUID.randomUUID()}"),
      ttlSeconds = 600)
    // EVERY optional destination hop active: fs sink + review queue +
    // result cache + history upsert + the two summary counts — with the
    // old per-action re-execution this run would bill the LLM up to 6×
    val spec = Workflow.WorkflowSpec(
      scan = FileScan.ScanConfig(srcDir.toString, glob = "*.txt"),
      prompts = Seq(
        PromptSpec("n_batch", "count of word 'batch'", "number"),
        PromptSpec("mentions_pipeline", "does it mention 'pipeline'", "boolean")),
      historyPath = histPath,
      outputFolder = outDir,
      reviewQueue = Some((() => new graft.streaming.DirectoryQueue(queueRoot), "review:wf-1")),
      resultCache = Some(cache))
    val calls = spark.sparkContext.longAccumulator("llm-calls")
    val run = Workflow.run(spark, spec, () => new CountingLLM(calls))
    assert(run.listed == 2 && run.extracted == 2 && run.failed == 0)
    assert(calls.value === 4L, // 2 files × 2 prompts, exactly once each
      s"LLM billed ${calls.value} completions for 4 (row, prompt) pairs")
  }

  test("workflow staging dir: extraction materializes durably, same results") {
    val srcDir = Files.createTempDirectory("graft-wfstage-src")
    Files.write(srcDir.resolve("a.txt"), "batch pipeline".getBytes)
    val outDir = Files.createTempDirectory("graft-wfstage-out").toString + "/results"
    val histPath = Files.createTempDirectory("graft-wfstage-hist").toString + "/history"
    val staging = Files.createTempDirectory("graft-wfstage-stg").toString
    spark.conf.set("spark.graft.workflow.stagingDir", staging)
    try {
      val spec = Workflow.WorkflowSpec(
        scan = FileScan.ScanConfig(srcDir.toString, glob = "*.txt"),
        prompts = Seq(PromptSpec("n_batch", "count of word 'batch'", "number")),
        historyPath = histPath,
        outputFolder = outDir)
      val calls = spark.sparkContext.longAccumulator("llm-calls-staged")
      val run = Workflow.run(spark, spec, () => new CountingLLM(calls))
      assert(run.listed == 1 && run.extracted == 1 && calls.value === 1L)
      val staged = new java.io.File(staging).listFiles()
      assert(staged.exists(_.getName.startsWith("extracted_")),
        "extraction did not stage to the configured dir")
      val out = spark.read.json(outDir)
      assert(out.collect().head.getAs[Double]("n_batch") == 1.0)
    } finally spark.conf.unset("spark.graft.workflow.stagingDir")
  }
}

/** MockLLM that meters completions through an accumulator — the test
  * double for the reference's billed LLM adapter. */
class CountingLLM(acc: org.apache.spark.util.LongAccumulator) extends LLMClient {
  private val inner = new MockLLM
  override def complete(prompt: String): String = {
    acc.add(1); inner.complete(prompt)
  }
}
