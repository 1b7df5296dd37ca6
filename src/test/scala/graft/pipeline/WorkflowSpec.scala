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
}
