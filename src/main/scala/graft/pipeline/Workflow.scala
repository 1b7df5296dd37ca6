package graft.pipeline

import graft.sources.FileScan
import graft.sinks.Sinks
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Workflow composition (SURVEY.md §3.1): the reference's
  * source → dedup → tool-pipeline → destination run as ONE Spark job —
  * the Celery fan-out, chord barrier and batch bookkeeping collapse into
  * Spark's scheduler (§4 table).
  *
  * scan (binaryFile) → history anti-join → extraction columns →
  * destination write + history upsert + usage rollup.
  */
object Workflow {

  final case class RunSummary(
      listed: Long, afterDedup: Long, extracted: Long, failed: Long)

  /** `reviewQueue` (connector factory + queue name) routes a copy of
    * every destination row into the HITL review queue (K4); a
    * `resultCache` (K6) receives per-file results under
    * (workflowId, executionId) for API polling — both optional hops of
    * the reference's destination stage (destination.py:516-557,853-1115). */
  final case class WorkflowSpec(
      scan: FileScan.ScanConfig,
      prompts: Seq[PromptSpec],
      historyPath: String,
      outputFolder: String,
      workflowId: String = "wf-1",
      executionId: String = "ex-1",
      reviewQueue: Option[(() => graft.streaming.QueueConnector, String)] = None,
      reviewTtlSeconds: Long = 3600,
      resultCache: Option[graft.sinks.ResultCache] = None)

  /** One durable materialization barrier (same contract as
    * `DedupOps.materialize`): with `spark.graft.workflow.stagingDir` set,
    * results stage to parquet — survives executor loss, and every
    * downstream action is a plain parquet re-read; without it,
    * `localCheckpoint` (executor memory/disk) — fine single-node, lost
    * with an executor on a real cluster. */
  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Staging.materialize(df, tag, "spark.graft.workflow.stagingDir")

  /** Execute a batch run end-to-end. Returns the summary the reference's
    * chord callback would assemble (workers/file_processing/tasks.py:1023-1090).
    *
    * Exactly TWO jobs touch source bytes / the LLM:
    *  1. scan → anti-join, with the listing and post-dedup counts
    *     collected via [[Observation]] on that same pass — a separate
    *     `files.count()` would re-pay the binaryFile listing;
    *  2. extraction, materialized ONCE — the fs sink, review queue,
    *     result cache and history upsert all read the staged result, so
    *     each LLM completion is billed once per (row, prompt), never
    *     once per downstream action (SURVEY §7.4's double-billing
    *     hazard; at 100 TB with a metered LLM a per-action re-run is a
    *     4× cost multiplier). */
  def run(spark: SparkSession, spec: WorkflowSpec,
      client: () => LLMClient): RunSummary = {
    val files = FileScan.scan(spark, spec.scan)

    val history: DataFrame = try {
      spark.read.parquet(spec.historyPath)
    } catch {
      case _: Exception =>
        import spark.implicits._
        Seq.empty[(String, String, String, String)]
          .toDF("cache_key", "file_path", "status", "result")
    }

    val obsScan = Observation()
    val obsFresh = Observation()
    val fresh = materialize(
      FileScan.dedupAgainstHistory(
          files.observe(obsScan, count(lit(1)).as("listed")), history)
        .withColumn("text", col("content").cast("string"))
        .observe(obsFresh, count(lit(1)).as("fresh")),
      "fresh")

    val obsExtract = Observation()
    val extracted = materialize(
      Extraction.extract(fresh, "text", spec.prompts, client)
        .withColumn("error_message", lit(null).cast("string"))
        // content/text never outlive extraction: staging them would
        // rewrite every source byte a second time
        .drop("content", "text")
        .observe(obsExtract,
          count(lit(1)).as("n_out"),
          count(when(col("error_message").isNotNull, true)).as("n_err")),
      "extracted")

    val shaped = Sinks.shapeForDb(extracted, createdBy = spec.workflowId)
    Sinks.writeFs(shaped.drop("error_message"), spec.outputFolder)

    // optional destination hops: HITL review queue + API result cache
    val keyed = shaped
      .withColumn("workflow_id", lit(spec.workflowId))
      .withColumn("execution_id", lit(spec.executionId))
    spec.reviewQueue.foreach { case (mk, queueName) =>
      graft.streaming.Queues.enqueueDataFrame(
        keyed.drop("error_message"), queueName, mk, Some(spec.reviewTtlSeconds))
    }
    spec.resultCache.foreach(_.write(keyed.drop("error_message")))

    val newHistory = extracted.select(
      col("file_hash").as("cache_key"),
      col("file_path"),
      when(col("error_message").isNotNull, "ERROR").otherwise("COMPLETED").as("status"),
      to_json(struct(spec.prompts.map(p => col(p.name)): _*)).as("result"))
    Sinks.upsertHistory(spark, spec.historyPath, newHistory)

    RunSummary(
      obsScan.get("listed").asInstanceOf[Long],
      obsFresh.get("fresh").asInstanceOf[Long],
      obsExtract.get("n_out").asInstanceOf[Long],
      obsExtract.get("n_err").asInstanceOf[Long])
  }
}
