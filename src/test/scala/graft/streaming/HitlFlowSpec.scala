package graft.streaming

import graft.SparkSpec
import graft.sinks.ResultCache

/** End-to-end HITL loop across the round-3 tier: pipeline results
  * stream into a review queue (S8/K4), a human-side consumer drains a
  * bounded batch and posts verdicts, and the verdicts land in the API
  * result cache (K6) where the deployment client polls them — the
  * destination.py:853-1115 → result_cache_utils.py flow with every hop
  * behind a contract-tested component. */
class HitlFlowSpec extends SparkSpec {

  test("results → review queue → human verdicts → result-cache poll") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hitl-q").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hitl-ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-hitl-src").toString
    val ns = s"hitl-${java.util.UUID.randomUUID()}"

    // pipeline side: extraction results stream to the review queue
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "results.json"),
      Seq(
        """{"workflow_id":"wf","execution_id":"ex1","file":"a.pdf","total":12.5}""",
        """{"workflow_id":"wf","execution_id":"ex1","file":"b.pdf","total":99.0}""",
        """{"workflow_id":"wf","execution_id":"ex2","file":"c.pdf","total":1.0}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("workflow_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("execution_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("total", org.apache.spark.sql.types.DoubleType)))
    val in = spark.readStream.schema(schema).json(srcDir)
    Queues.streamTo(in, "review:wf", () => new DirectoryQueue(root),
      ckpt, ttlSeconds = Some(3600)).awaitTermination()
    assert(new DirectoryQueue(root).llen("review:wf") === 3)

    // human side: drain a bounded batch, attach verdicts
    val batch = Queues.dequeueToDataFrame(spark, "review:wf",
      () => new DirectoryQueue(root))
    assert(batch.count() === 3)
    val verdicts = batch.withColumn("review_status",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("total") > 50, "REJECTED")
        .otherwise("APPROVED"))

    // verdicts land in the per-execution result cache; the client polls
    val cache = new ResultCache(() => new MemoryQueue(ns), ttlSeconds = 600)
    cache.write(verdicts)
    val ex1 = cache.getDataFrame(spark, "wf", "ex1")
    assert(ex1.count() === 2)
    val statuses = ex1.select("file", "review_status").as[(String, String)]
      .collect().toMap
    assert(statuses == Map("a.pdf" -> "APPROVED", "b.pdf" -> "REJECTED"))
    assert(cache.get("wf", "ex2").size === 1)
    // the queue is drained — nothing double-delivered to a second reviewer
    assert(new DirectoryQueue(root).llen("review:wf") === 0)
  }
}
