package graft.sinks

import graft.streaming.QueueConnector
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** K6 result cache: API-deployment clients poll per-execution results
  * while the run is in flight (reference
  * backend/workflow_manager/endpoint_v2/result_cache_utils.py — a
  * Redis list per `api_results:{workflow_id}:{execution_id}`, appended
  * with rpush_with_expire and drained with lrange).
  *
  * The cache is a thin keyed view over the [[QueueConnector]] contract,
  * so the backend is pluggable exactly like the reference's CacheService
  * (MemoryQueue locally, JdbcQueue/Redis in a deployment); the streaming
  * writer lands every micro-batch through a distributed foreachBatch —
  * results never funnel through the driver.
  */
final class ResultCache(mk: () => QueueConnector,
    ttlSeconds: Long = 3600) extends Serializable {

  private def key(workflowId: String, executionId: String): String =
    s"api_results:$workflowId:$executionId"

  /** rpush_with_expire: append one file's result, refresh the TTL. */
  def update(workflowId: String, executionId: String, resultJson: String): Unit =
    mk().enqueueWithExpire(key(workflowId, executionId), resultJson, ttlSeconds)

  /** The client poll: all results cached so far for the execution. */
  def get(workflowId: String, executionId: String): Seq[String] =
    mk().lrange(key(workflowId, executionId), 0, -1)

  def delete(workflowId: String, executionId: String): Unit =
    mk().delete(key(workflowId, executionId))

  /** Batch writer: push a result DataFrame into the per-execution lists.
    * Each partition opens its own connector; the row's own
    * workflow_id/execution_id columns pick the list. */
  def write(results: DataFrame, workflowCol: String = "workflow_id",
      executionCol: String = "execution_id"): Unit = {
    val ttl = ttlSeconds
    val mkq = mk
    val keyed = results.select(
      col(workflowCol).cast("string").as("__wf"),
      col(executionCol).cast("string").as("__ex"),
      to_json(struct(results.columns
        .filterNot(Seq(workflowCol, executionCol).contains).map(col): _*)).as("__json"))
    keyed.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val q = mkq()
      it.foreach { r =>
        q.enqueueWithExpire(s"api_results:${r.getString(0)}:${r.getString(1)}",
          r.getString(2), ttl)
      }
    }
  }

  /** Streaming writer: every micro-batch of an in-flight run lands in
    * the cache (the foreachBatch KV-writer mapping from SURVEY.md). */
  def sink(results: DataFrame, checkpoint: String,
      workflowCol: String = "workflow_id",
      executionCol: String = "execution_id"): StreamingQuery =
    results.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        write(batch.toDF(), workflowCol, executionCol)
      }
      .start()

  /** Poll as a DataFrame (JSON-parsed), for the API layer's response
    * shaping; bounded by construction — one execution's results. */
  def getDataFrame(spark: SparkSession, workflowId: String,
      executionId: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(get(workflowId, executionId)))
  }
}
