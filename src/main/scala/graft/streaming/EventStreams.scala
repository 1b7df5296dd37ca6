package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming tier (SURVEY.md §2.10): the cron-ETL trigger
  * becomes `Trigger.AvailableNow` micro-batch runs over a file source with
  * checkpointed exactly-once (T1-T2); event-time windows + watermarks
  * cover T3-T4; `dropDuplicates` on content hash gives the FileHistory
  * identity inside the stream.
  */
object EventStreams {

  /** T1: incremental file-source scan — each AvailableNow run processes
    * only files the checkpoint hasn't seen (the reference's cron ETL +
    * FileHistory semantics in one construct). */
  def incrementalFiles(spark: SparkSession, srcDir: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .json(srcDir)

  /** T2: content-identity dedup within the stream (state-backed). */
  def dedupByHash(stream: DataFrame, hashCol: String): DataFrame =
    stream.dropDuplicates(hashCol)

  /** T3/T4: watermarked tumbling-window aggregation over event time. */
  def windowedCounts(events: DataFrame, tsCol: String,
      window_ : String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** T4 (overlapping form): sliding/hopping windows — each event lands
    * in duration/slide windows (q138's batch dual). The watermark
    * bounds open-window state: at most (watermark + duration)/slide
    * windows per key are ever live, whatever the stream length. */
  def slidingCounts(events: DataFrame, tsCol: String,
      duration: String = "1 hour", slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration, slide))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** T4: session windows with a gap duration (native session_window). */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))

  /** Run one AvailableNow micro-batch pass to a parquet sink and wait. */
  def runAvailableNow(out: DataFrame, sinkDir: String, checkpoint: String): Unit = {
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", sinkDir)
      .start()
    q.awaitTermination()
  }

  /** Run one AvailableNow pass through foreachBatch — the hook for
    * batch-only transforms over an incremental source (broadcast-model
    * scoring, multi-table writes, JDBC sinks). Each micro-batch is a
    * plain batch DataFrame inside `f`, with exactly-once replay
    * semantics from the checkpoint. */
  def runAvailableNowForeachBatch(out: DataFrame, checkpoint: String)(
      f: (DataFrame, Long) => Unit): Unit = {
    val q = out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(f)
      .start()
    q.awaitTermination()
  }

  /** As above but into an in-memory table (tests / interactive). */
  def runAvailableNowToMemory(out: DataFrame, name: String,
      checkpoint: String, complete: Boolean = false): Unit = {
    val q = out.writeStream
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .queryName(name)
      .start()
    q.awaitTermination()
  }
}
