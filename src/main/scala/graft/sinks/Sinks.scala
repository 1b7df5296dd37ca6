package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Destination connectors (SURVEY.md K1-K7) on Spark primitives.
  *
  * K2's live-database half (JDBC execute of SchemaDDL statements +
  * df.write.jdbc) needs a reachable database; this container has none, so
  * the writer composes DDL via SchemaDDL (unit-tested) and the row
  * shaping here is shared by every dialect.
  */
object Sinks {

  /** K2 row shaping: the reference's permanent columns around the data
    * columns; error rows carry status='ERROR' + message with data nulled
    * (database_utils.py:160-182, unstract_db.py:364-377). */
  def shapeForDb(results: DataFrame, createdBy: String,
      singleColumnMode: Boolean = false): DataFrame = {
    val dataCols = results.columns.filterNot(Seq("status", "error_message").contains)
    val base = results
      .withColumn("id", uuid())                      // F6
      .withColumn("created_by", lit(createdBy))
      .withColumn("created_at", current_timestamp()) // F7
      .withColumn("status",
        when(col("error_message").isNotNull, "ERROR").otherwise("SUCCESS"))
    if (singleColumnMode)
      base.select(col("id"), col("created_by"), col("created_at"),
        to_json(struct(lit("result").as("k"),
          to_json(struct(dataCols.map(col): _*)).as("v"))).as("metadata"),
        to_json(struct(dataCols.map(col): _*)).as("data"),
        col("status"), col("error_message"))
    else base
  }

  /** K1: filesystem sink — result rows as json under outputFolder,
    * partitioned by a routing column when given (D22 classify routing). */
  def writeFs(results: DataFrame, outputFolder: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = results.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .json(outputFolder)
  }

  /** K5: FileHistory upsert (MERGE semantics on a parquet state table):
    * new rows replace same-cache_key rows, others survive. Parquet has no
    * MERGE — rewrite = (existing ⟕anti new) ∪ new. On Delta this is a
    * real MERGE INTO. */
  def upsertHistory(spark: SparkSession, historyPath: String,
      updates: DataFrame): Unit = {
    val exists = try {
      spark.read.parquet(historyPath).count() >= 0
    } catch { case _: Exception => false }
    val merged = if (exists) {
      val current = spark.read.parquet(historyPath)
      current.join(updates.select("cache_key"), Seq("cache_key"), "left_anti")
        .unionByName(updates)
    } else updates
    // two-phase write: parquet can't overwrite a path being read
    val tmp = historyPath + "__staged"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(historyPath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** A1/K7: usage rollup — group per-call usage rows by run. */
  def usageRollup(usage: DataFrame): DataFrame =
    usage.groupBy(col("run_id")).agg(
      sum("embedding_tokens").as("embedding_tokens"),
      sum("prompt_tokens").as("prompt_tokens"),
      sum("completion_tokens").as("completion_tokens"),
      sum("total_tokens").as("total_tokens"),
      round(sum("cost_in_dollars"), 6).as("cost_in_dollars"))

  /** K3: API result sink — bounded collect of per-file results
    * (destination.py:516-557); caller enforces the API batch cap. */
  def collectApiResults(results: DataFrame, maxRows: Int = 1000): Seq[String] =
    results.limit(maxRows).toJSON.collect().toSeq

  /** K4/T5: manual-review queue sink — append result packets (base64
    * file + result JSON, destination.py:853-1115) to a queue directory
    * with an enqueue timestamp; consumers read with a TTL filter. */
  def enqueueReview(results: DataFrame, queueDir: String,
      ttlSeconds: Long = 3600): Unit =
    results
      // epoch seconds, not a timestamp: JSON round-trips timestamps as
      // ISO strings that the consumer would have to re-parse
      .withColumn("enqueued_epoch", unix_timestamp(current_timestamp()))
      .withColumn("ttl_seconds", lit(ttlSeconds))
      .write.mode(SaveMode.Append).json(queueDir)

  /** K4 consume side: only packets still within their TTL. */
  def dequeueReview(spark: SparkSession, queueDir: String): DataFrame =
    spark.read.json(queueDir)
      .filter(unix_timestamp(current_timestamp()) <
        col("enqueued_epoch") + col("ttl_seconds"))
}
