package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the last hop of the corpus pipeline — write
  * a curated, packed corpus as fixed-size shards a training job can
  * stream, plus a MANIFEST the loader (and any resume/audit pass)
  * trusts instead of re-listing the data. This is the WebDataset /
  * Megatron "data shards + index" convention: shard files of bounded
  * size, a manifest row per shard with counts and a content checksum.
  *
  * Layout under `outDir`:
  *   - `shards/shard=<k>/…parquet` — shards assigned by doc_id RANGE
  *     (`(doc_id - min) div span`), so membership is a deterministic
  *     function of the id alone (re-export ⇒ identical shards ⇒
  *     identical checksums, the resumability property) and assignment
  *     is a NARROW map — no global sort or rank over the corpus.
  *     Shards are equal-sized when doc_ids are dense (a packed corpus
  *     numbers them as a sequence); sparse ids give proportionally
  *     thinner shards, never bigger ones.
  *   - `manifest/…parquet` — (shard, n_docs, n_tokens, content_sha)
  *     where content_sha = sha256 of the shard's sorted doc hashes —
  *     an ORDER-INDEPENDENT digest any engine can recompute; the sort
  *     and digest are per-shard (≤ docsPerShard items in memory).
  *
  * Scale: assignment = one tiny (min, count) aggregate broadcast into
  * a codegen'd projection; the manifest is one aggregate keyed on the
  * shard id. Writing is `partitionBy(shard)` so a training loader
  * lists exactly the shard directories it was assigned — the IVF
  * `partitionBy(cell)` pruning argument applied to the data-loading
  * side of training.
  */
object ShardExport {

  /** Export `docs` (doc_id, text, + any passthrough columns) as
    * `docsPerShard`-sized shards. Returns the manifest DataFrame
    * (also persisted under `outDir/manifest`). */
  def export(docs: DataFrame, outDir: String, docsPerShard: Long = 1000L): DataFrame = {
    val spark = docs.sparkSession
    // deterministic shard id from the doc_id RANGE: shard membership
    // depends only on (min_id, n, the doc's own id) — never on a rank
    // over other rows — so it is stable under re-export and costs one
    // narrow projection (cf. monotonically_increasing_id, which is
    // partition-layout-dependent and would re-shard on every run)
    val bounds = docs.agg(min(col("doc_id")).as("min_id"),
      count(lit(1)).as("n")).collect().head
    val n = bounds.getLong(1)
    val minId = if (n == 0) 0L else bounds.getLong(0)
    val nShards = math.max(1L, (n + docsPerShard - 1) / docsPerShard)
    val maxId =
      if (n == 0) 0L
      else docs.agg(max(col("doc_id"))).collect().head.getLong(0)
    val span = math.max(1L, (maxId - minId + nShards) / nShards)
    val sharded = docs
      .withColumn("shard", expr(s"(doc_id - $minId) div $span"))
    sharded.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")

    // manifest from what was WRITTEN (not the input plan): re-read so
    // the digest covers the bytes a loader will actually see
    val written = spark.read.parquet(s"$outDir/shards")
    val manifest = written
      .select(col("shard"), col("doc_id"),
        sha2(col("text"), 256).as("h"),
        graft.operators.CorpusOps.nTokens(col("text")).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sha2(concat_ws("", array_sort(collect_list(col("h")))), 256)
          .as("content_sha"))
      .orderBy(col("shard"))
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** Audit an export against its manifest: recompute every shard's
    * digest from the data and compare. Returns the per-shard report
    * (shard, ok, n_docs_manifest, n_docs_actual). A loader calls this
    * before training; a resumed export calls it to find the first bad
    * shard instead of rewriting everything. */
  def audit(spark: SparkSession, outDir: String): DataFrame = {
    val manifest = spark.read.parquet(s"$outDir/manifest")
      .select(col("shard"), col("n_docs").as("n_docs_manifest"),
        col("content_sha").as("sha_manifest"))
    val actual = spark.read.parquet(s"$outDir/shards")
      .select(col("shard"), sha2(col("text"), 256).as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs_actual"),
        sha2(concat_ws("", array_sort(collect_list(col("h")))), 256)
          .as("sha_actual"))
    manifest.join(actual, Seq("shard"), "full_outer")
      .select(col("shard"),
        (col("sha_manifest") === col("sha_actual") &&
          col("n_docs_manifest") === col("n_docs_actual")).as("ok"),
        col("n_docs_manifest"), col("n_docs_actual"))
      .withColumn("ok", coalesce(col("ok"), lit(false)))
      .orderBy(col("shard"))
  }
}
