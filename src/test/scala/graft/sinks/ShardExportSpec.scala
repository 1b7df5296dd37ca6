package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The training-shard export sink: deterministic sharding, manifest
  * integrity, audit detection of tampered shards. */
class ShardExportSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def docs = graft.Tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("source"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-shards").toString

  test("export shards by doc_id range; manifest counts cover every doc") {
    val out = tmp()
    val manifest = ShardExport.export(docs, out, docsPerShard = 100L).collect()
    // 500 dense doc_ids at 100/shard → exactly 5 equal shards
    assert(manifest.length === 5)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(manifest.forall(_.getAs[Long]("n_docs") === 100L))
    // shard dirs on disk match the manifest
    val dirs = new java.io.File(s"$out/shards").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq === manifest.map(r => s"shard=${r.getAs[Long]("shard")}").sorted.toSeq)
    // token accounting is the same nTokens the packing stage uses
    val total = manifest.map(_.getAs[Long]("n_tokens")).sum
    val expect = docs.select(sum(graft.operators.CorpusOps.nTokens(col("text"))))
      .collect().head.getLong(0)
    assert(total === expect)
  }

  test("re-export is bit-stable: same shards, same content digests") {
    val (a, b) = (tmp(), tmp())
    val m1 = ShardExport.export(docs, a, 100L).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[String]("content_sha")))
    val m2 = ShardExport.export(docs, b, 100L).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[String]("content_sha")))
    assert(m1.toSeq === m2.toSeq)
  }

  test("audit passes a clean export and flags a tampered shard") {
    val out = tmp()
    ShardExport.export(docs, out, 100L)
    val clean = ShardExport.audit(spark, out).collect()
    assert(clean.length === 5 && clean.forall(_.getAs[Boolean]("ok")))
    // tamper: rewrite shard 2 with one doc missing (materialize the
    // rows FIRST — a lazy read would see its own overwrite mid-write)
    val shard2 = spark.read.parquet(s"$out/shards/shard=2").collect()
    val minDoc = shard2.map(_.getAs[Long]("doc_id")).min
    val schema = spark.read.parquet(s"$out/shards/shard=2").schema
    val tampered = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        shard2.filter(_.getAs[Long]("doc_id") != minDoc): _*)), schema)
    tampered.write.mode("overwrite").parquet(s"$out/shards/shard=2")
    val report = ShardExport.audit(spark, out).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Boolean]("ok")).toMap
    assert(!report(2L), "missing doc must break shard 2's digest")
    assert(Seq(0L, 1L, 3L, 4L).forall(report(_)), "other shards stay green")
  }

  test("curation survivors export end-to-end: manifest agrees with the curated corpus") {
    val out = tmp()
    import spark.implicits._
    val seen = Seq.empty[String].toDF("file_hash")
    val survivors = graft.pipeline.Curation.curateBatch(
      graft.Tables.load(spark, dir, "documents"),
      graft.pipeline.Curation.StreamCurationConfig(), seen)
      .select(col("doc_id"), col("text"), col("source"))
    val manifest = ShardExport.export(survivors, out, 64L).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === survivors.count())
    assert(ShardExport.audit(spark, out).collect().forall(_.getAs[Boolean]("ok")))
  }
}
