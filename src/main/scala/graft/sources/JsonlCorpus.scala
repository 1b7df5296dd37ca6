package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus interchange: read/write the one-JSON-object-per-line
  * files that LLM corpora actually ship as (The Pile, RedPajama, Dolma
  * all distribute `.jsonl`/`.jsonl.gz`/`.jsonl.zst`). The read side is
  * schema-ENFORCED with a quarantine: a malformed line never kills the
  * job (a multi-TB crawl dump always has some) and never silently
  * disappears either — it lands in a corrupt-line frame the caller
  * can count, sample, and alert on (the PERMISSIVE + corrupt-column
  * discipline).
  *
  * Scale notes: JSON parsing is Jackson inside codegen — one narrow
  * pass; schema enforcement prunes to the declared fields at parse
  * time (no schema inference scan — inference on 100 TB is a full
  * extra read). Compression: gzip files are UNSPLITTABLE — one task
  * per file, so .jsonl.gz corpora must arrive as many files (they do);
  * prefer zstd/none for re-exports that a cluster will re-read.
  */
object JsonlCorpus {

  private val CorruptCol = "_corrupt_record"

  /** Both legs of a schema-enforced JSONL read plus the storage
    * handle: `release()` unpersists the shared parsed frame once the
    * caller has materialized (written/collected) what it needs —
    * without it, repeated reads over many corpus files would pin
    * blocks in executor storage memory for the session's lifetime. */
  final case class JsonlRead(good: DataFrame, quarantine: DataFrame,
      release: () => Unit)

  /** Read a JSONL path against an explicit schema. Lines that fail to
    * parse or violate the schema types land raw in the quarantine
    * frame.
    *
    * The one-pass materialization: Spark refuses a filter that
    * references ONLY the corrupt column of a lazily-parsed JSON scan
    * (the parser would have dropped it), so the split goes through one
    * cached frame — both legs share a single parse of the input. Call
    * `release()` when done with both legs. */
  def read(spark: SparkSession, path: String, schema: StructType): JsonlRead = {
    val full = schema.add(CorruptCol, StringType)
    val parsed = spark.read.schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(CorruptCol).isNull)
      .drop(CorruptCol)
    val quarantine = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlRead(good, quarantine, () => { parsed.unpersist(); () })
  }

  /** Write a corpus frame as JSONL. `compression`: "none", "gzip",
    * "bzip2", "deflate", "zstd" (zstd/none re-read splittably). */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
