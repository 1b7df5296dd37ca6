package graft.sources

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-stage file scanning (SURVEY.md S1-S7, P1-P2, P10, W1-W2, F1-F2).
  *
  * Reference behavior: fsspec listing with glob/extension filters, depth
  * cap 10, 100-file default limit, FIFO/LIFO mtime ordering with a 40k
  * sort cap, chunked sha256 + libmagic MIME sniff during materialization
  * (endpoint_v2/source.py:292-510, 769-804, 938-1031;
  * constants.py:60,151-198).
  *
  * Spark-first: `binaryFile` gives (path, modificationTime, length,
  * content) with Catalyst-pushable path filters; hashing and MIME
  * sniffing are codegen'd expressions over the content column, not
  * driver-side loops. At 100 TB the listing itself is distributed by the
  * InMemoryFileIndex and content never reaches the driver.
  */
object FileScan {

  /** Scan order over the listing (reference FIFO = oldest mtime first). */
  sealed trait ScanOrder
  case object Fifo extends ScanOrder
  case object Lifo extends ScanOrder

  final case class ScanConfig(
      root: String,
      glob: String = "*",
      recursive: Boolean = true,
      maxDepth: Int = 10,
      order: ScanOrder = Fifo,
      maxFiles: Int = 100,
      allowedMime: Seq[String] = Nil)

  /** Magic-byte MIME sniff (F2) as a pure Column expression. */
  def sniffMime(content: Column, fileName: Column): Column = {
    val magic = upper(hex(substring(content, 1, 4)))
    when(magic.startsWith("25504446"), "application/pdf")            // %PDF
      .when(magic.startsWith("89504E47"), "image/png")
      .when(magic.startsWith("FFD8FF"), "image/jpeg")
      .when(magic.startsWith("504B0304"), "application/zip")          // also docx/xlsx
      .when(magic.startsWith("47494638"), "image/gif")
      .when(lower(fileName).endsWith(".json"), "application/json")
      .when(lower(fileName).endsWith(".csv"), "text/csv")
      .otherwise("text/plain")
  }

  /** Depth of a file below the scan root (root-level file = 1). */
  private def depthBelow(root: String): Column = {
    val rootDepth = size(split(lit(root.stripSuffix("/")), "/"))
    size(split(regexp_replace(col("file_path"), "^file:", ""), "/")) - rootDepth
  }

  /** S1-S6: list + filter + order + limit, producing the engine's
    * FileRow frame: file_path, file_name, file_size, mtime, content,
    * file_hash (sha256), mime_type, file_number. */
  def scan(spark: SparkSession, cfg: ScanConfig): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("recursiveFileLookup", cfg.recursive.toString)
      .load(cfg.root)
      .select(
        col("path").as("file_path"),
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("file_size"),
        col("modificationTime").as("mtime"),
        col("content"))

    val depthOk = if (cfg.recursive) depthBelow(cfg.root) <= cfg.maxDepth else lit(true)
    val globOk = TextFunctions.globMatch(col("file_name"), cfg.glob)

    val filtered = raw
      .filter(depthOk && globOk && col("file_size") > 0)       // P1 dir/empty guard
      .dropDuplicates("file_path")                             // P2 in-listing dedup
      .withColumn("file_hash", sha2(col("content"), 256))      // F1
      .withColumn("mime_type", sniffMime(col("content"), col("file_name")))

    val mimeOk = if (cfg.allowedMime.isEmpty) filtered
      else filtered.filter(col("mime_type").isin(cfg.allowedMime: _*)) // P10

    // W1/W2: mtime order (path tiebreak), cap, 1-based file_number.
    // The reference caps sortable listings at 40k files; at scale the
    // order-by-limit compiles to TakeOrdered (no full sort materialized)
    // and the sequence numbering stays distributed (no global window).
    val order = cfg.order match {
      case Fifo => Seq(col("mtime").asc, col("file_path"))
      case Lifo => Seq(col("mtime").desc, col("file_path"))
    }
    val limited = mimeOk.orderBy(order: _*).limit(cfg.maxFiles)
    graft.operators.Ranks.sequenceNumber(limited, order, "file_number")
  }

  /** P3/J1: FileHistory dedup — drop files whose (file_hash, file_path)
    * has a COMPLETED history row (source.py:806-868). */
  def dedupAgainstHistory(files: DataFrame, history: DataFrame): DataFrame = {
    val done = history.filter(col("status") === "COMPLETED")
      .select(col("cache_key"), col("file_path").as("h_path"))
    files.join(done,
      files("file_hash") === done("cache_key") && files("file_path") === done("h_path"),
      "left_anti")
  }

  /** P4/J2: drop files with an in-flight (PENDING/EXECUTING) execution. */
  def dedupInFlight(files: DataFrame, active: DataFrame): DataFrame =
    files.join(
      active.filter(col("status").isin("PENDING", "EXECUTING"))
        .select(col("cache_key")),
      files("file_hash") === col("cache_key"), "left_anti")

  /** J3: reuse cached results — left join COMPLETED history, rows with a
    * cached result carry it (callers skip recompute via the flag). */
  def reuseCachedResults(files: DataFrame, history: DataFrame): DataFrame = {
    val done = history.filter(col("status") === "COMPLETED")
      .select(col("cache_key"), col("result").as("cached_result"))
    files.join(done, files("file_hash") === done("cache_key"), "left_outer")
      .withColumn("from_cache", col("cached_result").isNotNull)
      .drop("cache_key")
  }
}
