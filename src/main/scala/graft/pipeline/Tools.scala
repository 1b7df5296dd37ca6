package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D24 tool surface: the reference's container tools
  * (properties.json/spec.json + BaseTool.run, 1 file at a time) become
  * registered whole-DataFrame transforms — per-row logic stays in Column
  * expressions; genuinely imperative tools use mapPartitions inside
  * their apply.
  */
trait DocTool extends Serializable {
  def name: String
  /** JSON-ish settings (the reference's tool settings dict). */
  def apply(df: DataFrame, settings: Map[String, String]): DataFrame
}

/** D22 classifier tool: bin by dominant keyword, 'unknown' fallback
  * (tools/classifier/src/main.py:22-162); routing = partitionBy at sink. */
object ClassifierTool extends DocTool {
  val name = "classifier"
  def apply(df: DataFrame, settings: Map[String, String]): DataFrame = {
    val bins = settings.getOrElse("bins", "joins,aggs,scans").split(",").toSeq
    val keywords = settings.getOrElse("keywords", "join,agg,scan").split(",").toSeq
    val counts = keywords.map(k =>
      (length(col("text")) - length(call_function("replace", col("text"), lit(k)))) / k.length)
    val noHit = counts.map(_ === 0).reduce(_ && _)
    // compare counts positionally, not by Column identity — duplicate
    // keywords produce structurally-equal Columns that an identity filter
    // would silently drop from the comparison set
    val best = bins.zip(counts).zipWithIndex.foldRight(lit("unknown")) {
      case (((bin, cnt), i), els) =>
        val geAllOthers = counts.zipWithIndex
          .collect { case (other, j) if j != i => cnt >= other }
          .foldLeft(lit(true))(_ && _)
        when(!noHit && geAllOthers, lit(bin)).otherwise(els)
    }
    df.withColumn("classification", best)
  }
}

/** Extraction result row: text + page/highlight metadata (SURVEY D1 —
  * the reference returns highlight_data alongside extracted text). */
final case class ExtractedText(
    text: String, n_pages: Int,
    pages: Seq[graft.tools.Pdf.PdfPage],
    highlights: Seq[graft.tools.Pdf.PdfLine],
    error_message: String = null)

/** D1/D23 text-extractor tool: binary content → text + page metadata.
  * Adapter dispatch mirrors the reference's x2text tier
  * (sdk1/adapters/x2text/): "auto"/"pdf" parse PDF binaries via
  * graft.tools.Pdf (FlateDecode + content-stream tokenizer); "no_op"
  * passes bytes through unchanged (the reference's no_op adapter). */
object TextExtractorTool extends DocTool {
  val name = "text_extractor"
  def apply(df: DataFrame, settings: Map[String, String]): DataFrame =
    settings.getOrElse("adapter", "auto") match {
      case "no_op" =>
        df.withColumn("text", col("content").cast("string"))
      case a if graft.tools.X2Text.get(a).isDefined =>
        // HTTP adapter tier (llm_whisperer_v2 / unstructured / ...):
        // one service call per row, error rows instead of task failures
        val ex = graft.tools.X2Text.extractUdf(graft.tools.X2Text.get(a).get)
        val fname = if (df.columns.contains("file_name")) col("file_name")
          else lit("document")
        df.withColumn("__x", ex(fname, col("content")))
          .withColumn("text", col("__x.text"))
          .withColumn("x2text_meta", col("__x.metadata"))
          .withColumn("error_message", col("__x.error_message"))
          .drop("__x")
      case _ =>
        // a malformed/truncated PDF yields an error ROW, not a failed
        // job: at 100 TB one corrupt file must not abort the batch (the
        // reference's x2text path likewise surfaces per-file errors)
        val ex = udf { (content: Array[Byte]) =>
          if (graft.tools.Pdf.isPdf(content)) {
            scala.util.Try(graft.tools.Pdf.extract(content)) match {
              case scala.util.Success(d) =>
                ExtractedText(d.text, d.nPages, d.pages, d.lines)
              case scala.util.Failure(e) =>
                ExtractedText(null, 0, Nil, Nil,
                  s"extract_failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          } else {
            val t = if (content == null) null
              else new String(content, java.nio.charset.StandardCharsets.UTF_8)
            ExtractedText(t, 1,
              Seq(graft.tools.Pdf.PdfPage(1, 1, Option(t).map(_.length).getOrElse(0))),
              Nil)
          }
        }
        df.withColumn("__x", ex(col("content")))
          .withColumn("text", col("__x.text"))
          .withColumn("n_pages", col("__x.n_pages"))
          .withColumn("page_meta", col("__x.pages"))
          .withColumn("highlights", col("__x.highlights"))
          .withColumn("error_message", col("__x.error_message"))
          .drop("__x")
    }
}

/** D15 table extractor (directory mode): extract a multi-row keyword
  * table from EVERY document of a scanned directory frame and merge
  * them into ONE table with file provenance and per-directory row ids —
  * the reference delegates this to the table_executor plugin
  * (legacy_executor.py:2002-2074). A file with no text yields an error
  * row, not a failed batch (the plugin's per-prompt failure isolation).
  * The row-id window partitions on the directory column, so numbering
  * stays distributed — no global window. */
object TableExtractorTool extends DocTool {
  val name = "table_extractor"
  def apply(df: DataFrame, settings: Map[String, String]): DataFrame = {
    val words = settings.getOrElse("columns", "join,agg,scan").split(",").toSeq
    val dirCol = settings.getOrElse("dir_column", "source")
    val idCol = settings.getOrElse("id_column", "file_name")
    def cnt(w: String) =
      ((length(col("text")) - length(call_function("replace", col("text"), lit(w)))) / w.length).cast("long")
    val stackExpr = words.sorted.map(w => s"'$w', __c_${w}").mkString(", ")
    val counted = df.select(
      Seq(col(dirCol), col(idCol)) ++ words.map(w => cnt(w).as(s"__c_$w")): _*)
    val rows = counted
      .select(col(dirCol), col(idCol),
        expr(s"stack(${words.size}, $stackExpr) as (word, cnt)"))
      .withColumn("error_message",
        when(col("cnt").isNull, "table_extract_failed: no text").otherwise(lit(null)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dirCol)).orderBy(col(idCol), col("word"))
    rows.withColumn("table_row", row_number().over(w))
  }
}

/** D20 lookup-enrichment tool: enrich a field against a broadcast
  * reference corpus; blank inputs skip (lookup_enrichment.py:20-174). */
object LookupEnrichmentTool extends DocTool {
  val name = "lookup_enrichment"
  def apply(df: DataFrame, settings: Map[String, String]): DataFrame = {
    val field = settings.getOrElse("field", "lang")
    val refPairs = settings.getOrElse("reference",
      "en=English,de=German,es=Spanish,fr=French,zh=Chinese")
      .split(",").map { kv => val Array(k, v) = kv.split("="); (k, v) }.toSeq
    val ref = df.sparkSession.createDataFrame(refPairs)
      .toDF(field, s"${field}_enriched")
    df.join(broadcast(ref), Seq(field), "left_outer")
      .withColumn(s"${field}_enriched",
        when(length(trim(col(field))) === 0, lit(null))
          .otherwise(col(s"${field}_enriched")))
  }
}

/** Registry: name → tool (tool_registry.py:134-310). */
object ToolRegistry {
  private val tools = scala.collection.concurrent.TrieMap[String, DocTool](
    ClassifierTool.name -> ClassifierTool,
    TextExtractorTool.name -> TextExtractorTool,
    TableExtractorTool.name -> TableExtractorTool,
    LookupEnrichmentTool.name -> LookupEnrichmentTool)

  def register(tool: DocTool): Unit = tools.put(tool.name, tool)
  def get(name: String): Option[DocTool] = tools.get(name)
  def list: Seq[String] = tools.keys.toSeq.sorted
}
