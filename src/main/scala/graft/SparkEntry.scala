package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are defined module-by-module (graft.operators.*) and
  * registered here.
  */
object SparkEntry {

  /** Full registry of engine queries (one per SURVEY.md §2 operator). */
  def registry: Seq[QueryDef] =
    operators.Relational.all ++
      operators.SourceOps.all ++
      operators.RetrievalOps.all ++
      operators.ExtractOps.all ++
      operators.TextAnalysis.all ++
      operators.IndexOps.all ++
      operators.DedupOps.all ++
      operators.AnnOps.all ++
      operators.EventsOps.all ++
      operators.LineItemOps.all ++
      operators.ScalarOps.all ++
      operators.Relational2.all ++
      operators.PdfOps.all ++
      operators.MediaOps.all ++
      operators.CorpusOps.all ++
      operators.MixOps.all ++
      operators.LmOps.all ++
      operators.TokenizerOps.all ++
      operators.WordPieceOps.all ++
      operators.UnigramOps.all ++
      operators.SampleOps.all ++
      operators.DiagnosticsOps.all ++
      operators.LayoutOps.all ++
      operators.UrlOps.all ++
      operators.SuffixOps.all ++
      operators.ClassifierOps.all ++
      operators.ClusterOps.all ++
      operators.HtmlOps.all ++
      operators.CollocationOps.all ++
      operators.SpectralOps.all ++
      operators.SelectOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The index-pipeline capstone: chunk → mock-embed → top-k retrieve —
    * the engine's document-pipeline identity in one plan. */
  def entry(spark: SparkSession): DataFrame =
    operators.IndexOps.q58IndexPipeline.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries timed by Bench. */
  def headlines: Seq[QueryDef] = registry.filter(_.headline)
}
