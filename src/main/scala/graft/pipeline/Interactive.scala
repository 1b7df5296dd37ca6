package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}

/** Prompt Studio IDE path (SURVEY.md §3.3): interactive single-document,
  * single/all-prompt evaluation with no cluster round-trip.
  *
  * The trick is Catalyst itself: a 1-row LocalRelation + deterministic
  * expressions constant-fold during OPTIMIZATION — `collect()` on the
  * resulting plan launches zero Spark jobs; the extraction expressions
  * (including LLM calls) evaluate eagerly on the driver. Same expression
  * tree as the batch path, millisecond latency.
  */
object Interactive {

  final case class FieldResult(name: String, value: Any, ftype: String)

  /** Evaluate all specs against one document text. Runs on the driver —
    * verify with `jobCount` that no job was launched. */
  def evalSingle(spark: SparkSession, text: String, specs: Seq[PromptSpec],
      client: () => LLMClient): Seq[FieldResult] = {
    import spark.implicits._
    val df = Seq(Tuple1(text)).toDF("text") // LocalRelation: folds at plan time
    val out = Extraction.extract(df, "text", specs, client)
    val row: Row = out.select(specs.map(s => org.apache.spark.sql.functions.col(s.name)): _*)
      .collect().head
    specs.zipWithIndex.map { case (s, i) => FieldResult(s.name, row.get(i), s.ftype) }
  }
}
