package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P6 variable replacement (variable_replacement.py:29-130;
  * answer_prompt.py:81-105): `{{static}}` values from the run config,
  * `{{custom_data.x}}` from a per-row struct column, `%var%` legacy form.
  * `{{url:…}}` dynamic HTTP substitution is intentionally a pluggable
  * driver-side step (non-deterministic; documented side effect) — not a
  * Column function.
  */
object Templates {

  private val VarRe = raw"\{\{([A-Za-z0-9_.]+)\}\}".r

  /** Pure-Scala template render (plan-time: prompts are config). */
  def renderStatic(template: String, vars: Map[String, String]): String =
    VarRe.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))

  /** Column-level render: each `{{custom_data.x}}` placeholder pulls
    * field x from `customData` (a struct column) per row; `{{k}}`
    * placeholders resolve from the static map first. Built as chained
    * replace()/concat — stays in codegen. */
  def renderColumn(template: String, vars: Map[String, String],
      customData: Option[Column] = None): Column = {
    val static = renderStatic(template, vars)
    val parts = static.split(VarRe.regex, -1)
    val holes = VarRe.findAllMatchIn(static).map(_.group(1)).toSeq
    if (holes.isEmpty) return lit(static)
    val pieces = Seq.newBuilder[Column]
    parts.zipWithIndex.foreach { case (p, i) =>
      pieces += lit(p)
      if (i < holes.length) {
        val h = holes(i)
        val v = if (h.startsWith("custom_data.") && customData.nonEmpty)
          customData.get.getField(h.stripPrefix("custom_data.")).cast("string")
        else lit("{{" + h + "}}")
        pieces += coalesce(v, lit(""))
      }
    }
    concat(pieces.result(): _*)
  }

  /** Legacy %var% form (variable_replacement.py:120-130). */
  def renderLegacy(template: String, vars: Map[String, String]): String =
    vars.foldLeft(template) { case (acc, (k, v)) => acc.replace(s"%$k%", v) }
}
