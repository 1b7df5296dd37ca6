package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P6 variable replacement (variable_replacement.py:29-130;
  * answer_prompt.py:81-105): `{{static}}` values from the run config,
  * `{{custom_data.x}}` from a per-row struct column, `%var%` legacy
  * form, and `{{<url> [var]}}` dynamic variables — the referenced
  * prompt output is POSTed to the URL and the response substituted
  * (variable_replacement.py:88-113,165-183). The transport is injected
  * (tests use a canned one) and every URL passes the same SSRF guard as
  * the webhook sink.
  */
object Templates {

  private val VarRe = raw"\{\{([A-Za-z0-9_.]+)\}\}".r
  // dynamic-variable detection, mirroring DYNAMIC_VARIABLE_URL_REGEX /
  // DYNAMIC_VARIABLE_DATA_REGEX (constants.py:174-178) without the
  // full TLD heuristics — scheme-prefixed URLs only
  private val AnyVarRe = raw"\{\{(.+?)\}\}".r
  private val UrlRe = raw"(?i)\bhttps?://[^\s\[\]{}]+".r
  private val DataRe = raw"\[(.*?)\]".r

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

  /** Dynamic `{{<url> [var]}}` replacement: POST the named prompt output
    * to the URL, substitute the response. An unexecuted/absent data
    * variable leaves the placeholder untouched (the reference's
    * run-status check); a URL failing the SSRF guard throws — dynamic
    * variables must never become a proxy into link-local/metadata
    * endpoints. `fetch(url, payload)` is the injected transport. */
  def replaceDynamic(prompt: String, structuredOutput: Map[String, String],
      fetch: (String, String) => String): String = {
    val vars = AnyVarRe.findAllMatchIn(prompt).map(_.group(1)).toSeq
    vars.foldLeft(prompt) { (acc, v) =>
      UrlRe.findFirstIn(v) match {
        case Some(url) =>
          if (!Postprocess.urlAllowed(url))
            throw new SecurityException(s"dynamic variable url rejected: $url")
          DataRe.findFirstMatchIn(v).map(_.group(1))
            .flatMap(structuredOutput.get) match {
            case Some(value) => acc.replace("{{" + v + "}}", fetch(url, value))
            case None => acc // referenced prompt not executed yet
          }
        case None => acc // static/custom_data form — renderStatic/renderColumn
      }
    }
  }

  /** Per-row dynamic replacement over (prompt, outputs-map) columns.
    * Marked non-deterministic: the value depends on an external service,
    * so Catalyst must not fold, reorder past filters, or re-execute it
    * speculatively. One transport per executor via the injected thunk. */
  def dynamicReplaceUdf(mkFetch: () => (String, String) => String)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (prompt: String, outputs: Map[String, String]) =>
      if (prompt == null) null
      else replaceDynamic(prompt, Option(outputs).getOrElse(Map.empty), mkFetch())
    }.asNondeterministic()
}
