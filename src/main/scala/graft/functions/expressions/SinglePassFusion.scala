package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Alias, ConcatWs, Expression, GetJsonObject, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Single-pass fusion (SURVEY.md §4: legacy_executor.py:2270-2310 as a
  * Catalyst rewrite): N sibling `LLMComplete` calls in one Project that
  * share the SAME context and client are fused into ONE combined
  * completion returning JSON, and each original call becomes a
  * `get_json_object` field access — N network round-trips per row
  * become 1.
  *
  * Shape: the fused call lands in an inner Project (evaluated once per
  * row by construction — no reliance on subexpression elimination);
  * the outer Project keeps the original typed-conversion wrappers,
  * now over JSON field extractions.
  *
  * Clients opt in via the SINGLE_PASS_JSON prompt protocol (MockLLM
  * implements it; a production adapter returns a JSON object keyed
  * q0..qN — exactly the reference's combined-prompt contract).
  */
object SinglePassFusion extends Rule[LogicalPlan] {

  private case class Occurrence(node: LLMComplete, question: String, ctx: Expression, client: String)

  /** Match prompts assembled by LLM.assemblePrompt:
    * concat_ws('\n', preamble, question, postamble, 'Context:', ctx, 'Answer:'). */
  private def parse(l: LLMComplete): Option[Occurrence] = l.child match {
    case ConcatWs(Seq(
        Literal(sep, StringType), Literal(_, StringType), Literal(q, StringType),
        Literal(_, StringType), Literal(c, StringType), ctx, Literal(a, StringType)))
        if sep != null && sep.toString == "\n" &&
          c != null && c.toString == "Context:" &&
          a != null && a.toString == "Answer:" &&
          q != null && !q.toString.startsWith("SINGLE_PASS_JSON") =>
      Some(Occurrence(l, q.toString, ctx, l.clientName))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project =>
      val seen = scala.collection.mutable.LinkedHashSet[LLMComplete]()
      p.projectList.foreach(_.foreach {
        case l: LLMComplete => seen += l
        case _ =>
      })
      val occs = seen.toSeq.flatMap(parse)
      val groups = occs
        .groupBy(o => (o.ctx.canonicalized, o.client))
        .filter(_._2.size >= 2)
      if (groups.isEmpty) p
      else {
        var inner: LogicalPlan = p.child
        val replacements = scala.collection.mutable.ArrayBuffer[(LLMComplete, Expression)]()
        groups.toSeq.sortBy(_._2.head.question).foreach { case (_, gOccs) =>
          val combined = "SINGLE_PASS_JSON\n" +
            gOccs.zipWithIndex.map { case (o, i) => s"q$i: ${o.question}" }.mkString("\n")
          val fusedPrompt = ConcatWs(Seq(
            Literal("\n"), Literal(combined), Literal("Context:"),
            gOccs.head.ctx, Literal("Answer:")))
          val alias = Alias(LLMComplete(fusedPrompt, gOccs.head.client), "__fused_llm")()
          inner = Project(inner.output :+ alias, inner)
          gOccs.zipWithIndex.foreach { case (o, i) =>
            replacements += o.node -> GetJsonObject(alias.toAttribute, Literal(s"$$.q$i"))
          }
        }
        val newList = p.projectList.map { ne =>
          ne.transform {
            case l: LLMComplete =>
              replacements.find(_._1 == l).map(_._2).getOrElse(l)
          }.asInstanceOf[NamedExpression]
        }
        Project(newList, inner)
      }
  }
}
