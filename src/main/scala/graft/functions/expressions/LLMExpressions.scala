package graft.functions.expressions

import graft.pipeline.LLMClient
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native LLM-completion expression (SURVEY.md §4 custom-physical
  * item 1): evaluates `client.complete(prompt)` per row with one client
  * instance per executor thread, resolved by NAME from a registry (the
  * expression must stay serializable + comparable for optimizer rules —
  * a closure-captured client would defeat both).
  *
  * CodegenFallback is deliberate: the network call dominates by orders
  * of magnitude; what matters is that the expression node is visible to
  * optimizer rules (→ SinglePassFusion) and the client is pooled.
  */
case class LLMComplete(child: Expression, clientName: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "llm_complete"

  @transient private lazy val client: LLMClient =
    LLMClientRegistry.resolve(clientName)

  override def nullSafeEval(prompt: Any): Any =
    UTF8String.fromString(client.complete(prompt.toString))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Executor-side client registry: expressions carry only the client
  * NAME; each JVM instantiates the factory once (connection pooling). */
object LLMClientRegistry {
  private val factories = scala.collection.concurrent.TrieMap[String, () => LLMClient]()
  private val instances = scala.collection.concurrent.TrieMap[String, LLMClient]()

  def register(name: String, factory: () => LLMClient): Unit = {
    factories.put(name, factory)
    instances.remove(name)
  }
  def resolve(name: String): LLMClient =
    instances.getOrElseUpdate(name,
      factories.getOrElse(name,
        throw new IllegalStateException(s"no LLM client registered as '$name'"))())
}
