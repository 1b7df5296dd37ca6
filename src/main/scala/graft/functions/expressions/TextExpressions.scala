package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native longest-common-prefix over two ARRAY<STRING> suffix slices —
  * the q164/q168 LCP hot loop as a codegen'd early-exit scan.
  *
  * Replaces the higher-order formulation
  * `array_position(zip_with(a, b, (x, y) -> coalesce(x = y, false)), false)`
  * with IDENTICAL semantics (first mismatch index; a null element on
  * either side is a mismatch; one slice prefixing the other gives
  * min(len)) but none of its costs: zip_with materializes a boolean
  * array and compares ALL min(len) element pairs per row, while
  * adjacent suffixes in SA order overwhelmingly diverge within the
  * first few tokens — the early exit turns ~LcpBound UTF8 compares
  * per row into ~E[lcp]+1 (profiled 61 s → see SCALE.md Round 14 for
  * the measured cut on the 27.5M-row x100 frame). */
case class PrefixLcp(left: Expression, right: Expression) extends BinaryExpression {
  // inputs are engine-produced ARRAY<STRING> slices; no
  // ExpectsInputTypes — AbstractDataType is private[sql]
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var go = true
    while (go && i < n) {
      if (a.isNullAt(i) || b.isNullAt(i) ||
          !a.getUTF8String(i).equals(b.getUTF8String(i))) go = false
      else i += 1
    }
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |while ($i < $n) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) break;
         |  if (!$a.getUTF8String($i).equals($b.getUTF8String($i))) break;
         |  $i++;
         |}
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "prefix_lcp"
}

object TextExpressions {
  /** Idempotent SQL registration (the VectorExpressions convention). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("prefix_lcp")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("prefix_lcp",
        es => PrefixLcp(es.head, es(1)), "scala_udf")
  }
}
