package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression —
  * Spark ships no normalizer builtin, and the CCNet-style dedup
  * normalization (q113) needs one INSIDE whole-stage codegen so the
  * normalize→lower→fold→hash chain stays a single generated loop over
  * the scan (a Scala UDF here would break the codegen span and pay
  * serialization per row). Delegates to `java.text.Normalizer`
  * (ICU-equivalent for NFC), matching DuckDB's `nfc_normalize` so the
  * oracle compares the same canonical form. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "nfc_norm"
}

object TextExpressions {
  /** Register as a SQL function (the VectorExpressions convention —
    * Column access via `expr("nfc_norm(col)")`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_norm")
    if (!reg.functionExists(ident))
      reg.createOrReplaceTempFunction("nfc_norm", es => NfcNormalize(es.head), "scala_udf")
  }
}
