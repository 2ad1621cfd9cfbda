package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hot loop shared by interpreted eval and generated code (a
  * single static call per row keeps codegen tiny while avoiding the
  * interpreted HOF path entirely). */
object TextHash {
  final val Mod = 1000000007L

  /** Position-weighted code-point sum mod 1e9+7 — exactly
    * `aggregate(transform(split(s,''), (ch,i) -> ascii(ch)*((i%31)+1)),
    * 0L, (a,x) -> (a+x) % Mod)`, the fingerprint contract shared with
    * the DuckDB oracle (TextFns.fingerprintSql). */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    var pos = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc + cp.toLong * ((pos % 31L) + 1L)) % Mod
      i += Character.charCount(cp)
      pos += 1L
    }
    acc
  }
}

/** Native codegen'd document fingerprint (see [[TextHash.fingerprint]]
  * for the contract). Replaces a split('')+transform+aggregate HOF
  * chain that allocated one row per CHARACTER. */
case class TextFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"text_fingerprint needs string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFingerprint {
  def apply(c: Column): Column =
    GraftShims.column(TextFingerprint(GraftShims.expression(c)))
}
