package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float-array
  * columns, computed in double.
  *
  * Why a custom Expression instead of `zip_with` + `aggregate`:
  * higher-order functions are evaluated INTERPRETED (one closure call
  * + one InternalRow per element), which makes them the hot-path cost
  * of brute-force similarity search. This expression participates in
  * whole-stage codegen via [[doGenCode]] — the generated Java is a
  * tight primitive loop, no per-element allocation.
  *
  * Numerics contract: accumulates dot/norms in array order with
  * double arithmetic — bit-identical to the HOF formulation
  * (dot(a,b) / (√dot(a,a)·√dot(b,b))) and to the DuckDB oracle's
  * list_zip/list_aggregate SQL, so swapping it into an
  * oracle-checked query changes nothing observable. Degenerate inputs
  * (null elements, mismatched lengths) REFUSE with a clear error where
  * the HOF would return NULL — a loud failure beats a silently
  * truncated similarity (see [[ArrayExprUtil.cosine]]).
  */
case class ArrayCosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_cosine_sim needs two array<float> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayExprUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ArrayExprUtil.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayCosineSim {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(
      ArrayCosineSim(GraftShims.expression(a), GraftShims.expression(b)))
}
