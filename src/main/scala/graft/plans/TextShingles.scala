package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hot loop shared by interpreted eval and generated code. */
object ShingleUtil {

  /** Word n-gram shingles of `s` (space-joined), optionally distinct.
    *
    * Contract (must stay bit-identical to the HOF formulation
    * [[graft.functions.TextFns.shinglesHof]] and the DuckDB oracle
    * CTE): tokens = split(trim(s), "\\s+") with Java regex semantics
    * (trim strips spaces only; a leading non-space whitespace yields a
    * leading empty token); if fewer than n tokens the single shingle
    * is all tokens joined; otherwise one shingle per window of n
    * consecutive tokens. `distinct` keeps first occurrences in order
    * (array_distinct semantics).
    */
  /** The one tokenizer shared by every shingle surface (array
    * expression, generator, subword count): trim + precompiled \s+
    * split. Single definition = the `shingle_explode(text,n) ==
    * explode(word_shingles(text,n))` equivalence cannot drift. */
  def tokenize(s: UTF8String): Array[String] =
    ArrayExprUtil.WS.split(s.trim().toString, -1)

  def shingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokenize(s)
    val out: Array[Any] =
      if (toks.length < n) {
        Array(UTF8String.fromString(toks.mkString(" ")))
      } else {
        val m = toks.length - n + 1
        val sb = new java.lang.StringBuilder
        if (distinct) {
          val seen = new java.util.LinkedHashSet[String](m * 2)
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j)); j += 1
            }
            seen.add(sb.toString)
            i += 1
          }
          val a = new Array[Any](seen.size)
          val it = seen.iterator()
          var k = 0
          while (it.hasNext) { a(k) = UTF8String.fromString(it.next()); k += 1 }
          a
        } else {
          val a = new Array[Any](m)
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j)); j += 1
            }
            a(i) = UTF8String.fromString(sb.toString)
            i += 1
          }
          a
        }
      }
    new GenericArrayData(out)
  }
}

/** Native codegen'd word-shingle extraction. Replaces a
  * split+transform(sequence)+slice+concat_ws HOF chain (interpreted,
  * one closure call and row allocation per shingle) with one static
  * call per row — the hot path of every shingle-based dedup operator.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs (string, n>=1), got ${child.dataType.sql}, n=$n")

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleUtil.shingles($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, n: Int, distinct: Boolean = false): Column =
    GraftShims.column(WordShingles(GraftShims.expression(c), n, distinct))
}
