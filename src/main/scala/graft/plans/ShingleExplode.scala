package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The UDTF (Generator) surface of the engine: streaming word-shingle
  * explosion. `explode(word_shingles(text, n))` materializes the whole
  * shingle array per document before exploding; this generator emits
  * one row at a time with O(1) extra memory per document — the shape
  * that matters when a 100k-token document would otherwise allocate a
  * 100k-element array per row inside the scan pipeline.
  *
  * Emission contract matches [[ShingleUtil.shingles]] with
  * `distinct = false` (same tokenization, same `< n` fallback), so
  * `shingle_explode(text, n)` ≡ `explode(word_shingles(text, n, false))`
  * row-for-row — asserted in `PlansSpec`.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_explode needs (string, n>=1), got ${child.dataType.sql}, n=$n")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = ShingleUtil.tokenize(v.asInstanceOf[UTF8String])
      if (toks.length < n)
        Iterator.single(InternalRow(UTF8String.fromString(toks.mkString(" "))))
      else new Iterator[InternalRow] {
        private[this] val m = toks.length - n + 1
        private[this] val sb = new java.lang.StringBuilder
        private[this] var i = 0
        override def hasNext: Boolean = i < m
        override def next(): InternalRow = {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          i += 1
          InternalRow(UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExplode {
  def apply(c: Column, n: Int): Column =
    GraftShims.column(ShingleExplode(GraftShims.expression(c), n))
}
