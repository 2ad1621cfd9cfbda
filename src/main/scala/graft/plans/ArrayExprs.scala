package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hot loops for the native array expressions below — one
  * static call per row from generated code, no per-element closures.
  * Each function's numerics contract is "bit-identical to the HOF
  * formulation it replaces" (sequential left folds in array order), so
  * swapping them into oracle-checked queries changes nothing
  * observable.
  */
object ArrayExprUtil {

  /** Σ x_i · (i+1) over a float array, double accumulation in index
    * order — replaces `aggregate(transform(e, (x,i) -> x·(i+1)), 0.0, +)`. */
  def posWeightedSum(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      acc += a.getFloat(i).toDouble * (i + 1)
      i += 1
    }
    acc
  }

  /** BPE-ish subword count: per whitespace token, 1 + floor(len/6) —
    * replaces `aggregate(split(trim(s),'\\s+'), 0L, (a,w) -> a + 1 +
    * floor(length(w)/6.0))` (see TextFns.subwordCount). */
  def subwordCount(s: UTF8String): Long = {
    val toks = s.trim().toString.split("\\s+", -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc += 1L + (toks(i).codePointCount(0, toks(i).length) / 6)
      i += 1
    }
    acc
  }

  /** |A∩B| / (|A|+|B|−|A∩B|) for element-distinct string arrays (see
    * [[graft.plans.StringArrayJaccard]]). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) {
      if (set.contains(b.getUTF8String(j))) inter += 1
      j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** All `tables` random-hyperplane LSH buckets of one embedding in a
    * single pass. Plane p of table t (global index g = t·planes + p)
    * projects with coefficient ((j·(2g+3)) mod 17 − 8) for 1-based dim
    * j; bucket bit p is set iff the projection is > 0. Matches
    * [[graft.operators.Similarity.hyperplaneBucket]]'s fold order
    * (per-plane sequential sum over dims, double). */
  def hyperplaneBuckets(a: ArrayData, planes: Int, tables: Int): ArrayData = {
    val nPlanes = planes * tables
    val proj = new Array[Double](nPlanes)
    val n = a.numElements()
    var j = 0
    while (j < n) {
      val x = a.getFloat(j).toDouble
      var g = 0
      while (g < nPlanes) {
        proj(g) += x * (((j + 1) * (2 * g + 3)) % 17 - 8)
        g += 1
      }
      j += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < planes) {
        if (proj(t * planes + p) > 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Jaccard similarity of two element-distinct string arrays:
  * |A∩B| / (|A|+|B|−|A∩B|), one hash build + one probe pass —
  * replaces `size(array_intersect(a,b)) / size(array_union(a,b))`
  * (two hash tables and two materialized arrays per pair), the hot
  * verification step of every near-dup candidate join. Identical
  * values: for distinct inputs both formulations reduce to the same
  * integer counts divided in double (both-empty → NaN either way).
  */
case class StringArrayJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"string_array_jaccard needs two array<string> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayExprUtil.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ArrayExprUtil.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringArrayJaccard {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(
      StringArrayJaccard(GraftShims.expression(a), GraftShims.expression(b)))
}

/** Squared Euclidean distance between a float-array column and a
  * constant double-array center (the k-center inner loop): sequential
  * left fold in index order, bit-identical to the zip_with/aggregate
  * formulation and the oracle's list fold. */
case class ArraySqDistToConst(child: Expression, center: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_sqdist needs array<float>, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), center.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - center(i)
      acc += d * d
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centerRef = ctx.addReferenceObj("center", center, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($c.numElements(), $centerRef.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $c.getFloat($i) - $centerRef[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArraySqDistToConst {
  def apply(c: Column, center: Array[Double]): Column =
    GraftShims.column(ArraySqDistToConst(GraftShims.expression(c), center))
}

/** Position-weighted sum of a float array (the deterministic
  * ppl-proxy confidence of the selection pipeline). */
case class PosWeightedSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pos_weighted_sum needs array<float>, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ArrayExprUtil.posWeightedSum(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayExprUtil.posWeightedSum($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosWeightedSum {
  def apply(c: Column): Column =
    GraftShims.column(PosWeightedSum(GraftShims.expression(c)))
}

/** Native subword-count (see [[ArrayExprUtil.subwordCount]]). */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subword_count needs string, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    ArrayExprUtil.subwordCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayExprUtil.subwordCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCount {
  def apply(c: Column): Column =
    GraftShims.column(SubwordCount(GraftShims.expression(c)))
}

/** All LSH hyperplane buckets (one long per hash table) in one corpus
  * pass — replaces `tables × planes` interpreted zip_with/aggregate
  * folds per row. */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 63 && tables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets needs array<float>, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ArrayExprUtil.hyperplaneBuckets(input.asInstanceOf[ArrayData], planes, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ArrayExprUtil.hyperplaneBuckets($c, $planes, $tables)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def apply(c: Column, planes: Int, tables: Int): Column =
    GraftShims.column(
      HyperplaneBuckets(GraftShims.expression(c), planes, tables))
}
