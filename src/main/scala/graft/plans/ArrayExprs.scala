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

  /** Shared precompiled whitespace pattern: `String.split("\\s+")` has
    * no single-char fast path and recompiles the regex per call — on a
    * 100M-row corpus that is 100M redundant Pattern.compile calls in
    * loops whose purpose is removing per-row overhead. */
  val WS: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\s+")

  /** Null array elements: the HOF twins of these natives return NULL;
    * silently reading the null slot as 0.0 would produce a
    * plausible-but-wrong number the oracle gate cannot catch on clean
    * fixtures — refuse loudly instead. */
  private def nullElement(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null array element at index $i — the engine's array " +
        "natives require non-null elements (filter or coalesce upstream)")

  /** Σ x_i · (i+1) over a float array, double accumulation in index
    * order — replaces `aggregate(transform(e, (x,i) -> x·(i+1)), 0.0, +)`. */
  def posWeightedSum(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) nullElement("pos_weighted_sum", i)
      acc += a.getFloat(i).toDouble * (i + 1)
      i += 1
    }
    acc
  }

  /** BPE-ish subword count: per whitespace token, 1 + floor(len/6) —
    * replaces `aggregate(split(trim(s),'\\s+'), 0L, (a,w) -> a + 1 +
    * floor(length(w)/6.0))` (see TextFns.subwordCount). */
  def subwordCount(s: UTF8String): Long = {
    val toks = WS.split(s.trim().toString, -1)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc += 1L + (toks(i).codePointCount(0, toks(i).length) / 6)
      i += 1
    }
    acc
  }

  /** Jaccard of the DISTINCT views: |A∩B| / (|A|+|B|−|A∩B|) over the
    * deduplicated elements — the exact semantics of
    * `size(array_intersect(a,b)) / size(array_union(a,b))`, so inputs
    * with duplicate elements cannot over-count the intersection
    * (jaccard > 1) the way a raw-count formulation would (see
    * [[graft.plans.StringArrayJaccard]]). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val sa = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullElement("string_array_jaccard", i)
      sa.add(a.getUTF8String(i)); i += 1
    }
    val sb = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) nullElement("string_array_jaccard", j)
      val e = b.getUTF8String(j)
      if (sb.add(e) && sa.contains(e)) inter += 1
      j += 1
    }
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  /** Cosine of two float arrays, double accumulation in index order —
    * see [[graft.plans.ArrayCosineSim]]. Length mismatch refuses (the
    * HOF twin returns NULL via zip_with padding; truncating would
    * return a plausible-but-wrong similarity). */
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx != ny) throw new IllegalArgumentException(
      s"array_cosine_sim: length mismatch ($nx vs $ny) — mixed-dim " +
        "embeddings cannot be compared")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i) || y.isNullAt(i)) nullElement("array_cosine_sim", i)
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Squared distance to a constant center, index-order fold — see
    * [[graft.plans.ArraySqDistToConst]]. Same refuse-don't-truncate
    * contract as [[cosine]]. */
  def sqDistToConst(a: ArrayData, center: Array[Double]): Double = {
    val n = a.numElements()
    if (n != center.length) throw new IllegalArgumentException(
      s"array_sqdist: length mismatch ($n vs center ${center.length})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElement("array_sqdist", i)
      val d = a.getFloat(i).toDouble - center(i)
      acc += d * d
      i += 1
    }
    acc
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
      if (a.isNullAt(j)) nullElement("hyperplane_buckets", j)
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
  override def nullSafeEval(input: Any): Any =
    ArrayExprUtil.sqDistToConst(input.asInstanceOf[ArrayData], center)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centerRef = ctx.addReferenceObj("center", center, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ArrayExprUtil.sqDistToConst($c, $centerRef)")
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

/** z = Σ w_j·x_j over double columns with the CONSTANT weight vector
  * held as a codegen REFERENCE OBJECT — bit-identical to
  * `lit(w_0)*x_0 + lit(w_1)*x_1 + ...` (the accumulator starts at
  * w_0·x_0, not 0.0, so even signed zeros match the binary-operator
  * left fold). Why not literals: the gradient-descent loop re-plans
  * its aggregate every round with new weights, and inlined literals
  * change the generated source each time — one whole-stage-codegen
  * compile (~20 ms) per round per query. With the weights in
  * `references` the generated source is IDENTICAL across rounds and
  * the code cache serves every round after the first (the
  * [[ArraySqDistToConst]] pattern, N-ary). Deliberately non-foldable:
  * the weights are not literal children, so constant folding cannot
  * inline them back. */
case class WeightedDotConst(children: Seq[Expression], weights: Array[Double])
    extends Expression {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.length != weights.length)
      TypeCheckResult.TypeCheckFailure(
        "weighted_dot_const needs one (non-empty) child per weight, got " +
          s"${children.length} children for ${weights.length} weights")
    else if (children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"weighted_dot_const needs double inputs, got " +
        children.map(_.dataType.sql).mkString(", "))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var acc = 0.0
    var j = 0
    while (j < weights.length) {
      val v = children(j).eval(input)
      if (v == null) return null
      val term = weights(j) * v.asInstanceOf[Double]
      acc = if (j == 0) term else acc + term
      j += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    val evals = children.map(_.genCode(ctx))
    val childBlocks = evals.map(_.code).reduce(_ + _)
    // fixed child indexes, no weight values in the source: the code is
    // round-invariant even though each round's expression instance
    // carries a different array
    val terms = weights.indices.map(j =>
      s"${ev.value} ${if (j == 0) "=" else "+="} $wRef[$j] * ${evals(j).value};")
      .mkString("\n        ")
    val anyNull = evals.map(e => s"${e.isNull}").mkString(" || ")
    ev.copy(code =
      code"""
        $childBlocks
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          $terms
        }
      """)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  // The weights are EXCLUDED from the hash (not from equality). The
  // subexpression-elimination pass buckets candidate expressions in
  // hash maps, and the default case-class hash of an Array is its
  // IDENTITY hash — a fresh array per GD round re-ordered the map's
  // iteration, renumbered every `subExprValue` variable in the
  // generated source, and defeated the codegen cache (measured: 2
  // recompiles per round, i.e. exactly what this expression exists to
  // stop; sources diffed identical up to variable numbering). A
  // weight-independent hash keeps the numbering stable; equality
  // stays value-based so distinct weight vectors can never be CSE'd
  // into each other.
  override def hashCode(): Int = java.util.Objects.hash(getClass, children)
  override def equals(other: Any): Boolean = other match {
    case w: WeightedDotConst =>
      children == w.children && java.util.Arrays.equals(weights, w.weights)
    case _ => false
  }
  override def stringArgs: Iterator[Any] =
    Iterator(children, weights.mkString("[", ",", "]"))
}

object WeightedDotConst {
  /** Each column is cast to double first — the same implicit widening
    * the `lit(w)*col` formulation gets from binary-arithmetic type
    * coercion. */
  def apply(cols: Seq[Column], weights: Array[Double]): Column =
    GraftShims.column(WeightedDotConst(
      cols.map(c => GraftShims.expression(c.cast("double"))), weights))
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
    case ArrayType(FloatType, _) =>
      // separate messages: a parameter error must not masquerade as
      // "needs array<float>, got array<float>"; the product bound
      // keeps the per-row projection array sane (and un-overflowable)
      if (planes < 1 || planes > 63) TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets: planes must be in 1..63, got $planes")
      else if (tables < 1 || planes.toLong * tables > 4096)
        TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets: tables must be >= 1 with planes*tables <= 4096, got tables=$tables")
      else TypeCheckResult.TypeCheckSuccess
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
