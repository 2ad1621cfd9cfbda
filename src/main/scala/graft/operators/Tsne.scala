package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact t-SNE 2-D projection (reference C3:
  * `/root/reference/src/main.py:366–368`,
  * `TSNE(n_components=2, perplexity=5, learning_rate=200,
  * n_iter=1000)`), for cluster visualization.
  *
  * Scale posture: t-SNE is inherently O(n²) PER ITERATION and exists
  * only to draw pictures — the reference itself runs sklearn's TSNE on
  * the driver over a sampled table. This implementation keeps that
  * contract honest at 100 TB: the DISTRIBUTED part is whatever
  * Spark-side sampling/selection bounds n (stride sampling, k-center,
  * cluster-stratified — all in this engine); the exact algorithm then
  * runs on ≤ `maxRows` points (enforced, not assumed) INSIDE one
  * executor task — the plan stays lazy (constructing the DataFrame
  * costs nothing; plan tools never trigger the optimization), and no
  * point ever reaches the driver.
  *
  * Determinism (stronger than the reference's seed=0): no RNG at all.
  * Init comes from the first two input dimensions, standardized and
  * scaled — the standard 1e-4 init magnitude — and points are sorted
  * by id inside the task, so two runs produce bit-identical
  * embeddings regardless of upstream partitioning; specs assert exact
  * equality.
  *
  * Algorithm (van der Maaten & Hinton 2008, the public formulation):
  * per-point Gaussian bandwidths found by bisection to match
  * log(perplexity) entropy; symmetrized affinities with early
  * exaggeration; student-t low-dimensional kernel; gradient descent
  * with momentum and per-coordinate gains.
  */
object Tsne {

  /** Deterministic count-bounded stride sample for the viz pipeline.
    *
    * A FIXED stride keeps a fixed FRACTION of the corpus — fine at one
    * scale factor, but the sample grows linearly with the table and
    * eventually trips `project`'s `maxRows` guard. Deriving the stride
    * from a cheap COUNT keeps the sample ≈ `target` rows at ANY scale
    * factor: for a dense id column (0..n-1) the result is within one
    * row of `target`; for sparse-but-roughly-uniform ids it stays the
    * same order of magnitude, which is all a viz sample needs. The
    * count is a single columnar scan of one column — negligible next
    * to the solver it protects — and the selection itself is a plain
    * pushdown-friendly filter: no window, no global sort, no shuffle. */
  def boundedSample(df: DataFrame, idCol: String, target: Long = 500L): DataFrame = {
    require(target > 0, s"sample target must be positive, got $target")
    val n = df.select(col(idCol)).count()
    val stride = math.max(1L, (n + target - 1) / target)
    df.where(pmod(col(idCol), lit(stride)) === 0)
  }

  /** Project `embCol` (array<float/double>) to 2-D t-SNE coordinates.
    * Returns a LAZY (idCol, x, y) DataFrame; the algorithm runs in a
    * single executor task when an action fires, and throws there if
    * the input exceeds `maxRows` rather than silently attempting an
    * O(n²) job on a corpus. */
  def project(df: DataFrame, idCol: String, embCol: String,
              perplexity: Double = 5.0, iters: Int = 300,
              learningRate: Double = 0.0, maxRows: Int = 5000): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
    // repartition(1), NOT coalesce(1): coalesce is shuffle-free and
    // would collapse the whole narrow upstream (the corpus scan +
    // sampling filter) into the same single task; the shuffle boundary
    // keeps upstream sampling parallel and moves only the bounded
    // sample to the solver task
    df.select(col(idCol).cast("long"), col(embCol))
      .repartition(1)
      .mapPartitions { it =>
        solve(it, perplexity, iters, learningRate, maxRows)
      }(Encoders.row(outSchema))
  }

  /** The exact algorithm over an in-task iterator. Separated so the
    * surrounding DataFrame stays a plain lazy mapPartitions plan. */
  private def solve(it: Iterator[Row], perplexity: Double, iters: Int,
                    learningRate: Double, maxRows: Int): Iterator[Row] = {
    val collected = it.take(maxRows + 1).toArray
      // fixed point order (summation order in the loops below follows
      // index order) → bit-identical output independent of partitioning
      .sortBy(_.getLong(0))
    require(collected.length <= maxRows,
      s"t-SNE is a viz operator over a bounded sample: got > $maxRows rows; " +
        "sample/select upstream (stride, k-center, stratified) first")
    require(collected.nonEmpty, "t-SNE needs a non-empty input")
    val n = collected.length
    val ids = collected.map(_.getLong(0))
    require(collected.forall(!_.isNullAt(1)), "t-SNE needs non-null embeddings")
    val x = collected.map(_.getSeq[Number](1).map(_.doubleValue).toArray)
    val dim = x(0).length
    require(x.forall(_.length == dim),
      s"t-SNE needs rectangular embeddings: expected dim $dim for every row")

    // ---- pairwise squared distances (high-dim)
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0; var k = 0
        while (k < dim) { val t = x(i)(k) - x(j)(k); s += t * t; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // ---- per-point bandwidth by bisection to entropy log(perplexity)
    val targetH = math.log(perplexity)
    val p = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var betaMin = 0.0; var betaMax = Double.PositiveInfinity; var beta = 1.0
      var it = 0
      while (it < 50) {
        var sum = 0.0; var sumD = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = math.exp(-d2(i)(j) * beta)
            sum += e; sumD += d2(i)(j) * e
          }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + beta * sumD / sum else 0.0
        if (h > targetH) { betaMin = beta
          beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2 }
        else { betaMax = beta; beta = (beta + betaMin) / 2 }
        it += 1
      }
      var j = 0
      var sum = 0.0
      while (j < n) {
        if (j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }
        j += 1
      }
      j = 0
      while (j < n) { if (j != i && sum > 0) p(i)(j) /= sum; j += 1 }
      i += 1
    }
    // symmetrize + floor; early exaggeration ×12 for the first quarter
    val pSym = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        pSym(i)(j) = math.max((p(i)(j) + p(j)(i)) / (2.0 * n), 1e-12)
        j += 1
      }
      i += 1
    }

    // ---- deterministic init: standardized first two input dims × 1e-4
    def standardized(c: Int): Array[Double] = {
      val v = Array.tabulate(n)(r => if (c < dim) x(r)(c) else r.toDouble)
      val mean = v.sum / n
      val sd = math.sqrt(v.map(t => (t - mean) * (t - mean)).sum / n)
      if (sd > 0) v.map(t => (t - mean) / sd * 1e-4)
      // constant column: fall back to the row index so points differ
      else Array.tabulate(n)(r => (r - (n - 1) / 2.0) * 1e-6)
    }
    val y  = Array(standardized(0), standardized(1))
    val vel = Array.fill(2)(new Array[Double](n))
    val gains = Array.fill(2)(Array.fill(n)(1.0))

    // ---- gradient descent
    // learningRate <= 0 → the "auto" rule (public: sklearn 1.2+
    // default, from Belkina et al. 2019): n / early_exaggeration / 4,
    // floored at 50. A fixed 200 overshoots badly on small samples.
    val lr = if (learningRate > 0) learningRate
             else math.max(n / 12.0 / 4.0, 50.0)
    val exagUntil = iters / 4
    val num = Array.ofDim[Double](n, n)
    var iter = 0
    while (iter < iters) {
      val exag = if (iter < exagUntil) 12.0 else 1.0
      // student-t numerators + normalizer
      var z = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = y(0)(i) - y(0)(j); val dy = y(1)(i) - y(1)(j)
          val q = 1.0 / (1.0 + dx * dx + dy * dy)
          num(i)(j) = q; num(j)(i) = q; z += 2 * q
          j += 1
        }
        i += 1
      }
      val momentum = if (iter < iters / 2) 0.5 else 0.8
      // batch update: ALL gradients from the frozen layout first, THEN
      // apply — updating y in place mid-sweep lets early moves inflate
      // later gradients within one iteration (measured: 1e-4 init →
      // |y| ≈ 16 after a single in-place sweep → divergence)
      val grad = Array.ofDim[Double](2, n)
      i = 0
      while (i < n) {
        var gx = 0.0; var gy = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = num(i)(j)
            val coef = (exag * pSym(i)(j) - q / z) * q
            gx += coef * (y(0)(i) - y(0)(j))
            gy += coef * (y(1)(i) - y(1)(j))
          }
          j += 1
        }
        grad(0)(i) = 4.0 * gx; grad(1)(i) = 4.0 * gy
        i += 1
      }
      i = 0
      while (i < n) {
        var c = 0
        while (c < 2) {
          // standard adaptive gains: grow when gradient and velocity
          // disagree in direction, shrink when they agree
          gains(c)(i) = math.max(0.01,
            if (grad(c)(i) * vel(c)(i) < 0) gains(c)(i) + 0.2
            else gains(c)(i) * 0.8)
          vel(c)(i) = momentum * vel(c)(i) -
            lr * gains(c)(i) * grad(c)(i)
          y(c)(i) += vel(c)(i)
          c += 1
        }
        i += 1
      }
      iter += 1
    }

    (0 until n).iterator.map(r => Row(ids(r), y(0)(r), y(1)(r)))
  }
}
