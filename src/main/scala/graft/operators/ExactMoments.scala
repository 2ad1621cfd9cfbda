package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (SURVEY.md §2b "UDF/UDAF surface"): exact
  * first/second moments of a money-like double column.
  *
  * Why a custom aggregate instead of builtin `stddev_samp`: the
  * builtin accumulates doubles with a merge-order-dependent Welford
  * update, so distributed results drift in the last ulps run to run.
  * This Aggregator sums `CAST(x AS DECIMAL(·,8))` and its square
  * EXACTLY (addition-order-free, so partial aggregation and any merge
  * tree give bit-identical buffers), then derives mean/variance with a
  * fixed double formula at `finish`. The DuckDB oracle replicates the
  * same decimal sums and the same final double expression, making the
  * statistic hash-comparable (see the oracle-determinism notes in
  * [[graft.queries.Q]]).
  */
/** Exact state: count + decimal Σx + decimal Σx². Encoded as
  * DECIMAL(38,18) between partial and final aggregation — wide
  * enough for 1e9 rows of 1e5-scale values. */
case class MomentsBuf(n: Long, s: JBigDecimal, s2: JBigDecimal)
case class MomentsOut(n: Long, mean: Double, var_samp: Double)

object ExactMoments extends Aggregator[Double, MomentsBuf, MomentsOut] {
  type Buf = MomentsBuf
  type Out = MomentsOut
  private def Buf(n: Long, s: JBigDecimal, s2: JBigDecimal) = MomentsBuf(n, s, s2)
  private def Out(n: Long, mean: Double, v: Double) = MomentsOut(n, mean, v)

  private def dec(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(8, RoundingMode.HALF_UP)

  override def zero: Buf = Buf(0L, JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: Buf, x: Double): Buf = {
    val d = dec(x)
    Buf(b.n + 1, b.s.add(d), b.s2.add(d.multiply(d)))
  }

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.n + b.n, a.s.add(b.s), a.s2.add(b.s2))

  /** Fixed derivation order (identical in the oracle SQL): decimal →
    * nearest double ONCE per sum, then pure double arithmetic. The
    * decimal→double cast can differ from DuckDB's by 1 ulp, so
    * consumers round the outputs to a grid far coarser than that. */
  override def finish(b: Buf): Out =
    if (b.n == 0) Out(0L, Double.NaN, Double.NaN)
    else {
      val sd = b.s.doubleValue()
      val s2d = b.s2.doubleValue()
      val mean = sd / b.n
      val v = if (b.n < 2) Double.NaN else (s2d - sd * sd / b.n) / (b.n - 1)
      Out(b.n, mean, v)
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]

  /** Column-API entry point: `exactMoments(col)` yields a struct
    * `(n, mean, var_samp)`. */
  private lazy val fn = udaf(ExactMoments, Encoders.scalaDouble)
  def apply(c: Column): Column = fn(c)

  /** DuckDB fragment computing the same (n, mean, var_samp) from the
    * same exact decimal sums and the same final double expression. */
  def oracleSqlParts(x: String): (String, String, String) = {
    // DECIMAL(19,8) operands force DuckDB onto int128 storage (width
    // 18 multiplies in int64 and overflows); (19,8)·(19,8) → width 38,
    // the cap, and the exact product sum matches the Aggregator's.
    val s = s"CAST(SUM(CAST($x AS DECIMAL(19,8))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST($x AS DECIMAL(19,8)) * CAST($x AS DECIMAL(19,8))) AS DOUBLE)"
    val n = "COUNT(*)"
    // n < 2 → NaN, mirroring finish() exactly: without the guard the
    // fragment divides by (n-1) = 0, which DuckDB evaluates to
    // NULL/±inf depending on version — a latent single-row-group
    // divergence
    (n, s"$s / $n",
      s"CASE WHEN $n < 2 THEN CAST('nan' AS DOUBLE) ELSE ($s2 - $s * $s / $n) / ($n - 1) END")
  }
}
