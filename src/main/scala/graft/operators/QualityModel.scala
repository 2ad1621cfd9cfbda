package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Train-a-quality-filter: full-batch logistic-regression gradient
  * descent over a handful of cheap text statistics — the "distill an
  * expensive rule/judge into a linear scorer" workflow every corpus
  * pipeline runs (the reference's scorer registry is the apply side;
  * this is the fit side, `score_pipeline_*` contracts with a learned
  * score).
  *
  * Cross-engine exactness (the whole training loop is replayed by the
  * DuckDB oracle, weight for weight):
  *   - activation is the RATIONAL sigmoid σ̂(z) = 0.5 + z/(2(1+|z|))
  *     — same sign/monotonicity/range as the logistic but built from
  *     IEEE-correctly-rounded ops only, so both engines compute the
  *     identical double (exp() differs by ULPs across libms and those
  *     ULPs would compound over rounds);
  *   - per-row gradient contributions are rounded to 9 dp then summed
  *     as DECIMAL(28,9): exact and order-independent, immune to
  *     double reassociation across partitionings;
  *   - the weight update rounds to 9 dp each round, pinning the
  *     weight state to a canonical decimal both engines agree on.
  *
  * Scale posture: one narrow aggregation action per round over a
  * cached feature projection (the features are computed once, not per
  * round — the materialize-the-scored-frame step); gradient state is
  * d+1 numbers on the driver, like the power-iteration and Lloyd's
  * solvers. Rounds are a constant; the per-round cost is one
  * map-side-combined sum over n rows.
  */
object QualityModel {

  /** One GD round's gradient: Σ round((σ̂(z)−y)·x_j, 9) per feature,
    * as exact decimals. */
  private def gradientRow(train: DataFrame, featCols: Seq[String],
                          labelCol: String, w: Array[Double]): Array[Double] = {
    // same left-fold association both engines use, with the per-round
    // weights as a codegen reference object instead of inlined
    // literals: every GD round used to emit DIFFERENT generated source
    // (new literals) and pay a whole-stage-codegen compile; now the
    // source is round-invariant and the code cache serves rounds 2..k
    // (see WeightedDotConst — bit-identical fold, spec-asserted)
    val z = graft.plans.WeightedDotConst(featCols.map(col), w)
    val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    val e = p - col(labelCol).cast("double")
    val sums = featCols.map(f =>
      sum(round(e * col(f), 9).cast(DecimalType(28, 9))).as(s"g_$f"))
    val aggDf = train.agg(sums.head, sums.tail: _*)
    graft.core.LoopPlans.dump("gd_round", aggDf)
    val row = aggDf.head()
    featCols.indices.map { j =>
      val d = row.getDecimal(j)
      if (d == null) 0.0 else d.doubleValue()
    }.toArray
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit weights (bias first if `featCols` leads with a constant-1
    * column) by `rounds` full-batch steps of w ← round(w − lr·g/n, 9).
    * The caller supplies the feature frame; it is cached for the loop
    * and released after. */
  def trainLogistic(features: DataFrame, featCols: Seq[String],
                    labelCol: String, lr: Double, rounds: Int): Array[Double] = {
    val train = features.select(
      (featCols.map(col) :+ col(labelCol)): _*).cache()
    try {
      val n = train.count().toDouble
      require(n > 0, "trainLogistic: empty training set")
      // every round is a driver-sequential aggregation job over this
      // cached frame; clamp its task count to the data (~50k rows per
      // task) so a small training set doesn't pay shuffle-partition-
      // many near-empty tasks per round — at corpus scale n/50k
      // exceeds the cached partition count and this is a no-op.
      // coalesce is a narrow read of the cache; decimal gradient sums
      // are order-independent, so the repartitioning cannot move a bit
      val parts = math.max(1L, math.min(
        train.rdd.getNumPartitions.toLong, (n / 50000).toLong + 1L)).toInt
      val trainC = train.coalesce(parts)
      var w = Array.fill(featCols.size)(0.0)
      for (_ <- 0 until rounds) {
        val g = gradientRow(trainC, featCols, labelCol, w)
        w = w.indices.map(j => round9(w(j) - lr * g(j) / n)).toArray
      }
      w
    } finally { train.unpersist(false) }
  }

  /** The fitted linear score z = Σ w_j·x_j as a column (same fixed
    * left-association as training). */
  def scoreZ(featCols: Seq[String], w: Array[Double]): Column =
    featCols.zipWithIndex.map { case (f, j) => lit(w(j)) * col(f) }
      .reduceLeft(_ + _)

  /** σ̂ probability of the fitted score. */
  def scoreProb(featCols: Seq[String], w: Array[Double]): Column = {
    val z = scoreZ(featCols, w)
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
  }
}
