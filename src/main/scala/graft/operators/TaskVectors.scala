package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TaskVector arithmetic and TIES merging as relational operators over
  * long-format tensors `(param_key: string, idx: long, value: double)`
  * — tensor-as-table.
  *
  * Reference provenance: TaskVector diff/add/neg/weighted/apply
  * `merging.py:30–95`; top-k-by-magnitude mask `merging.py:186–211`;
  * sign resolution `merging.py:214–233`; disjoint mean/sum/max merge
  * `merging.py:239–267`.
  *
  * Scale posture: a 70B-param model is 7e10 rows — far beyond any
  * map<string,tensor> column but trivial as a table partitioned by
  * (param_key, idx). Every operator below is a join or grouped
  * aggregate on that key, so co-partitioning (bucketing in a real
  * deployment) makes the whole TIES pipeline shuffle-once.
  */
object TaskVectors {

  private val K = Seq("param_key", "idx")

  /** T1: finetuned − base, elementwise (inner join on the key — the
    * reference asserts shared keys and skips int params upstream). */
  def diff(finetuned: DataFrame, base: DataFrame): DataFrame =
    finetuned.alias("f").join(base.alias("b"), K)
      .select(col("param_key"), col("idx"),
        (col("f.value") - col("b.value")).as("value"))

  /** T1: elementwise sum of two task vectors. */
  def add(a: DataFrame, b: DataFrame): DataFrame =
    a.alias("a").join(b.alias("b"), K)
      .select(col("param_key"), col("idx"),
        (col("a.value") + col("b.value")).as("value"))

  def negate(tv: DataFrame): DataFrame =
    tv.withColumn("value", -col("value"))

  /** T1: Σ coefᵢ · tvᵢ — one union + one grouped sum, not n joins. */
  def weightedMerge(tvs: Seq[(DataFrame, Double)]): DataFrame =
    tvs.map { case (tv, c) => tv.withColumn("value", col("value") * lit(c)) }
      .reduce(_ unionAll _)
      .groupBy(col("param_key"), col("idx"))
      .agg(sum(col("value")).as("value"))

  /** T1: base + scale · tv (apply). */
  def applyTo(base: DataFrame, tv: DataFrame, scale: Double): DataFrame =
    base.alias("b").join(tv.alias("t"), K, "left")
      .select(col("param_key"), col("idx"),
        (col("b.value") + lit(scale) * coalesce(col("t.value"), lit(0.0)))
          .as("value"))

  /** T2: per param_key keep the top `keep` fraction of entries by
    * |value|, zero the rest. Threshold via exact per-group percentile
    * aggregated then broadcast-joined back — groups are few (one per
    * tensor) while rows are billions, so a window would funnel each
    * tensor through one reducer. */
  def topKMask(tv: DataFrame, keep: Double): DataFrame = {
    val th = tv.groupBy(col("param_key"))
      .agg(percentile(abs(col("value")), lit(1.0 - keep)).as("_th"))
    tv.join(broadcast(th), "param_key")
      .withColumn("value",
        when(abs(col("value")) >= col("_th"), col("value")).otherwise(lit(0.0)))
      .drop("_th")
  }

  /** T3: per (param_key, idx) majority sign across models, by mass —
    * sign of the sum (`merging.py:214–233`). Input carries a `model`
    * column. */
  def resolveSign(stacked: DataFrame): DataFrame =
    stacked.groupBy(col("param_key"), col("idx"))
      .agg(signum(sum(col("value"))).as("gamma"))

  /** T4: disjoint merge — aggregate only entries whose sign matches
    * the elected one; mean divides by the matching non-zero count;
    * max takes the largest magnitude re-signed (`merging.py:239–267`).
    */
  def disjointMerge(stackedIn: DataFrame, method: String = "mean"): DataFrame = {
    // referenced twice (values + sign election) — cache the long
    // format once rather than recomputing its upstream per side
    val stacked = graft.core.Caches.track(stackedIn)
    val matches = signum(col("value")) === col("gamma") && col("value") =!= 0.0
    val masked  = when(matches, col("value")).otherwise(lit(0.0))
    val agg: Column = method match {
      case "sum"  => sum(masked)
      case "mean" =>
        sum(masked) / greatest(sum(when(matches, 1L).otherwise(0L)), lit(1L))
      case "max"  => max(abs(masked)) * col("gamma")
      case other  => throw new IllegalArgumentException(s"merge_func $other")
    }
    val withGamma = stacked.join(resolveSign(stacked), K)
    method match {
      case "max" =>
        withGamma.groupBy(col("param_key"), col("idx"), col("gamma"))
          .agg((max(abs(masked)) * col("gamma")).as("value"))
          .select(col("param_key"), col("idx"), col("value"))
      case _ =>
        withGamma.groupBy(col("param_key"), col("idx"))
          .agg(agg.as("value"))
    }
  }

  /** Full TIES (`merging.py:270+` shape): mask per model, resolve
    * signs, disjoint-merge. `stacked` carries (model, param_key, idx,
    * value). */
  def tiesMerge(stackedIn: DataFrame, keep: Double, method: String = "mean"): DataFrame = {
    val stacked = graft.core.Caches.track(stackedIn) // feeds threshold agg AND value join
    // threshold table is models×tensors rows (tiny) against billions of
    // stacked rows — broadcast it (same load-bearing hint as topKMask)
    // so the mask join never shuffles the big side
    val th = stacked.groupBy(col("model"), col("param_key"))
      .agg(percentile(abs(col("value")), lit(1.0 - keep)).as("_th"))
    val masked = stacked.join(broadcast(th), Seq("model", "param_key"))
      .withColumn("value",
        when(abs(col("value")) >= col("_th"), col("value")).otherwise(lit(0.0)))
      .drop("_th")
    disjointMerge(masked, method)
  }

  /** LESS-style gradient-similarity selection (reference P8): dot
    * product of per-example gradients against a validation gradient,
    * top-k examples. Long-format join + grouped sum — no vectors ever
    * materialize on the driver. */
  def gradientSimilarityTopK(exampleGrads: DataFrame, valGrad: DataFrame,
                             k: Int): DataFrame =
    exampleGrads.alias("g")
      .join(broadcast(valGrad.alias("v")), K)
      .groupBy(col("example_id"))
      .agg(sum(col("g.value") * col("v.value")).as("sim"))
      .orderBy(col("sim").desc, col("example_id"))
      .limit(k)
}
