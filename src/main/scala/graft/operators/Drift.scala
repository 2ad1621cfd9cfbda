package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus drift monitoring: KL divergence of each partition's
  * hashed-unigram token distribution against the corpus-wide baseline
  * distribution — the "did yesterday's crawl change the language mix"
  * check a production ingest pipeline runs before a new shard joins
  * the training mix. Same modeling trick as [[Dsir]] (arXiv:2302.03169
  * §3: hashed n-gram bag models): the distribution lives in B counter
  * cells per group, so the whole monitor is ONE corpus scan into a
  * (groups × B)-cell aggregate — no vocabulary, no second pass.
  *
  * KL(p_g ‖ q) = Σ_b p_b · ln(p_b / q_b) with add-1 smoothing over the
  * B cells, p from the group's counts, q from the whole corpus. The
  * complete (group × bucket) grid is enumerated (a group missing a
  * bucket still contributes its smoothed mass), so the sum is over
  * exactly B terms per group.
  *
  * Determinism (oracle parity): counts are exact longs; p and q are
  * IEEE double divisions of identical integers (bit-identical across
  * engines); the one transcendental ln(p/q) is rounded to 6 dp — B
  * calls per group, not one per token. The sum is REARRANGED so the
  * remaining inexact factor leaves the summation: KL = (1/(T_g+B)) ·
  * Σ_b (c_b+1)·w_b, where (c_b+1) is an exact integer and w_b the
  * 6-dp DECIMAL weight — the inner sum is exact decimal arithmetic
  * (the [[Dsir]] recipe), and the single closing division runs once
  * per GROUP on bit-identical operands. The reported divergence is
  * the FLOOR-pinned integer floor(kl·10⁹) (`kl_e9`, the
  * q_mixture_target `rate_e6` recipe): floor of identical doubles is
  * pure IEEE arithmetic in both engines, while round-to-9-dp
  * disagrees on exact half-boundaries (Spark rounds the shortest
  * decimal repr, DuckDB the binary expansion — measured 1-ulp
  * divergent on the streaming twin), and a per-term p·w double cast
  * to decimal diverges at the 10th decimal.
  *
  * Scale posture: the only corpus-sized operation is the grouped
  * count onto (group, bucket) cells — map-side combined, state
  * = |groups| × B longs; everything after is arithmetic over that
  * tiny frame. At 100 TB the monitor costs one scan.
  */
object Drift {

  /** Per-group KL divergence vs the corpus baseline over B hashed
    * token buckets. `toks` must have `groupCol` and `wordCol` columns
    * (one row per token). Returns (group, n_tokens, kl_vs_corpus). */
  def klPerGroup(toks: DataFrame, groupCol: String, wordCol: String,
                 b: Int): DataFrame = {
    // one corpus scan: (group, bucket) cell counts
    val cells = graft.core.Caches.track(
      toks.select(col(groupCol), Dsir.bucket(col(wordCol), b).as("bkt"))
        .groupBy(col(groupCol), col("bkt")).agg(count(lit(1)).as("c")))
    // complete grid: every group × every bucket (missing cells count 0)
    val groups = cells.groupBy(col(groupCol)).agg(sum(col("c")).as("t_grp"))
    val grid = groups.crossJoin(
        broadcast(cells.sparkSession.range(b).select(col("id").as("bkt"))))
      .join(cells, Seq(groupCol, "bkt"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    // corpus baseline per bucket + corpus total (derived from the
    // cells frame — no second scan)
    val corpus = cells.groupBy(col("bkt")).agg(sum(col("c")).as("cq"))
    val tot = corpus.agg(sum(col("cq")).as("t_all"))
    val bb = lit(b.toLong)
    val p = (col("c") + lit(1.0)) / (col("t_grp") + bb).cast("double")
    val q = (coalesce(col("cq"), lit(0L)) + lit(1.0)) /
      (col("t_all") + bb).cast("double")
    val w = round(log(p / q), 6).cast(DecimalType(18, 6))
    grid.join(corpus, Seq("bkt"), "left")
      .crossJoin(broadcast(tot))
      .select(col(groupCol), col("t_grp"),
        ((col("c") + lit(1L)).cast(DecimalType(20, 0)) * w).as("term"))
      .groupBy(col(groupCol))
      .agg(max(col("t_grp")).cast("long").as("n_tokens"),
        floor(sum(col("term")).cast("double") /
          (max(col("t_grp")) + bb).cast("double") * lit(1e9))
          .cast("long").as("kl_e9"))
  }
}
