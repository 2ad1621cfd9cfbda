package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): rank a large raw pool by how much
  * each document's hashed-token distribution looks like a small
  * TARGET corpus, using the log-likelihood ratio of two bag-of-
  * hashed-ngrams models. The method's point at 100 TB is that the
  * entire "model" is B counter cells per pool (here B = 512): fitting
  * is one grouped count per pool, and scoring is a broadcast join —
  * no vocabulary table, no training loop, no per-document state.
  *
  * Pipeline:
  *  1. hash every token into one of B buckets (seeded md5-h15, the
  *     [[Dedup.md5Wid]] scheme — bit-replayable by the DuckDB oracle);
  *  2. fit add-1-smoothed unigram models over buckets for target p
  *     and raw q: p(b) = (ct_b + 1)/(T + B);
  *  3. per raw document, importance = Σ_tokens log(p(b)/q(b)) — each
  *     bucket's log-ratio is rounded to 6 dp and the per-document sum
  *     runs in DECIMAL, so Spark's partial aggregation and DuckDB's
  *     sequential sum are bit-identical (the suite's standard
  *     round-then-decimal-sum recipe; the only transcendental is one
  *     ln per BUCKET — 512 calls total, not one per token);
  *  4. select the top-k documents (the paper resamples with Gumbel
  *     noise; the engine's selection is deterministic top-k, the same
  *     determinism trade every sampler in [[Selection]] makes).
  *
  * Scale posture: two corpus scans (one per pool) to fit, one scan to
  * score; the weight table is B rows and BROADCASTS; the only
  * corpus-sized shuffle is the per-document score aggregation, which
  * map-side combines on doc_id. Top-k is TakeOrdered — no global
  * sort.
  */
object Dsir {

  /** Seed for the bucket hash — distinct from the shingle-id and CMS
    * seeds so feature spaces never alias across operators. */
  val Seed: Long = 2077L

  /** Bucket of a token: md5-h15("2077:" || token) mod P mod B. */
  def bucket(word: Column, b: Int): Column =
    pmod(Dedup.md5Wid(word, Seed), lit(b.toLong))

  /** DuckDB twin of [[bucket]]. */
  def bucketSql(expr: String, b: Int): String =
    s"(${Dedup.widSql(expr, Seed)} % $b)"

  /** Per-bucket importance weights from the two token pools:
    * w(b) = round(ln( ((ct+1)/(T+B)) / ((cr+1)/(R+B)) ), 6) as
    * DECIMAL(18,6). Totals T and R are derived from the bucket
    * tables themselves (no extra pool scan); buckets unseen in one
    * pool get that side's count 0 via the full outer join. */
  def importanceWeights(targetToks: DataFrame, rawToks: DataFrame,
                        wordCol: String, b: Int): DataFrame = {
    val tb = graft.core.Caches.track(
      targetToks.select(bucket(col(wordCol), b).as("bkt"))
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct")))
    val rb = graft.core.Caches.track(
      rawToks.select(bucket(col(wordCol), b).as("bkt"))
        .groupBy(col("bkt")).agg(count(lit(1)).as("cr")))
    val tTot = tb.agg(sum(col("ct")).as("t_tok"))
    val rTot = rb.agg(sum(col("cr")).as("r_tok"))
    tb.join(rb, Seq("bkt"), "full_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bkt"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("t_tok") + lit(b.toLong)).cast("double")) /
          ((coalesce(col("cr"), lit(0L)) + lit(1.0)) /
            (col("r_tok") + lit(b.toLong)).cast("double"))), 6)
          .cast(DecimalType(18, 6)).as("w"))
  }

  /** [[importanceWeights]] when both pools live in ONE table, told
    * apart by a boolean column: a single corpus scan fits both
    * models (one grouped conditional count onto B cells) instead of
    * one scan per pool. Identical weights to the two-pool form —
    * ct/cr and the totals are the same integers. */
  def importanceWeightsSplit(toks: DataFrame, isTarget: Column,
                             wordCol: String, b: Int): DataFrame = {
    val counts = graft.core.Caches.track(
      toks.select(bucket(col(wordCol), b).as("bkt"), isTarget.as("is_t"))
        .groupBy(col("bkt")).agg(
          sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
          sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr")))
    val tot = counts.agg(sum(col("ct")).as("t_tok"), sum(col("cr")).as("r_tok"))
    counts.crossJoin(broadcast(tot))
      .select(col("bkt"),
        round(log(
          ((col("ct") + lit(1.0)) / (col("t_tok") + lit(b.toLong)).cast("double")) /
          ((col("cr") + lit(1.0)) / (col("r_tok") + lit(b.toLong)).cast("double"))), 6)
          .cast(DecimalType(18, 6)).as("w"))
  }

  /** Per-document importance score: one broadcast join of the token
    * stream against the B-row weight table, one map-side-combined
    * DECIMAL sum per document. */
  def scoreDocuments(docToks: DataFrame, idCol: String, wordCol: String,
                     weights: DataFrame, b: Int): DataFrame =
    docToks.select(col(idCol), bucket(col(wordCol), b).as("bkt"))
      .join(broadcast(weights), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")).cast("double"), 6).as("score"))
}
