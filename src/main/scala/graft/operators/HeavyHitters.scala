package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters ("which tokens exceed 1/k of the corpus?")
  * without shuffling the vocabulary.
  *
  * The plain formulation — `GROUP BY word HAVING count·k > N` — pays a
  * full-vocabulary shuffle: at corpus scale the hash aggregation's key
  * space is the long tail of near-unique tokens (URLs, hashes, typos),
  * which dominates both the map-side hash tables and the exchange,
  * all to compute counts that are then thrown away by the HAVING.
  *
  * This operator runs the classic two-pass sketch-then-verify instead:
  *   1. CANDIDATES: per-partition Misra–Gries with k−1 counters — a
  *      narrow pass, no shuffle, ≤ k−1 survivors per partition. The
  *      guarantee composes across partitions: if count(x) > N/k
  *      globally then count_p(x) > N_p/k in at least one partition p
  *      (else summing the per-partition bounds gives count(x) ≤ N/k),
  *      and single-partition MG keeps everything above its partition's
  *      N_p/k. So the union of partition candidates is a SUPERSET of
  *      the true heavy hitters — false positives possible, false
  *      negatives impossible.
  *   2. VERIFY: exact recount restricted to the broadcast candidate
  *      set (a semi join evaluated map-side), then the integral
  *      threshold `cnt·k > N`. The recount's aggregation keys on
  *      ≤ partitions·(k−1) words instead of the vocabulary, and the
  *      map-side partial aggregation collapses each partition's rows
  *      to at most that many groups before the (tiny) exchange.
  * The output is therefore EXACTLY the plain formulation's — the
  * oracle replays `GROUP BY … HAVING cnt·k > N` — while no stage ever
  * holds or shuffles per-rare-token state. MG's candidate set depends
  * on row order, but the verify step makes the RESULT deterministic
  * regardless.
  *
  * The MG pass is `mapPartitions` — the documented last-resort tier —
  * because decrement-all counter maintenance is genuinely
  * per-partition imperative state with no relational equivalent that
  * avoids the vocabulary shuffle this operator exists to avoid.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries survivors (distinct, ≤ k−1 per input
    * partition) for the string column `wordCol`. */
  def mgCandidates(words: DataFrame, wordCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val ds = words.select(col(wordCol).cast("string")).as(Encoders.STRING)
    ds.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      while (it.hasNext) {
        val w = it.next()
        counters.get(w) match {
          case Some(c) => counters.update(w, c + 1L)
          case None if counters.size < k - 1 => counters.update(w, 1L)
          case None =>
            val dead = List.newBuilder[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1L)
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }(Encoders.STRING).toDF(wordCol).distinct()
  }

  /** Exact heavy hitters: every `wordCol` value whose count exceeds
    * N/k (strictly — the integral form `cnt·k > N`), with its exact
    * count. See object scaladoc for the plan shape. */
  def exact(words: DataFrame, wordCol: String, k: Int): DataFrame = {
    val w = graft.core.Caches.track(words) // three narrow passes
    val cands = mgCandidates(w, wordCol, k)
    val total = w.agg(count(lit(1)).as("_hh_n"))
    w.join(broadcast(cands), Seq(wordCol), "left_semi")
      .groupBy(col(wordCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * lit(k.toLong) > col("_hh_n"))
      .drop("_hh_n")
  }
}
