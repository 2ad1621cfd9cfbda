package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inverted-index construction and BM25 retrieval over a document
  * table — the search/RAG surface of the corpus engine (reference
  * S6's ANN index is the dense twin; this is the sparse one).
  *
  * Scale posture: the index build is one explode + one (word, doc)
  * aggregation; posting-list truncation (top-P docs per term by tf)
  * never runs a per-term window over raw postings — a stopword's
  * postings are the whole corpus, the hot-window shape this engine
  * avoids. Instead the same sketch-then-verify composition as
  * [[HeavyHitters]]: a per-partition bounded heap keeps each
  * partition's local top-P per term (a provable superset of the
  * global top-P: a global winner is a local winner wherever it
  * lives), and the exact window runs over ≤ partitions·P candidate
  * rows per term. BM25 keeps the tf–idf family's rational-idf
  * convention (N/df, no transcendentals) so every score is
  * bit-replayable across engines; per-term contributions are rounded
  * then summed as DECIMAL — an order-independent exact sum, immune
  * to double reassociation across partitionings.
  */
object TextIndex {

  /** (word, doc, tf) postings from a document table: one explode, one
    * grouped count — the raw inverted file. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word"), col("doc"))
      .agg(count(lit(1)).as("tf"))

  /** Exact top-P postings per term by (tf DESC, doc ASC), without a
    * per-term window over the raw postings. Phase 1 prunes inside
    * each partition with a bounded heap (≤ P survivors per term per
    * partition); phase 2 ranks the surviving candidates — per-term
    * candidate count is bounded by partitions·P, independent of how
    * often the term occurs. */
  def topPostingsPerTerm(posts: DataFrame, p: Int): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._
    val candidates = posts.select(col("word"), col("doc").cast("long"),
        col("tf").cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // per-term min-heap of the locally best P postings; ordering
        // (tf DESC, doc ASC) ⇒ heap evicts (smallest tf, largest doc)
        val best = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
        // PQ dequeues its MAX — rank so the max IS the worst retained:
        // lower tf = worse, then higher doc = worse
        val worstFirst: Ordering[(Long, Long)] =
          Ordering.by { case (tf, doc) => (-tf, doc) }
        it.foreach { case (w, doc, tf) =>
          val h = best.getOrElseUpdate(w,
            scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
              worstFirst))
          if (h.size < p) h.enqueue((tf, doc))
          else {
            val (wtf, wdoc) = h.head
            if (tf > wtf || (tf == wtf && doc < wdoc)) {
              h.dequeue(); h.enqueue((tf, doc))
            }
          }
        }
        best.iterator.flatMap { case (w, h) =>
          h.iterator.map { case (tf, doc) => (w, doc, tf) }
        }
      }.toDF("word", "doc", "tf")
    val w = Window.partitionBy(col("word"))
      .orderBy(col("tf").desc, col("doc"))
    candidates.withColumn("rk", row_number().over(w))
      .where(col("rk") <= p)
  }

  /** The queryable index: per term, document frequency, collection
    * frequency, and the top-P postings serialized "doc:tf,…" in
    * (tf DESC, doc ASC) order. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    topP: Int): DataFrame = {
    val posts = postings(docs, idCol, textCol)
    val stats = posts.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val top = topPostingsPerTerm(posts, topP)
      .select(col("word"), col("rk"),
        concat(col("doc"), lit(":"), col("tf")).as("entry"))
      .groupBy(col("word"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rk"), col("entry")))),
        x => x.getField("entry")), ",").as("postings"))
    stats.join(top, Seq("word"))
  }

  /** BM25 top-k retrieval for one query (a bag of terms). Rational
    * idf (N/df — same convention as the TF-IDF operator: monotone in
    * the classic log idf, transcendental-free so both engines compute
    * the identical double). Per-(doc, term) contribution:
    *   round(idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), 6)
    * summed per doc as DECIMAL(28,6) — exact and order-independent —
    * then ranked. Corpus stats (N, avgdl) ride a broadcast 1-row
    * cross join; the term filter prunes the postings scan before any
    * shuffle. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k1: Double, b: Double,
               topK: Int): DataFrame = {
    val dl = docs.select(col(idCol).as("doc"),
      graft.functions.TextFns.tokenCount(col(textCol)).cast("double").as("dl"))
    // exact mean doc length: decimal sum / count, cast once
    val stats = dl.agg(
      (sum(col("dl").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val matched = postings(docs, idCol, textCol)
      .where(col("word").isin(queryTerms: _*))
    val df = matched.groupBy(col("word"))
      .agg(count(lit(1)).cast("double").as("df"))
    val contrib = matched
      .join(broadcast(df), Seq("word"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
      .select(col("doc"), round(
        (col("n") / col("df")) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
        6).as("c"))
    contrib.groupBy(col("doc"))
      .agg(round(sum(col("c").cast(DecimalType(28, 6))).cast("double"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(topK)
  }
}
