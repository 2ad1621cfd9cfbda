package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns

/** Batch sessionization (the lag/cumulative-sum idiom, oracle-exact —
  * complements the stateful streaming q_sessionize which emits only
  * watermark-closed sessions) and the remaining sampling strategies
  * (entropy, margin) with real per-strategy metrics.
  */
object SessionQueries extends QueryModule {

  /** Sessions = runs of per-user events with gaps ≤ 30 min: lag marks
    * session starts, a running sum numbers them, then a grouped
    * aggregate per session. One shuffle on user_id total. */
  private def qSessionizeBatch(implicit s: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new", when(col("_prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("_prev")) > 1800L * 1000000L,
        1L).otherwise(0L))
      .withColumn("sess_id", sum(col("_new")).over(wc))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).as("sess_start"),
        date_trunc("second", max(col("ts"))).as("sess_end"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  private val qSessionizeBatchSql =
    """WITH m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, SUM(new_sess) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM m)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
      |  date_trunc('second', MIN(ts)) AS sess_start,
      |  date_trunc('second', MAX(ts)) AS sess_end
      |FROM s GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin

  /** The same sessions through the BUILT-IN `session_window` grouping
    * (Spark's native merging session windows) — the declarative
    * sibling of the lag/cumsum idiom above and of the stateful
    * streaming q_sessionize. Semantics note: `session_window` windows
    * are end-exclusive (`[first, last + gap)`), so a gap of exactly
    * 30 min starts a NEW session — the oracle's `>=`; the lag/cumsum
    * query keeps `>` (same-session at exact equality) and its own
    * oracle. */
  private def qSessionWindow(implicit s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_trunc("second", col("sw.start")).as("sess_start"),
        date_trunc("second", col("sw.end")).as("sess_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))

  private val qSessionWindowSql =
    """WITH m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, SUM(new_sess) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM m)
      |SELECT user_id,
      |  date_trunc('second', MIN(ts)) AS sess_start,
      |  date_trunc('second', MAX(ts) + INTERVAL 30 MINUTE) AS sess_end,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  /** Streaming twin of the built-in session window (watermarked
    * merging-session state), checked against the SAME oracle. */
  private def qStreamSession(implicit s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.streamingSessionWindow(s, dir)
      .orderBy(col("user_id"), col("sess_start"))

  // ------------------------------------------------- entropy sampling
  /** EntropySampling (reference K2): entropy of the per-language
    * marker-hit distribution; most-uncertain (highest entropy) docs
    * first. */
  private def qSampleEntropy(implicit s: SparkSession, dir: String): DataFrame = {
    val hits = TextFns.LangMarkers.map { case (l, ms) =>
      TextFns.langMarkerHits(col("text"), ms).cast("double").as(s"s_$l")
    }
    val scored = Tables.documents(s, dir).select(col("doc_id") +: hits: _*)
    val total = TextFns.LangMarkers.map(m => col(s"s_${m._1}")).reduce(_ + _)
    val entropy = TextFns.LangMarkers.map { case (l, _) =>
      val p = col(s"s_$l") / col("_total")
      when(col(s"s_$l") > 0, -p * log(p)).otherwise(lit(0.0))
    }.reduce(_ + _)
    scored.withColumn("_total", total)
      .where(col("_total") > 0)
      .withColumn("entropy", round(entropy, 6))
      .orderBy(col("entropy").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("entropy"))
      .orderBy(col("doc_id"))
  }

  private val qSampleEntropySql = {
    def hitsSql(markers: Seq[String]) = markers.map { w =>
      s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2}"
    }.mkString(" + ")
    val scores = TextFns.LangMarkers
      .map { case (l, ms) => s"CAST(${hitsSql(ms)} AS DOUBLE) AS s_$l" }
      .mkString(", ")
    val langs = TextFns.LangMarkers.map(_._1)
    val total = langs.map("s_" + _).mkString(" + ")
    val entropy = langs.map { l =>
      s"CASE WHEN s_$l > 0 THEN -(s_$l / _total) * ln(s_$l / _total) ELSE 0.0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, entropy FROM (
       |  SELECT doc_id, round($entropy, 6) AS entropy FROM (
       |    SELECT doc_id, ($total) AS _total, ${langs.map("s_" + _).mkString(", ")} FROM (
       |      SELECT doc_id, $scores FROM documents))
       |  WHERE _total > 0
       |  ORDER BY entropy DESC, doc_id LIMIT 50)
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------- margin sampling
  /** MarginSampling (reference K2): smallest margin between the two
    * leading class scores (en vs es markers here) = most ambiguous. */
  private def qSampleMargin(implicit s: SparkSession, dir: String): DataFrame = {
    val sEn = TextFns.langMarkerHits(col("text"), TextFns.LangMarkers.head._2)
    val sEs = TextFns.langMarkerHits(col("text"), TextFns.LangMarkers(1)._2)
    Tables.documents(s, dir)
      .select(col("doc_id"), abs(sEn - sEs).cast("long").as("margin"))
      .orderBy(col("margin"), col("doc_id"))
      .limit(50)
      .orderBy(col("doc_id"))
  }

  private val qSampleMarginSql = {
    def hitsSql(markers: Seq[String]) = markers.map { w =>
      s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2}"
    }.mkString(" + ")
    val en = hitsSql(TextFns.LangMarkers.head._2)
    val es = hitsSql(TextFns.LangMarkers(1)._2)
    s"""SELECT doc_id, margin FROM (
       |  SELECT doc_id, CAST(abs(($en) - ($es)) AS BIGINT) AS margin
       |  FROM documents ORDER BY margin, doc_id LIMIT 50)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------- stratified sampling
  /** Stratified (proportional) sampling: 10% per language stratum,
    * deterministic via the md5 shuffle order ([[TextFns]] docs; same
    * hex both engines). One window per stratum — at scale the strata
    * are independent partitions, no global sort. */
  /** 10% per language, hash-ordered — since r7 via the bucket-
    * decomposed [[graft.operators.Selection.stratifiedFractionSample]]
    * (strata×256-way parallel windows instead of one hot reducer per
    * language); the oracle still replays the single-window form, and
    * the unchanged hash gate is the refactor's row-identity proof. */
  private def qSampleStratified(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.stratifiedFractionSample(
        Tables.documents(s, dir).select(col("lang"), col("doc_id")),
        "lang", "doc_id", 0.1)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  private val qSampleStratifiedSql =
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents)
      |WHERE rn <= ceil(cnt * 0.1)
      |ORDER BY lang, doc_id""".stripMargin

  // -------------------------------------------------- funnel analysis
  /** Classic ordered funnel: view → click → purchase, each step the
    * user's FIRST qualifying event strictly after the previous step
    * and within 7 days of it. Three user-keyed join+min-agg stages —
    * the per-step frames shrink monotonically, every shuffle is on
    * user_id, and no window touches the raw event stream. Output is
    * the one-row funnel report (counts are integers — exact). */
  private def qEventFunnel(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    ev.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  private val qEventFunnelSql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1
      |    AND e.ts <= v.t1 + INTERVAL 7 DAY
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |    AND e.ts <= c.t2 + INTERVAL 7 DAY
      |  GROUP BY e.user_id)
      |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_view_click,
      |  (SELECT COUNT(*) FROM p) AS n_full_funnel""".stripMargin

  // ---------------------------------------- stream-static enrichment
  /** Stream–static broadcast enrichment
    * ([[graft.streaming.EventStreams.streamingEnriched]] scaladoc):
    * arriving events joined map-side against the per-user cohort
    * dimension, then aggregated statefully; the batch oracle replays
    * join + group over the same rows. */
  private def qStreamEnrich(implicit s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.streamingEnriched(s, dir)
      .orderBy(col("cohort_day"), col("event_type"))

  private val qStreamEnrichSql =
    """WITH c AS (
      |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      |  FROM events GROUP BY user_id)
      |SELECT c.cohort_day, e.event_type, COUNT(*) AS n,
      |  CAST(round(SUM(CAST(e.value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_value
      |FROM events e JOIN c ON c.user_id = e.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------- weighted sampling
  /** Weighted sampling without replacement, probability ∝ n_chars —
    * sampling by data MASS rather than document count (the corpus-
    * mixture idiom). Efraimidis–Spirakis exponential keys over the
    * deterministic md5-h15 uniform; the oracle replays the identical
    * key formula, and the engine side is one TakeOrdered top-k
    * ([[graft.operators.Selection.weightedSample]] scaladoc). */
  private val WsK = 100
  private val WsSeed = 77L
  private def qSampleWeighted(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.Selection.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "n_chars", WsK, WsSeed)
      .orderBy(col("doc_id"))

  private val qSampleWeightedSql = {
    val h15 = graft.operators.Scorers.ProxyBackend
      .h15Sql(WsSeed, "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars,
       |    ln((CAST($h15 AS DOUBLE) + 1.0) / 1152921504606846976.0)
       |      / CAST(n_chars AS DOUBLE) AS es_key
       |  FROM documents
       |  ORDER BY es_key DESC, doc_id LIMIT $WsK)
       |ORDER BY doc_id""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q_sessionize_batch", (s, d) => qSessionizeBatch(s, d), Some(qSessionizeBatchSql)),
    Q("q_sample_weighted", (s, d) => qSampleWeighted(s, d), Some(qSampleWeightedSql)),
    Q("q_event_funnel", (s, d) => qEventFunnel(s, d), Some(qEventFunnelSql)),
    Q("q_session_window", (s, d) => qSessionWindow(s, d), Some(qSessionWindowSql)),
    Q("q_stream_session", (s, d) => qStreamSession(s, d), Some(qSessionWindowSql)),
    Q("q_stream_enrich", (s, d) => qStreamEnrich(s, d), Some(qStreamEnrichSql)),
    Q("q_sample_stratified", (s, d) => qSampleStratified(s, d), Some(qSampleStratifiedSql)),
    Q("q_sample_entropy", (s, d) => qSampleEntropy(s, d), Some(qSampleEntropySql)),
    Q("q_sample_margin", (s, d) => qSampleMargin(s, d), Some(qSampleMarginSql)))
}
