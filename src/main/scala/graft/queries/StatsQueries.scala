package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Statistical / time-series analytics over the corpus and the event
  * stream: smoothed dense series, cohort retention, equi-width
  * histograms, winsorized robust moments, and exact-sum Pearson
  * correlation. Every query follows the determinism recipe from
  * [[Q]]'s scaladoc — exact integer/DECIMAL accumulation wherever an
  * aggregate feeds arithmetic, one identical double formula on both
  * engines afterwards, a defensive terminal round.
  */
object StatsQueries extends QueryModule {

  // ------------------------------------------------ moving average
  /** Centered 7-hour moving average over the ZERO-FILLED hourly
    * series (a gap must pull the average down — computing the MA on
    * the sparse counts would silently skip missing hours). Window is
    * partitioned by event type and frame-bounded — at scale each
    * series is one partition of metadata-sized rows (hours), never
    * the raw stream. Sum over BIGINT counts is exact; one division
    * at the end. */
  private def qMovingAvg(implicit s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-3, 3)
    LakeQueries.denseHourly(s, dir)
      .withColumn("ma7",
        round(sum(col("n_events")).over(w).cast("double") /
          count(lit(1)).over(w), 6))
      .orderBy(col("event_type"), col("hour"))
  }

  private val qMovingAvgSql =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour FROM events),
      |c AS (SELECT event_type, hour, COUNT(*) AS n FROM h GROUP BY 1, 2),
      |b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM h GROUP BY 1),
      |s AS (
      |  SELECT event_type,
      |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
      |  FROM b),
      |dense AS (
      |  SELECT s.event_type, s.hour, coalesce(c.n, 0) AS n_events
      |  FROM s LEFT JOIN c ON c.event_type = s.event_type AND c.hour = s.hour)
      |SELECT event_type, hour, n_events,
      |  round(CAST(SUM(n_events) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS ma7
      |FROM dense
      |WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |ORDER BY event_type, hour""".stripMargin

  // --------------------------------------------- cohort retention
  /** Cohort retention matrix: users grouped by first-seen day, and
    * for each day-offset 0..7 the count of cohort users active that
    * day — the table every engagement dashboard is built on. The
    * first-seen aggregate and the events join both key on user_id
    * (one co-partitioned shuffle), then the matrix aggregate is
    * (cohort, offset)-keyed metadata. */
  private def qCohortRetention(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .where(col("offset").between(0, 7))
      .groupBy(col("cohort_day"), col("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("offset"))
  }

  private val qCohortRetentionSql =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT c.cohort_day, datediff('day', c.cohort_day, e.day) AS "offset",
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM ev e JOIN cohorts c ON c.user_id = e.user_id
      |WHERE datediff('day', c.cohort_day, e.day) BETWEEN 0 AND 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- histogram
  /** Equi-width histogram of document length per language over the
    * GLOBAL [min, max] (shared bins make languages comparable). The
    * 1-row bounds cross-join broadcasts; the bin id is a pure
    * projection (no per-group sort, unlike the equi-depth
    * `q_quantile_bucket`). Identical double width/floor arithmetic
    * both engines; the max value clamps into the last bin. */
  private val HistBins = 10
  private def qHistogram(implicit s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("lang"), col("n_chars"))
    val bounds = d.agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
    d.crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(floor((col("n_chars") - col("mn")).cast("double") /
          ((col("mx") - col("mn")).cast("double") / HistBins)),
          lit(HistBins - 1L)).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("bin"))
  }

  private val qHistogramSql =
    s"""WITH b AS (
       |  SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents)
       |SELECT lang,
       |  CAST(least(floor(CAST(n_chars - mn AS DOUBLE)
       |    / (CAST(mx - mn AS DOUBLE) / $HistBins)), ${HistBins - 1}) AS BIGINT) AS bin,
       |  COUNT(*) AS n
       |FROM documents CROSS JOIN b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- winsorization
  /** Per-source winsorized mean of document length: clip at the exact
    * [p05, p95] (linear-interpolated percentile — `percentile` ↔
    * `quantile_cont`, the established exact pair) and publish the
    * robust mean next to the clip accounting. Clipped values are
    * fractional, so their sum goes through DECIMAL (order-free) and
    * one final division + round. Two passes over each group, stats
    * joined back — sources never co-resident. */
  private def qWinsorize(implicit s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("source"), col("n_chars"))
    val th = d.groupBy(col("source")).agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"))
    d.join(broadcast(th), "source")
      .withColumn("w", least(greatest(col("n_chars").cast("double"), col("lo")), col("hi")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        round(first(col("lo")), 6).as("p05"),
        round(first(col("hi")), 6).as("p95"),
        count(when(col("n_chars") < col("lo"), 1)).as("n_clip_lo"),
        count(when(col("n_chars") > col("hi"), 1)).as("n_clip_hi"),
        round(sum(col("w").cast("decimal(28,10)")).cast("double") /
          count(lit(1)), 6).as("mean_winsorized"))
      .orderBy(col("source"))
  }

  private val qWinsorizeSql =
    """WITH th AS (
      |  SELECT source, quantile_cont(n_chars, 0.05) AS lo,
      |    quantile_cont(n_chars, 0.95) AS hi
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT d.source, d.n_chars, th.lo, th.hi,
      |    least(greatest(CAST(d.n_chars AS DOUBLE), th.lo), th.hi) AS w
      |  FROM documents d JOIN th ON th.source = d.source)
      |SELECT source, COUNT(*) AS n,
      |  round(ANY_VALUE(lo), 6) AS p05, round(ANY_VALUE(hi), 6) AS p95,
      |  COUNT(*) FILTER (WHERE n_chars < lo) AS n_clip_lo,
      |  COUNT(*) FILTER (WHERE n_chars > hi) AS n_clip_hi,
      |  round(CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6)
      |    AS mean_winsorized
      |FROM w GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- correlation
  /** Exact-sum Pearson correlation (quantity vs extended price per
    * return flag) — the order-free alternative to the builtin `corr`
    * (which accumulates doubles in merge order; see `q_stats_agg`'s
    * scaladoc). Per-row products are IEEE-deterministic doubles cast
    * to DECIMAL, so every SUM is addition-order-independent; both
    * engines then evaluate one identical double formula. */
  private def qCorrelation(implicit s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(28,6)")).cast("double")
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
      dsum(col("x") * col("x")).as("sxx"),
      dsum(col("y") * col("y")).as("syy"),
      dsum(col("x") * col("y")).as("sxy"))
    agg.select(col("l_returnflag"),
        col("n").cast("long").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("pearson_r"))
      .orderBy(col("l_returnflag"))
  }

  private val qCorrelationSql =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS pearson_r
      |FROM a ORDER BY l_returnflag""".stripMargin

  // --------------------------------- scalable exact grouped quantile
  /** Exact per-language median and p90 of document length WITHOUT a
    * per-group row sort ([[graft.operators.Quantiles]] scaladoc: value
    * histogram → ordered window over DISTINCT VALUES → rank-bracket
    * interpolation). The oracle is plain `quantile_cont` — the gate
    * proves the histogram path is bit-identical to sort-based
    * percentile semantics, while its window only ever sees the value
    * grid (≤ a few hundred rows per group here, domain-bounded at any
    * corpus size). */
  private def qMedianScalable(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantiles
    val d = Tables.documents(s, dir).select(col("lang"), col("n_chars"))
    val p50 = Quantiles.exactGroupedQuantile(d, "lang", "n_chars", 0.5)
      .select(col("lang"), round(col("q"), 6).as("p50"))
    val p90 = Quantiles.exactGroupedQuantile(d, "lang", "n_chars", 0.9)
      .select(col("lang"), round(col("q"), 6).as("p90"))
    p50.join(p90, "lang").orderBy(col("lang"))
  }

  private val qMedianScalableSql =
    """SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS p50,
      |  round(quantile_cont(n_chars, 0.9), 6) AS p90
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q_median_scalable", (s, d) => qMedianScalable(s, d), Some(qMedianScalableSql)),
    Q("q_moving_avg", (s, d) => qMovingAvg(s, d), Some(qMovingAvgSql)),
    Q("q_cohort_retention", (s, d) => qCohortRetention(s, d), Some(qCohortRetentionSql)),
    Q("q_histogram", (s, d) => qHistogram(s, d), Some(qHistogramSql)),
    Q("q_winsorize", (s, d) => qWinsorize(s, d), Some(qWinsorizeSql)),
    Q("q_correlation", (s, d) => qCorrelation(s, d), Some(qCorrelationSql)))
}
