package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Merge}

/** Lake-lifecycle and corpus-observability surfaces: snapshot diff
  * (CDC between two corpus versions), keyed MERGE-upsert with a real
  * write-back round trip, schema-evolution reads, time-series
  * gap-filling, per-group exact outlier detection, cross-source
  * shingle contamination, and a one-pass data-quality constraint
  * report — the operations a corpus pipeline runs BETWEEN the query
  * workloads the other modules cover.
  *
  * Two deterministic corpus versions are derived from the `documents`
  * fixture (shared by the diff and merge gates, replayed verbatim by
  * their oracles):
  *  - v0 ("yesterday"): rows with `doc_id % 13 != 0`;
  *  - v1 ("today"): rows with `doc_id % 17 != 0`, where rows with
  *    `doc_id % 11 == 0` carry an edited payload (`text || ' v2'` —
  *    ASCII concat, identical in both engines; upper/locale tricks
  *    are deliberately avoided: Java and DuckDB disagree on ß→SS).
  * So v1-only ids are adds, v0-only ids are removes, `% 11` ids
  * present in both are changes.
  */
object LakeQueries extends QueryModule {

  /** Planted-variant id offset for [[qDedupCanonical]]: a single high
    * bit keeps variant ids disjoint from real doc_ids at ANY scale
    * factor (2^40 ≫ any fixture's max id; a decimal 1e6 offset would
    * collide once doc_id reaches a million). Declared FIRST — object
    * vals initialize in declaration order and the oracle-SQL val
    * below interpolates it. */
  private val VariantIdOffset = 1L << 40

  private def docs(implicit s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  private def snapV0(implicit s: SparkSession, dir: String): DataFrame =
    docs.where(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"))

  private def snapV1(implicit s: SparkSession, dir: String): DataFrame =
    docs.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"))

  private val snapCtes =
    """v0 AS (
      |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 13 <> 0),
      |v1 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text,
      |    lang
      |  FROM documents WHERE doc_id % 17 <> 0)""".stripMargin

  // ------------------------------------------------- snapshot diff
  /** Change-data-capture between corpus v0 and v1: classify every key
    * as added / removed / changed / unchanged and publish the per-
    * status accounting (count + exact id checksum). The 100 TB
    * posture is [[Merge.snapshotDiff]]'s: both sides project to
    * (key, md5) before the full-outer join, so only digests shuffle,
    * and the join co-partitions on the key. */
  private def qCorpusDiff(implicit s: SparkSession, dir: String): DataFrame =
    Merge.snapshotDiff(snapV0, snapV1, "doc_id", "text")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("status"))

  private val qCorpusDiffSql =
    s"""WITH $snapCtes,
       |d AS (
       |  SELECT coalesce(v0.doc_id, v1.doc_id) AS doc_id,
       |    CASE WHEN v0.doc_id IS NULL THEN 'added'
       |         WHEN v1.doc_id IS NULL THEN 'removed'
       |         WHEN md5(v0.text) <> md5(v1.text) THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id)
       |SELECT status, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
       |FROM d GROUP BY status ORDER BY status""".stripMargin

  // -------------------------------------------------- MERGE upsert
  /** MERGE INTO semantics on plain parquet: v0 persisted as the base
    * table, a delta of edits + inserts applied via
    * [[Merge.keyedUpsert]] (delta wins), the merged snapshot WRITTEN
    * BACK and the summary read FROM DISK — the oracle replays the
    * union/anti-join semantics over the original table, so a defect
    * anywhere in the write → scan round trip breaks the hash gate.
    * Delta = v1 rows whose id is `% 11` (edits) or `% 13` (inserts —
    * absent from v0 by construction). */
  private def qMergeUpsert(implicit s: SparkSession, dir: String): DataFrame = {
    val delta = snapV1.where(col("doc_id") % 11 === 0 || col("doc_id") % 13 === 0)
    val merged = Merge.keyedUpsert(snapV0, delta, "doc_id")
    val out = graft.core.Scratch.pathFor("merged", dir)
    merged.write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        sum(length(col("text"))).as("chars_total"))
      .orderBy(col("lang"))
  }

  private val qMergeUpsertSql =
    s"""WITH $snapCtes,
       |delta AS (
       |  SELECT * FROM v1 WHERE doc_id % 11 = 0 OR doc_id % 13 = 0),
       |merged AS (
       |  SELECT * FROM delta
       |  UNION ALL
       |  SELECT * FROM v0 WHERE NOT EXISTS (
       |    SELECT 1 FROM delta WHERE delta.doc_id = v0.doc_id))
       |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       |  CAST(SUM(length(text)) AS BIGINT) AS chars_total
       |FROM merged GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------- schema evolution
  /** Additive schema evolution across parquet drops: day-0 files
    * carry (doc_id, lang, text), day-1 files add an `n_tokens`
    * column; `mergeSchema=true` reads both generations as one
    * relation with nulls for the pre-evolution rows — the
    * read-the-old-files-forever contract a 100 TB lake depends on
    * (rewriting history to backfill a column is not an option).
    * Both generations are REAL files written by this query; the
    * oracle replays the union-with-nulls semantics from the fixture
    * table. */
  private def qSchemaEvolution(implicit s: SparkSession, dir: String): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val root = graft.core.Scratch.pathFor("evolved", dir)
    base.where(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$root/day0")
    base.where(col("doc_id") % 2 =!= 0)
      .withColumn("n_tokens", size(TextFns.tokens(col("text"))).cast("long"))
      .write.mode("overwrite").parquet(s"$root/day1")
    s.read.option("mergeSchema", "true").parquet(s"$root/day0", s"$root/day1")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("n_tokens")).as("n_with_tokens"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tokens_total"))
      .orderBy(col("lang"))
  }

  private val qSchemaEvolutionSql =
    """WITH gens AS (
      |  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_tokens
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |  FROM documents WHERE doc_id % 2 <> 0)
      |SELECT lang, COUNT(*) AS n_docs, COUNT(n_tokens) AS n_with_tokens,
      |  CAST(coalesce(SUM(n_tokens), 0) AS BIGINT) AS tokens_total
      |FROM gens GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------- gap filling
  /** Zero-filled hourly series per event type: the dense time spine a
    * forecast/monitoring consumer needs (a missing hour must read as
    * 0, not as an absent row). The spine is GENERATED per group from
    * that group's own min/max hour (`sequence` + `explode`) — no
    * driver loop, no global calendar table — and the left join back
    * to the sparse counts is (type, hour)-keyed. At scale the spine
    * is metadata-sized (groups × hours) while the raw stream is not;
    * only the pre-aggregated counts shuffle. */
  private def qGapfill(implicit s: SparkSession, dir: String): DataFrame =
    denseHourly(s, dir).orderBy(col("event_type"), col("hour"))

  /** The zero-filled series itself, shared with `q_moving_avg`
    * ([[StatsQueries]]) which smooths it. */
  private[queries] def denseHourly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
    val counts = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("hour"))
    spine.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** [[qGapfill]]'s spine generated by a RECURSIVE CTE (the Spark-4
    * `WITH RECURSIVE` surface) instead of `sequence()`: the anchor is
    * each group's (min, max) hour, the recursive step advances one
    * DAY while below the group max, and each day row fans out its 24
    * clipped hours through a PARALLEL `explode` — the scale-correct
    * recursion shape: iterative depth ∝ range/step (30 levels for the
    * fixture's 30-day window, constant across SFs since the event
    * window doesn't grow with corpus size), fan-out handled by the
    * data-parallel engine, not the recursion loop (an hour-stepped
    * recursion measured 24× the iterations and ~2.5 s at sf0.1; this
    * shape runs sub-second). `MAX RECURSION LEVEL` raises the guard
    * in the query itself, no session conf. Gated by the IDENTICAL
    * oracle as `q_gapfill` — the two spine constructions must agree
    * row-for-row. */
  private def qGapfillRcte(implicit s: SparkSession, dir: String): DataFrame =
    gapfillRcteOver(s, Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour")))

  /** The recursive spine over any (event_type, hour) frame — shared
    * with RcteDepthSpec, which drives it over a MULTI-YEAR synthetic
    * span (depth ~1100 day-levels from a handful of input rows) to
    * prove the iteration count tracks range/step, never row count. */
  private[graft] def gapfillRcteOver(s: SparkSession, hours: DataFrame): DataFrame = {
    val v = "ev_hours_" + java.lang.Long.toHexString(
      java.util.UUID.randomUUID.getMostSignificantBits)
    hours.createOrReplaceTempView(v)
    s.sql(
      s"""WITH RECURSIVE days(event_type, d, mx) MAX RECURSION LEVEL 5000 AS (
         |  SELECT event_type, MIN(hour), MAX(hour) FROM $v GROUP BY event_type
         |  UNION ALL
         |  SELECT event_type, d + INTERVAL 24 HOUR, mx FROM days
         |  WHERE d + INTERVAL 24 HOUR <= mx),
         |spine AS (
         |  SELECT event_type,
         |    explode(sequence(d, least(d + INTERVAL 23 HOUR, mx),
         |      INTERVAL 1 HOUR)) AS hour
         |  FROM days),
         |c AS (SELECT event_type, hour, COUNT(*) AS n FROM $v GROUP BY 1, 2)
         |SELECT s.event_type, s.hour, coalesce(c.n, CAST(0 AS BIGINT)) AS n_events
         |FROM spine s LEFT JOIN c ON c.event_type = s.event_type AND c.hour = s.hour
         |ORDER BY s.event_type, s.hour""".stripMargin)
  }

  private val qGapfillSql =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour FROM events),
      |c AS (SELECT event_type, hour, COUNT(*) AS n FROM h GROUP BY 1, 2),
      |b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM h GROUP BY 1),
      |s AS (
      |  SELECT event_type,
      |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
      |  FROM b)
      |SELECT s.event_type, s.hour, coalesce(c.n, 0) AS n_events
      |FROM s LEFT JOIN c ON c.event_type = s.event_type AND c.hour = s.hour
      |ORDER BY s.event_type, s.hour""".stripMargin

  // --------------------------------------------- outlier detection
  /** Per-source exact z-score outliers over document length — the
    * anomaly sweep that flags a crawler gone wrong before its output
    * trains. Determinism recipe: the group moments are EXACT integer
    * sums (sum, sum-of-squares, count over BIGINT — no float
    * accumulation order), and both engines then apply the identical
    * double formula, so the z-scores are bit-identical before the
    * defensive round. Two passes, stats broadcast back — no window
    * over the corpus, groups never co-resident. */
  private val ZThreshold = 1.8
  private def qOutlierZscore(implicit s: SparkSession, dir: String): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"), col("n_chars"))
    val stats = d.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"),
        count(lit(1)).as("cnt"))
    val mean = col("s1").cast("double") / col("cnt")
    val variance = col("s2").cast("double") / col("cnt") - mean * mean
    d.join(broadcast(stats), "source")
      .where(variance > 0)
      .withColumn("z", (col("n_chars") - mean) / sqrt(variance))
      .where(abs(col("z")) > ZThreshold)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("z"), 6).as("z"))
      .orderBy(col("doc_id"))
  }

  private val qOutlierZscoreSql =
    s"""WITH st AS (
       |  SELECT source, SUM(n_chars) AS s1, SUM(n_chars * n_chars) AS s2,
       |    COUNT(*) AS cnt
       |  FROM documents GROUP BY source)
       |SELECT doc_id, source, n_chars, round(z, 6) AS z FROM (
       |  SELECT d.doc_id, d.source, d.n_chars,
       |    (d.n_chars - CAST(s1 AS DOUBLE) / cnt)
       |      / sqrt(CAST(s2 AS DOUBLE) / cnt
       |             - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt)) AS z
       |  FROM documents d JOIN st ON st.source = d.source
       |  WHERE CAST(s2 AS DOUBLE) / cnt
       |        - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt) > 0)
       |WHERE abs(z) > $ZThreshold
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- cross-source overlap
  /** Pairwise source-level contamination: exact 3-gram shingle
    * Jaccard between every pair of sources — the corpus-vs-corpus
    * overlap matrix that decides whether two crawls are independent
    * before they are mixed. Shape: after `(source, shingle)` DISTINCT
    * each shingle joins at most #sources rows, so the shingle-keyed
    * self-join fans out ≤ C(sources, 2) per key regardless of corpus
    * size — pair costs track the VOCABULARY, not the corpus, and the
    * per-source sizes broadcast. */
  private def qCorpusOverlap(implicit s: SparkSession, dir: String): DataFrame = {
    val ex = docs.select(col("source"),
      explode(TextFns.shinglesDistinct(col("text"), 3)).as("sh")).distinct()
    val sizes = ex.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** [[qCorpusOverlap]] answered from SKETCHES — the theta-sketch
    * composition of the KMV machinery (`operators/Sketches`): one
    * k-value sketch per source, then every pairwise overlap estimated
    * from the sketches alone. θ = min of the two sketches' k-th
    * minima (2^60 when a sketch holds its whole set — the estimate
    * degrades to exact); candidates below θ are a uniform sample of
    * the union, so |A∩B| ≈ n_common·2^60/θ and Jaccard ≈
    * n_common/n_union. Every step is integer set algebra plus one
    * mirrored IEEE division, so the DuckDB twin hash-matches the
    * ESTIMATES. Where the exact operator's pair cost tracks the
    * vocabulary, this one's tracks k·sources² — at 100 TB the
    * sketches are built in one pass (the same WindowGroupLimit
    * partial top-k as `q_kmv_distinct`) and the overlap matrix is
    * computed WITHOUT ever joining corpora; `LakeSpec` bounds the
    * estimate against the exact Jaccard. */
  private def qKmvOverlap(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    import org.apache.spark.sql.expressions.Window
    val K = 512
    val full = lit(1152921504606846976L) // 2^60: complete-sketch theta
    val hv = docs.select(col("source"),
        explode(TextFns.shinglesDistinct(col("text"), 3)).as("sh"))
      .select(col("source"), Sketches.kmvHash(col("sh")).as("hv")).distinct()
    val w = Window.partitionBy(col("source")).orderBy(col("hv"))
    val sk = graft.core.Caches.track(
      hv.withColumn("_rn", row_number().over(w)).where(col("_rn") <= K)
        .select(col("source"), col("hv")))
    val thetas = sk.groupBy(col("source"))
      .agg(count(lit(1)).as("k_got"), max(col("hv")).as("kth"))
      .select(col("source"),
        when(col("k_got") < K, full).otherwise(col("kth")).as("theta"))
    val pairs = thetas.select(col("source").as("src_a"), col("theta").as("th_a"))
      .crossJoin(thetas.select(col("source").as("src_b"), col("theta").as("th_b")))
      .where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        least(col("th_a"), col("th_b")).as("theta"))
    val a = sk.select(col("source").as("src_a"), col("hv"))
    val b = sk.select(col("source").as("src_b"), col("hv"))
    val common = a.join(b, "hv")
      .join(pairs, Seq("src_a", "src_b"))
      .where(col("hv") < col("theta"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_common"))
    val union = pairs.join(a, "src_a").select(col("src_a"), col("src_b"), col("theta"), col("hv"))
      .union(pairs.join(b, "src_b").select(col("src_a"), col("src_b"), col("theta"), col("hv")))
      .where(col("hv") < col("theta"))
      .dropDuplicates("src_a", "src_b", "hv")
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_union"))
    pairs.join(union, Seq("src_a", "src_b"), "left")
      .join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("theta"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_union"), lit(0L)).as("n_union"))
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_union"),
        floor(col("n_common").cast("double") * lit(1152921504606846976.0)
          / col("theta").cast("double")).cast("long").as("est_intersect"),
        (floor(col("n_common").cast("double") / col("n_union").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("jaccard_est"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val qKmvOverlapSql = {
    val h = graft.operators.Sketches.kmvHashSql("sh")
    s"""WITH toks AS (
       |  SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sets AS (
       |  SELECT source,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |      ELSE list_transform(range(1, len(t) - 1),
       |             i -> array_to_string(list_slice(t, i, i + 2), ' ')) END AS shset
       |  FROM toks),
       |shx AS (SELECT DISTINCT source, unnest(shset) AS sh FROM sets),
       |hv AS (SELECT DISTINCT source, $h AS hv FROM shx),
       |sk AS (
       |  SELECT source, hv FROM (
       |    SELECT source, hv,
       |      row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
       |    FROM hv) WHERE rn <= 512),
       |thetas AS (
       |  SELECT source,
       |    CASE WHEN COUNT(*) < 512 THEN 1152921504606846976
       |         ELSE MAX(hv) END AS theta
       |  FROM sk GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    least(a.theta, b.theta) AS theta
       |  FROM thetas a CROSS JOIN thetas b WHERE a.source < b.source),
       |common AS (
       |  SELECT p.src_a, p.src_b, COUNT(*) AS n_common
       |  FROM sk a JOIN sk b ON a.hv = b.hv
       |  JOIN pairs p ON p.src_a = a.source AND p.src_b = b.source
       |  WHERE a.hv < p.theta GROUP BY 1, 2),
       |un AS (
       |  SELECT src_a, src_b, COUNT(*) AS n_union FROM (
       |    SELECT DISTINCT src_a, src_b, hv FROM (
       |      SELECT p.src_a, p.src_b, s.hv, p.theta
       |      FROM pairs p JOIN sk s ON s.source = p.src_a
       |      UNION ALL
       |      SELECT p.src_a, p.src_b, s.hv, p.theta
       |      FROM pairs p JOIN sk s ON s.source = p.src_b)
       |    WHERE hv < theta) GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |  COALESCE(c.n_common, 0) AS n_common,
       |  COALESCE(u.n_union, 0) AS n_union,
       |  CAST(floor(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
       |    * 1152921504606846976.0 / CAST(p.theta AS DOUBLE)) AS BIGINT)
       |    AS est_intersect,
       |  floor(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
       |    / CAST(COALESCE(u.n_union, 0) AS DOUBLE) * 1000000.0 + 0.5)
       |    / 1000000.0 AS jaccard_est
       |FROM pairs p
       |LEFT JOIN un u ON u.src_a = p.src_a AND u.src_b = p.src_b
       |LEFT JOIN common c ON c.src_a = p.src_a AND c.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin
  }

  private val qCorpusOverlapSql =
    """WITH toks AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sets AS (
      |  SELECT source,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |      ELSE list_transform(range(1, len(t) - 1),
      |             i -> array_to_string(list_slice(t, i, i + 2), ' ')) END AS shset
      |  FROM toks),
      |ex AS (SELECT DISTINCT source, unnest(shset) AS sh FROM sets),
      |sizes AS (SELECT source, COUNT(*) AS n FROM ex GROUP BY 1),
      |shared AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_shared,
      |  round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS jaccard
      |FROM shared
      |JOIN sizes sa ON sa.source = src_a
      |JOIN sizes sb ON sb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin

  // ------------------------------------------- CDC → view apply
  /** Change-data-capture PROPAGATION: the downstream per-language
    * aggregate view of corpus v0 is PERSISTED, v0→v1 changes are
    * classified by [[Merge.snapshotDiff]], and only the changed keys
    * are joined back for their measures — the stored view absorbs
    * the per-language deltas through [[Merge.additiveMerge]] and
    * must equal recomputing the view over v1 from scratch (the
    * oracle). At 100 TB the unchanged bulk of the corpus is touched
    * only by the digest-projected diff join; the measure join and
    * the view merge are delta-sized. */
  private def qCdcApply(implicit s: SparkSession, dir: String): DataFrame = {
    def measures(df: DataFrame) = df.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("chars"))
    def view(df: DataFrame) = measures(df).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("chars_total"))
    val out = graft.core.Scratch.pathFor("cdcview", dir)
    view(snapV0).write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out)
    val changed = Merge.snapshotDiff(snapV0, snapV1, "doc_id", "text")
      .where(col("status") =!= "unchanged")
    val deltas = changed
      .join(measures(snapV0).select(col("doc_id"),
        col("lang").as("_l0"), col("chars").as("_c0")), Seq("doc_id"), "left")
      .join(measures(snapV1).select(col("doc_id"),
        col("lang").as("_l1"), col("chars").as("_c1")), Seq("doc_id"), "left")
      .select(coalesce(col("_l1"), col("_l0")).as("lang"),
        (when(col("_l1").isNotNull, 1L).otherwise(0L) -
         when(col("_l0").isNotNull, 1L).otherwise(0L)).as("n_docs"),
        (coalesce(col("_c1"), lit(0L)) - coalesce(col("_c0"), lit(0L)))
          .as("chars_total"))
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("chars_total")).as("chars_total"))
    Merge.additiveMerge(stored.unionByName(deltas),
        Seq("lang"), Seq("n_docs", "chars_total"))
      .where(col("n_docs") > 0)
      .orderBy(col("lang"))
  }

  private val qCdcApplySql =
    s"""WITH $snapCtes
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(length(text)) AS BIGINT) AS chars_total
       |FROM v1 GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------- incremental rollup (IVM)
  /** Incremental materialized-view maintenance: the daily
    * (event_type, day) rollup is PERSISTED up to a cutoff, and a new
    * day arrives as a delta — the maintained view is
    * `stored ∪ delta → re-sum` ([[Merge.additiveMerge]]), never a
    * re-scan of history. The gate's oracle is the FULL recompute
    * over all events, so the merge must be value-identical to
    * rebuilding the view from scratch; measures stay in
    * BIGINT/DECIMAL end-to-end (order-free), rounded once at the
    * edge. Both the history and delta scans filter on the raw `ts`
    * column, so each side's predicate reaches the parquet scan. */
  private val RollupCutoff = "2024-01-26 00:00:00"
  private def qRollupIncremental(implicit s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(RollupCutoff).cast("timestamp")
    def rollup(df: DataFrame): DataFrame = df
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,4)")).as("value_sum"))
    val ev = Tables.events(s, dir)
    val out = graft.core.Scratch.pathFor("rollup", dir)
    rollup(ev.where(col("ts") < cutoff)).write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out)
    val delta = rollup(ev.where(col("ts") >= cutoff))
    Merge.additiveMerge(stored.unionByName(delta),
        Seq("event_type", "day"), Seq("n", "value_sum"))
      .select(col("event_type"), col("day"), col("n"),
        round(col("value_sum"), 2).cast("double").as("total_value"))
      .orderBy(col("event_type"), col("day"))
  }

  private val qRollupIncrementalSql =
    """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |  CAST(round(SUM(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------- streaming rollup (IVM)
  /** The STREAMING deployment of the same maintained view
    * ([[graft.streaming.EventStreams.streamingRollup]] scaladoc):
    * micro-batches absorbed generation-per-batch via
    * [[Merge.additiveMerge]], replay-idempotent; the final
    * generation must equal the batch rollup over all events — the
    * SAME oracle as [[qRollupIncremental]]. */
  private def qStreamRollup(implicit s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.streamingRollup(s, dir)
      .orderBy(col("event_type"), col("day"))

  // ----------------------------------------------- unpivot (melt)
  /** Wide → long reshaping: the per-(source, lang) counts pivoted
    * wide (one column per language) and melted back with `unpivot` —
    * gated against the direct long-form aggregate, so the
    * pivot → unpivot round trip must be lossless (absent cells
    * surface as nulls and are dropped, restoring the original
    * sparse form). Pivot values are pinned to the known domain —
    * at scale an unpinned pivot needs a distinct-scan first. */
  private def qUnpivot(implicit s: SparkSession, dir: String): DataFrame = {
    val wide = docs.groupBy(col("source"))
      .pivot("lang", KnownLangs).agg(count(lit(1)))
    wide.unpivot(Array(col("source")), KnownLangs.map(col).toArray, "lang", "n")
      .where(col("n").isNotNull)
      .orderBy(col("source"), col("lang"))
  }

  private val qUnpivotSql =
    """SELECT source, lang, COUNT(*) AS n FROM documents
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------- canonical-form dedup
  /** Case/punctuation/whitespace-insensitive exact dedup: documents
    * are collapsed on their canonical comparison form
    * ([[TextFns.canonicalForm]]) rather than raw bytes — the
    * "same article, different formatting" tier between byte-exact
    * and MinHash near-dup. The gate plants a formatting variant of
    * EVERY document (leading whitespace + trailing punctuation,
    * shifted ids) and the canonical dedup must collapse each pair
    * back to its original id — raw exact dedup would keep all of
    * them. Same one-shuffle posture as [[Dedup.exactDedup]] (the
    * canonical form is a narrow projected column). */
  private def qDedupCanonical(implicit s: SparkSession, dir: String): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))
    // variant ids live in a disjoint high-bit range: a fixed decimal
    // offset (1e6) collides with real doc_ids at large SF and silently
    // corrupts the keeper accounting on BOTH engines at once
    val variants = base.select((col("doc_id") + VariantIdOffset).as("doc_id"),
      concat(lit("  "), col("text"), lit(" !!")).as("text"), col("lang"))
    val union = base.unionByName(variants)
      .withColumn("_canon", TextFns.canonicalForm(col("text")))
    val keepers = Dedup.exactDedup(union, "doc_id", Seq("_canon"))
    keepers.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_keepers"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))
  }

  private val qDedupCanonicalSql = {
    val canon = TextFns.canonicalFormSql("text")
    s"""WITH u AS (
       |  SELECT doc_id, text, lang FROM documents
       |  UNION ALL
       |  SELECT doc_id + $VariantIdOffset, '  ' || text || ' !!', lang FROM documents),
       |c AS (SELECT doc_id, lang, $canon AS canon FROM u),
       |k AS (SELECT MIN(doc_id) AS doc_id FROM c GROUP BY canon)
       |SELECT c.lang, COUNT(*) AS n_keepers,
       |  CAST(SUM(c.doc_id) AS BIGINT) AS id_sum
       |FROM c JOIN k ON k.doc_id = c.doc_id
       |GROUP BY c.lang ORDER BY c.lang""".stripMargin
  }

  // ----------------------------------------------- catalog stats
  /** ANALYZE-style catalog statistics sweep: one row per fixture
    * table with its row count — the statistics a cost-based
    * optimizer's join-size estimates feed on. Collected from parquet
    * FOOTERS, not data: the (table, file) list is distributed and
    * each task sums its files' row-group metadata — ONE Spark job
    * over a file-count-sized dataset, zero data pages read, the way
    * a 100 TB lake's ANALYZE actually runs (a `count(*)` scan per
    * table would read every page of every table; the default-off V2
    * aggregate pushdown is the conf-fragile alternative). Footer
    * counts are definitionally equal to scan counts, which the
    * oracle (a real COUNT(*) per table) re-proves every run. */
  private def qTableStats(implicit s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files: Seq[(String, String)] = Tables.All.flatMap { t =>
      val root = new org.apache.hadoop.fs.Path(
        Tables.readPath(s, s"$dir/$t.parquet"))
      val fs = root.getFileSystem(s.sessionState.newHadoopConf())
      // recursive walk: a partitioned/nested table layout (files under
      // key=value subdirectories) would be silently undercounted by a
      // single-level listStatus
      val leaves =
        if (fs.getFileStatus(root).isDirectory) {
          val it = fs.listFiles(root, true)
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (it.hasNext) {
            val p = it.next().getPath
            if (p.getName.endsWith(".parquet")) buf += p.toString
          }
          buf.toSeq.map(new org.apache.hadoop.fs.Path(_))
        } else Seq(root)
      leaves.map(p => t -> p.toString)
    }
    files.toDF("table_name", "path")
      .repartition(8)
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { r =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(r.getString(1)), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val n = try {
            import scala.jdk.CollectionConverters._
            reader.getRowGroups.asScala.map(_.getRowCount.toLong).sum
          } finally reader.close()
          (r.getString(0), n)
        }
      }.toDF("table_name", "n_file_rows")
      .groupBy(col("table_name"))
      .agg(sum(col("n_file_rows")).as("n_rows"))
      .orderBy(col("table_name"))
  }

  private val qTableStatsSql =
    Tables.All.map(t => s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")

  // --------------------------------------- bloom point lookup
  /** Point lookup on a high-cardinality UNSORTED key via parquet
    * column BLOOM FILTERS — the skipping mechanism when zone maps
    * are blind (every row group's min/max spans the key space) and
    * sorting for one lookup column is not on the table. The writer
    * embeds a per-row-group bloom on the key; the reader's row-group
    * filter consults it before touching data pages (`BloomSkipSpec`
    * measures the same lookup reading <1/4 of the plain layout's
    * rows). Oracle-exact sink → point-lookup round trip: the key is
    * md5 over the id, replayed identically by DuckDB. */
  private val BloomLookupId = 42L
  private def qBloomPointLookup(implicit s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.buildOnce("bloomkeyed", dir) { p =>
      docs.select(md5(col("doc_id").cast("string")).as("bkey"),
          col("doc_id"), col("lang"), col("n_chars"))
        .repartition(4).sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#bkey", "true")
        .option("parquet.bloom.filter.expected.ndv#bkey", "10000")
        .parquet(p)
    }
    s.read.parquet(out)
      .where(col("bkey") === md5(lit(BloomLookupId.toString)))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val qBloomPointLookupSql =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE md5(CAST(doc_id AS VARCHAR)) = md5('$BloomLookupId')
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------- data-quality constraints
  /** One-pass corpus validation report (the Deequ-style pre-training
    * gate): row volume, key uniqueness, null/empty payloads, domain
    * membership, and derived-column consistency, each published as a
    * (constraint, observed, passed) row. ONE aggregate scan computes
    * every metric (the distinct-count shares the same shuffle via
    * expand), then `stack` pivots the single metrics row into the
    * report — checking five more constraints at 100 TB costs zero
    * additional passes. */
  private val KnownLangs = Seq("de", "en", "es", "fr", "zh")
  private def qQualityConstraints(implicit s: SparkSession, dir: String): DataFrame =
    docs.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_ids"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        count(when(col("n_chars") <= 0, 1)).as("n_nonpos_chars"),
        count(when(!col("lang").isin(KnownLangs: _*), 1)).as("n_bad_lang"),
        count(when(col("n_chars") =!= length(col("text")), 1)).as("n_chars_drift"))
      .selectExpr(s"""stack(6,
        'doc_id_unique',        n_ids,          n_ids = n_rows,
        'lang_in_domain',       n_bad_lang,     n_bad_lang = 0,
        'n_chars_matches_text', n_chars_drift,  n_chars_drift = 0,
        'n_chars_positive',     n_nonpos_chars, n_nonpos_chars = 0,
        'row_count_min_100',    n_rows,         n_rows >= 100,
        'text_not_null',        n_null_text,    n_null_text = 0
      ) AS (rule, observed, passed)""")
      .orderBy(col("rule"))

  private val qQualityConstraintsSql = {
    val langList = KnownLangs.map(l => s"'$l'").mkString(", ")
    s"""WITH m AS (
       |  SELECT COUNT(*) AS n_rows,
       |    COUNT(DISTINCT doc_id) AS n_ids,
       |    COUNT(*) FILTER (WHERE text IS NULL) AS n_null_text,
       |    COUNT(*) FILTER (WHERE n_chars <= 0) AS n_nonpos_chars,
       |    COUNT(*) FILTER (WHERE lang NOT IN ($langList)) AS n_bad_lang,
       |    COUNT(*) FILTER (WHERE n_chars <> length(text)) AS n_chars_drift
       |  FROM documents)
       |SELECT * FROM (
       |  SELECT 'doc_id_unique' AS rule, n_ids AS observed,
       |    n_ids = n_rows AS passed FROM m
       |  UNION ALL
       |  SELECT 'lang_in_domain', n_bad_lang, n_bad_lang = 0 FROM m
       |  UNION ALL
       |  SELECT 'n_chars_matches_text', n_chars_drift, n_chars_drift = 0 FROM m
       |  UNION ALL
       |  SELECT 'n_chars_positive', n_nonpos_chars, n_nonpos_chars = 0 FROM m
       |  UNION ALL
       |  SELECT 'row_count_min_100', n_rows, n_rows >= 100 FROM m
       |  UNION ALL
       |  SELECT 'text_not_null', n_null_text, n_null_text = 0 FROM m)
       |ORDER BY rule""".stripMargin
  }

  // --------------------------------------- cost-based optimization
  /** The join predicates/filter/aggregate of the CBO probe, shared
    * verbatim by the Spark side (over ANALYZEd catalog tables) and
    * the DuckDB oracle (over the raw fixtures) — only the FROM-clause
    * qualification differs. The syntactic join order is DELIBERATELY
    * worst-first: fact ⋈ fact (lineitem ⋈ orders) before any
    * selective dimension. */
  private def cboJoinSql(qual: String): String =
    s"""SELECT n.n_name AS nation, COUNT(*) AS n_items,
       |  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
       |FROM ${qual}lineitem l
       |JOIN ${qual}orders o ON l.l_orderkey = o.o_orderkey
       |JOIN ${qual}customer c ON o.o_custkey = c.c_custkey
       |JOIN ${qual}nation n ON c.c_nationkey = n.n_nationkey
       |WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
       |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** Statistics-DRIVEN join ordering: the same revenue rollup as the
    * TPC-H family, but phrased with the WORST syntactic join order
    * (fact ⋈ fact first, the selective nation filter last) and run
    * over catalog tables that [[graft.core.CatalogStats]] has
    * ANALYZEd. With `spark.sql.cbo.enabled` +
    * `spark.sql.cbo.joinReorder.enabled` (session defaults) Catalyst's
    * cost-based reorder consumes the row-count/NDV statistics and
    * rebuilds the join tree dimension-first — the optimizer lever
    * `q_table_stats` collects numbers for, actually pulling weight.
    * PlanShapeSpec asserts the reorder happened (lineitem is NOT
    * joined first in the optimized plan, and the stats-less plan
    * keeps the syntactic order); this gate asserts the reordered
    * plan's RESULT is unchanged. At 100 TB the difference is a
    * petabyte-scale fact⋈fact shuffle vs a broadcast-pruned
    * dimension-first pipeline — the single highest-leverage decision
    * a distributed optimizer makes. */
  private def qCboJoinOrder(implicit s: SparkSession, dir: String): DataFrame = {
    val db = graft.core.CatalogStats.ensure(s, dir,
      Seq("lineitem", "orders", "customer", "nation"))
    s.sql(cboJoinSql(s"$db."))
  }

  private val qCboJoinOrderSql = cboJoinSql("")

  /** Statistics-DRIVEN join STRATEGY (the sibling decision to
    * [[qCboJoinOrder]]'s join ordering): customer filtered to a
    * narrow key band joined to orders. Whether the filtered side fits
    * under `spark.sql.autoBroadcastJoinThreshold` is knowable only
    * from ANALYZE column statistics — a raw parquet relation
    * estimates the Filter at the FULL file size (size-only stats
    * don't shrink through predicates), so Spark plans a sort-merge
    * join; with catalog min/max + NDV the estimate collapses to the
    * selected fraction and the planner flips to broadcast-hash.
    * PlanShapeSpec asserts exactly that flip (BroadcastHashJoin with
    * stats, SortMergeJoin without, same result both ways); this gate
    * asserts the result is oracle-exact. At 100 TB the flip deletes
    * the fact table's shuffle — the second-highest-leverage decision
    * after join order, and the one `q_table_stats`-style row counts
    * alone cannot make. */
  private def cboBroadcastSql(qual: String): String =
    s"""SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
       |  COUNT(*) AS n_orders,
       |  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_price
       |FROM ${qual}orders o
       |JOIN ${qual}customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_custkey < 100 AND c.c_mktsegment IN ('BUILDING', 'MACHINERY')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def qCboBroadcast(implicit s: SparkSession, dir: String): DataFrame = {
    val db = graft.core.CatalogStats.ensure(s, dir, Seq("orders", "customer"))
    s.sql(cboBroadcastSql(s"$db."))
  }

  private val qCboBroadcastSql = cboBroadcastSql("")

  override def queries: Seq[Q] = Seq(
    Q("q_cbo_join_order", (s, d) => qCboJoinOrder(s, d), Some(qCboJoinOrderSql)),
    Q("q_cbo_broadcast", (s, d) => qCboBroadcast(s, d), Some(qCboBroadcastSql)),
    Q("q_corpus_diff", (s, d) => qCorpusDiff(s, d), Some(qCorpusDiffSql)),
    Q("q_merge_upsert", (s, d) => qMergeUpsert(s, d), Some(qMergeUpsertSql)),
    Q("q_schema_evolution", (s, d) => qSchemaEvolution(s, d), Some(qSchemaEvolutionSql)),
    Q("q_gapfill", (s, d) => qGapfill(s, d), Some(qGapfillSql)),
    Q("q_gapfill_rcte", (s, d) => qGapfillRcte(s, d), Some(qGapfillSql)),
    Q("q_outlier_zscore", (s, d) => qOutlierZscore(s, d), Some(qOutlierZscoreSql)),
    Q("q_corpus_overlap", (s, d) => qCorpusOverlap(s, d), Some(qCorpusOverlapSql)),
    Q("q_kmv_overlap", (s, d) => qKmvOverlap(s, d), Some(qKmvOverlapSql)),
    Q("q_cdc_apply", (s, d) => qCdcApply(s, d), Some(qCdcApplySql)),
    Q("q_dedup_canonical", (s, d) => qDedupCanonical(s, d), Some(qDedupCanonicalSql)),
    Q("q_table_stats", (s, d) => qTableStats(s, d), Some(qTableStatsSql)),
    Q("q_rollup_incremental", (s, d) => qRollupIncremental(s, d), Some(qRollupIncrementalSql)),
    Q("q_stream_rollup", (s, d) => qStreamRollup(s, d), Some(qRollupIncrementalSql)),
    Q("q_unpivot", (s, d) => qUnpivot(s, d), Some(qUnpivotSql)),
    Q("q_quality_constraints", (s, d) => qQualityConstraints(s, d), Some(qQualityConstraintsSql)),
    Q("q_bloom_point_lookup", (s, d) => qBloomPointLookup(s, d), Some(qBloomPointLookupSql)))
}
