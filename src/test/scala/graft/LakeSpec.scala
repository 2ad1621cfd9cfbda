package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Merge

/** Lake-lifecycle operators: snapshot diff, keyed upsert, schema
  * evolution, gap-fill, constraint report ([[graft.queries.LakeQueries]]). */
class LakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("snapshotDiff partitions every key into exactly one status") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val v0 = docs.where(col("doc_id") % 13 =!= 0)
    val v1 = docs.where(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val d = Merge.snapshotDiff(v0, v1, "doc_id", "text").cache()
    val byStatus = d.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n0 = v0.count(); val n1 = v1.count()
    // every v0 key and every v1 key accounted for, no key twice
    assert(d.count() === d.select("doc_id").distinct().count())
    assert(byStatus.getOrElse("removed", 0L) +
      byStatus.getOrElse("changed", 0L) +
      byStatus.getOrElse("unchanged", 0L) === n0)
    assert(byStatus.getOrElse("added", 0L) +
      byStatus.getOrElse("changed", 0L) +
      byStatus.getOrElse("unchanged", 0L) === n1)
    // the construction guarantees all four statuses are live
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(byStatus.keySet))
    d.unpersist()
  }

  test("snapshotDiff classifies NULL payloads by key presence, not hash nullness") {
    import spark.implicits._
    // (1) prev-only with NULL payload → removed (not 'added');
    // (2) NULL→text on the same key → changed; (3) text→NULL → changed;
    // (4) NULL→NULL → unchanged; (5) next-only NULL payload → added
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "x"),
      (4L, null: String)).toDF("id", "payload")
    val next = Seq((2L, "y"), (3L, null: String), (4L, null: String),
      (5L, null: String)).toDF("id", "payload")
    val got = Merge.snapshotDiff(prev, next, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("keyedUpsert: delta wins, non-delta base rows survive, inserts append") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val delta = Seq((2L, "B"), (4L, "d")).toDF("id", "v")
    val m = Merge.keyedUpsert(base, delta, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"))
  }

  test("gapfill emits a dense hourly spine with explicit zeros") {
    val g = graft.SparkEntry.queries("q_gapfill")(spark, dir).cache()
    val spans = g.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (unix_seconds(max(col("hour"))) - unix_seconds(min(col("hour"))))
          .divide(3600).cast("long").as("hours"))
      .collect()
    spans.foreach { r =>
      // dense: exactly span+1 rows per type — no hour missing, none extra
      assert(r.getLong(1) === r.getLong(2) + 1,
        s"sparse spine for ${r.getString(0)}")
    }
    // at sf0.001 the stream is sparse enough that real gaps exist
    assert(g.where(col("n_events") === 0).count() > 0)
    g.unpersist()
  }

  test("schema evolution: pre-evolution rows read as nulls, sums unaffected") {
    val r = graft.SparkEntry.queries("q_schema_evolution")(spark, dir)
      .agg(sum("n_docs"), sum("n_with_tokens"), sum("tokens_total"))
      .head()
    val total = Tables.documents(spark, dir).count()
    val odd = Tables.documents(spark, dir)
      .where(col("doc_id") % 2 =!= 0).count()
    assert(r.getLong(0) === total)
    assert(r.getLong(1) === odd)
    assert(r.getLong(2) > 0L)
  }

  test("quality constraint report passes on the healthy fixture") {
    val rep = graft.SparkEntry.queries("q_quality_constraints")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep.size === 6)
    // row_count_min_100 legitimately fails at sf0.001 (50 docs); the
    // structural constraints must hold at every sf
    Seq("doc_id_unique", "lang_in_domain", "n_chars_matches_text",
      "n_chars_positive", "text_not_null").foreach { c =>
      assert(rep(c), s"constraint $c failed")
    }
  }

  test("outlier z-scores are standardized residuals (mean-free, bounded count)") {
    val out = graft.SparkEntry.queries("q_outlier_zscore")(spark, dir)
    val n = out.count()
    val total = Tables.documents(spark, dir).count()
    // z > 1.8 two-sided keeps a small tail, never the bulk
    assert(n < total / 4)
    assert(out.where(abs(col("z")) <= 1.8).count() === 0)
  }

  test("CDC apply: stored view + diff deltas equals the v1 recompute") {
    val applied = graft.SparkEntry.queries("q_cdc_apply")(spark, dir)
    val docs = Tables.documents(spark, dir)
    val v1 = docs.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("chars_total"))
    assert(applied.exceptAll(v1).count() === 0)
    assert(v1.exceptAll(applied).count() === 0)
  }

  test("KMV overlap estimates track the exact pairwise Jaccard") {
    // theta-sketch Jaccard stderr ~ 1/sqrt(k) with k=512; 0.1 is a
    // ~2.3-sigma bound that still catches a broken estimator cold
    val est = SparkEntry.queries("q_kmv_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val exact = SparkEntry.queries("q_corpus_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (pair, je) =>
      assert(math.abs(je - exact(pair)) <= 0.1,
        s"$pair: sketch $je vs exact ${exact(pair)}")
    }
  }

  test("canonical dedup collapses formatting variants back to originals") {
    val k = graft.SparkEntry.queries("q_dedup_canonical")(spark, dir).cache()
    // no planted variant (id ≥ 2^40) can survive: its original always
    // shares the canonical form and has the smaller id
    val docs = Tables.documents(spark, dir)
    val canonDistinct = docs
      .select(graft.functions.TextFns.canonicalForm(col("text")).as("c"))
      .distinct().count()
    assert(k.agg(sum("n_keepers")).head().getLong(0) === canonDistinct)
    val maxIdSum = docs.agg(sum("doc_id")).head().getLong(0)
    assert(k.agg(sum("id_sum")).head().getLong(0) <= maxIdSum)
    k.unpersist()
  }

  test("catalog stats sweep covers every table with positive counts") {
    val st = graft.SparkEntry.queries("q_table_stats")(spark, dir).cache()
    assert(st.count() === Tables.All.size)
    assert(st.where(col("n_rows") <= 0).count() === 0)
    val docRow = st.where(col("table_name") === "documents")
      .head().getLong(1)
    assert(docRow === Tables.documents(spark, dir).count())
    st.unpersist()
  }

  test("incremental rollup equals the from-scratch recompute exactly") {
    val inc = graft.SparkEntry.queries("q_rollup_incremental")(spark, dir)
    val full = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,4)")), 2).cast("double")
          .as("total_value"))
      .select(col("event_type"), col("day"), col("n"), col("total_value"))
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
  }

  test("streaming rollup is batch-boundary invariant and equals the batch view") {
    import graft.streaming.EventStreams
    val r4 = EventStreams.streamingRollup(spark, dir, parts = 4)
    val r2 = EventStreams.streamingRollup(spark, dir, parts = 2)
    assert(r4.exceptAll(r2).count() === 0)
    assert(r2.exceptAll(r4).count() === 0)
    val batch = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,4)")), 2).cast("double")
          .as("total_value"))
    assert(r4.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(r4).count() === 0)
  }

  test("pivot → unpivot round trip restores the long form exactly") {
    val rt = graft.SparkEntry.queries("q_unpivot")(spark, dir)
    val direct = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    assert(rt.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(rt).count() === 0)
  }

  test("stream-static enrichment equals the batch join+group twin") {
    val st = graft.SparkEntry.queries("q_stream_enrich")(spark, dir)
    val dim = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(to_date(min(col("ts"))).as("cohort_day"))
    val batch = Tables.events(spark, dir).join(dim, "user_id")
      .groupBy(col("cohort_day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,4)")), 2).cast("double")
          .as("total_value"))
    assert(st.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(st).count() === 0)
  }

  test("corpus overlap: jaccard within [0,1] and bounded by set sizes") {
    val ov = graft.SparkEntry.queries("q_corpus_overlap")(spark, dir).cache()
    assert(ov.where(col("jaccard") < 0 || col("jaccard") > 1).count() === 0)
    assert(ov.where(col("n_shared") > least(col("n_a"), col("n_b"))).count() === 0)
    assert(ov.count() > 0)
    ov.unpersist()
  }
}
