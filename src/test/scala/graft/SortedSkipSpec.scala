package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** Zone-map story: the same pushed range filter reads a FRACTION of a
  * sort-on-write lake and ~ALL of an unsorted one — parquet row-group
  * min/max skipping is a property of the LAYOUT, not the query. */
class SortedSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** numOutputRows summed over the file scans of an EXECUTED query —
    * the rows the parquet reader actually produced after row-group
    * skipping (the residual filter above the scan is not counted). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    // walk through the AQE wrapper and into query stages — a scan
    // inside a ShuffleQueryStageExec is invisible to collectLeaves
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("sorted layout skips row groups; unsorted layout reads everything") {
    // sf0.1 (5k docs): enough rows for several 64 KiB row groups per
    // file, so skipping granularity is visible (500 docs is too coarse)
    val scored = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), TextFns.qualityScore(col("text")).as("quality"))
    val total = scored.count()
    val base = java.nio.file.Paths.get(
      graft.operators.Dedup.SignatureStore.root, "sorted_skip_spec").toString

    graft.io.SortedLake.writeSorted(scored, "quality", s"$base/sorted",
      partitions = 8, rowGroupBytes = 32L * 1024)
    // unsorted contrast: same rows, random order, same row-group size
    scored.repartition(8).sortWithinPartitions(md5(col("doc_id").cast("string")))
      .write.mode("overwrite")
      .option("parquet.block.size", 32L * 1024)
      .parquet(s"$base/unsorted")

    // threshold at ~the 75th percentile of this fixture's quality
    val cut = 0.84
    def readCount(path: String) =
      spark.read.parquet(path).where(col("quality") >= cut)
        .agg(count(lit(1)).as("n"))
    val sortedScan = scanRows(readCount(s"$base/sorted"))
    val unsortedScan = scanRows(readCount(s"$base/unsorted"))
    val matching = scored.where(col("quality") >= cut).count()

    // identical answers from both layouts
    assert(readCount(s"$base/sorted").head.getLong(0) == matching)
    assert(readCount(s"$base/unsorted").head.getLong(0) == matching)
    // the filter is pushed to the reader in both cases
    val p = readCount(s"$base/sorted").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(quality"),
      s"range filter did not reach the parquet reader:\n$p")
    // the layout is what skips: sorted reads the matches plus at most
    // boundary row groups, unsorted ~all (margins sized to tolerate a
    // couple of boundary groups shifting between writes)
    assert(unsortedScan >= (total * 9) / 10,
      s"unsorted layout unexpectedly skipped: $unsortedScan of $total")
    assert(sortedScan <= matching + (total * 3) / 8,
      s"sorted layout did not skip: read $sortedScan of $total for $matching matches")
    assert(sortedScan * 3 < unsortedScan * 2,
      s"expected a clear scan reduction: sorted=$sortedScan unsorted=$unsortedScan")
  }

  test("z-order skips on BOTH columns; single-column sort leaves the other at full scan") {
    // the lake carries the document text (as a real one would) — the
    // payload is what gives 5k rows enough row groups for a usefully
    // fine Z grid at the 32 KiB group size
    val scored = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"),
        TextFns.qualityScore(col("text")).as("quality"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    val total = scored.count()
    val base = java.nio.file.Paths.get(
      graft.operators.Dedup.SignatureStore.root, "zorder_spec").toString

    graft.io.SortedLake.writeZOrdered(scored, "quality", "n_tokens",
      s"$base/z", partitions = 8, rowGroupBytes = 32L * 1024)
    graft.io.SortedLake.writeSorted(scored, "quality",
      s"$base/q_only", partitions = 8, rowGroupBytes = 32L * 1024)

    // ~quartile slabs on each axis
    def qFilter(path: String) = spark.read.parquet(path)
      .where(col("quality") >= 0.84).agg(count(lit(1)))
    def tFilter(path: String) = spark.read.parquet(path)
      .where(col("n_tokens") <= 32).agg(count(lit(1)))

    val zQuality = scanRows(qFilter(s"$base/z"))
    val zTokens = scanRows(tFilter(s"$base/z"))
    val qSortedTokens = scanRows(tFilter(s"$base/q_only"))

    // answers identical across layouts
    assert(qFilter(s"$base/z").head.getLong(0) ==
      scored.where(col("quality") >= 0.84).count())
    assert(tFilter(s"$base/z").head.getLong(0) ==
      scored.where(col("n_tokens") <= 32).count())
    // both axes skip on the z-ordered lake: a ~25% slab on either
    // column reads well under half the lake
    assert(zQuality * 2 < total,
      s"z-order did not skip on quality: read $zQuality of $total")
    assert(zTokens * 2 < total,
      s"z-order did not skip on n_tokens: read $zTokens of $total")
    // the single-column sort helps the other column only as far as the
    // two columns correlate (quality has a 0.4 length weight on this
    // fixture, so substantial incidental order survives); the z-order
    // layout must still strictly beat that incidental skipping
    assert(zTokens * 100 < qSortedTokens * 85,
      s"z-order ($zTokens rows) should beat the quality-sorted layout " +
        s"($qSortedTokens rows) on the n_tokens axis; total=$total")
  }

  test("q_sorted_skip round trip matches recomputation from the source table") {
    val got = SparkEntry.queries("q_sorted_skip")(spark, TestSpark.SfDir)
      .collect().map(_.toSeq).toSeq
    val want = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select(col("lang"), TextFns.qualityScore(col("text")).as("quality"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("quality") >= 0.84)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tot_tokens"),
        round(min(col("quality")), 6).as("min_q"))
      .orderBy(col("lang"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q_zorder_skip round trip matches recomputation from the source table") {
    val got = SparkEntry.queries("q_zorder_skip")(spark, TestSpark.SfDir)
      .collect().map(_.toSeq).toSeq
    val want = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select(col("lang"), TextFns.qualityScore(col("text")).as("quality"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .where(col("quality") >= 0.6 && col("n_tokens").between(30, 70))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tot_tokens"),
        round(max(col("quality")), 6).as("max_q"))
      .orderBy(col("lang"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }
}
