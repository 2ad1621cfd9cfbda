package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-layout story: a sink partitioned by a filter column
  * lets every downstream query prune whole directories at planning
  * time (PartitionFilters, not data filters) — at 100 TB the
  * difference between scanning one partition and scanning the lake.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a partitionBy sink prunes partitions for an equality filter") {
    val out = "/tmp/graft_part_events"
    graft.core.Tables.events(spark, TestSpark.SfDir)
      .write.mode("overwrite")
      .partitionBy("event_type")
      .parquet(out)

    val q = spark.read.parquet(out)
      .where(col("event_type") === "click")
      .agg(count(lit(1)).as("n"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString

    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"filter did not reach partition pruning:\n$p")
    // the partition column filter must NOT appear as a data filter —
    // pruning happens at file listing, not per row
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"), p)

    // and the pruned count matches the unpruned predicate
    val expected = graft.core.Tables.events(spark, TestSpark.SfDir)
      .where(col("event_type") === "click").count()
    val got = spark.read.parquet(out)
      .where(col("event_type") === "click").count()
    assert(got == expected)
  }

  test("q_curate_sink: curated corpus lands partitioned by language and the read-back prunes") {
    // the registered query IS the lifecycle: write partitionBy(lang),
    // read back from disk restricted to 'en'
    val q = SparkEntry.queries("q_curate_sink")(spark, TestSpark.SfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "en"))

    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      s"language filter did not reach partition pruning:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"), p)

    // the sink really is directory-partitioned: one lang=<v> dir per
    // language that survived the band
    val out = java.nio.file.Paths.get(
      graft.core.Scratch.pathFor("curated_sink", TestSpark.SfDir))
    val langDirs = java.nio.file.Files.list(out).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = Iterator.continually(langDirs)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString).toList
    assert(names.exists(_.startsWith("lang=en")), names.toString)

    // unpruned read restricted in memory agrees with the pruned read
    val full = spark.read.parquet(out.toString)
    assert(full.where(col("lang") === "en").count() == rows.length.toLong)
    assert(full.count() > rows.length.toLong) // other languages landed too
  }

  test("q_dpp_join: DYNAMIC partition pruning — runtime dim filter prunes fact partitions") {
    val q = SparkEntry.queries("q_dpp_join")(spark, TestSpark.SfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)

    // the fact scan's partition filter is a DynamicPruningExpression,
    // i.e. the qualifying years come from the executed dimension side
    // at runtime, not from a literal in the query
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruningexpression"),
      s"no DynamicPruningExpression on the fact scan:\n$p")

    // quantitative proof: the scan visited only the qualifying year's
    // partition(s), out of all ship-year directories on disk
    val out = java.nio.file.Paths.get(
      graft.core.Scratch.pathFor("lineitem_by_year", TestSpark.SfDir))
    val it = java.nio.file.Files.list(out).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val yearDirs = Iterator.continually(it).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("ship_year="))
      .toList
    assert(yearDirs.size >= 3, s"fixture spans too few ship years: $yearDirs")

    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(q.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("lineitem_by_year_")))
    assert(factScan.nonEmpty, "fact scan not found in executed plan")
    val partsRead = factScan.map(_.metrics("numPartitions").value).sum
    assert(partsRead > 0 && partsRead < yearDirs.size,
      s"expected runtime pruning: read $partsRead of ${yearDirs.size} year partitions")

    // sanity: the directory census matches the table's year census
    val distinctYears = q.sparkSession.read.parquet(out.toString)
      .select(col("ship_year")).distinct().count()
    assert(distinctYears.toInt == yearDirs.size)
  }
}
