package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet column BLOOM FILTERS for point lookups — the skipping
  * mechanism for equality predicates on HIGH-CARDINALITY UNSORTED
  * keys, where zone maps are useless (every row group's min/max
  * spans the whole key space) and sorting for one lookup column is
  * not on the table. The writer embeds a bloom per row group; the
  * reader's row-group filter consults it before reading any data
  * page — a 100 TB point lookup touches ~one row group per matching
  * file instead of every page of every file. */
class BloomSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bloom skipping works where zone maps are blind (random key order)") {
    val keyed = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(md5(col("doc_id").cast("string")).as("bkey"), col("doc_id"))
    val total = keyed.count()
    val base = java.nio.file.Paths.get(
      graft.operators.Dedup.SignatureStore.root, "bloom_skip_rand").toString

    // rows ordered by doc_id → the md5 key is RANDOM within every row
    // group, so each group's [min, max] spans ~the whole key space and
    // min/max stats can exclude nothing
    def write(path: String, bloom: Boolean): Unit = {
      val w = keyed.repartition(4).sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.block.size", 32L * 1024)
      (if (bloom)
        w.option("parquet.bloom.filter.enabled#bkey", "true")
          .option("parquet.bloom.filter.expected.ndv#bkey", total.toString)
      else w).parquet(path)
    }
    write(s"$base/bloom", bloom = true)
    write(s"$base/plain", bloom = false)

    val target = keyed.where(col("doc_id") === 42L).head.getString(0)
    def lookup(path: String) =
      spark.read.parquet(path).where(col("bkey") === target)

    assert(lookup(s"$base/bloom").select("doc_id").head.getLong(0) === 42L)
    assert(lookup(s"$base/plain").select("doc_id").head.getLong(0) === 42L)

    val bloomScan = scanRows(lookup(s"$base/bloom"))
    val plainScan = scanRows(lookup(s"$base/plain"))
    // stats-blind: the plain layout reads ~everything; the bloom
    // excludes all but the row groups that (may) hold the key
    assert(plainScan > (total * 8) / 10,
      s"plain layout unexpectedly skipped: $plainScan of $total")
    assert(bloomScan < plainScan / 4,
      s"bloom did not skip: $bloomScan vs $plainScan")
  }
}
