package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Ingest-time compaction of pathological single-row-group parquet
  * (`Tables.readPath`): a file whose average row group exceeds 2× the
  * split size is re-chunked once per JVM; split-friendly files are
  * read in place. See the `readPath` scaladoc for why — a parquet
  * file cannot be split below row-group granularity, so an oversized
  * row group silently serializes every scan of the table.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("oversized single-row-group file is staged re-chunked: same rows, restored scan parallelism") {
    val src = "/tmp/graft_compaction_spec/fat.parquet"
    // ~8 MB of rows in ONE row group (block.size far above the size)
    spark.range(0, 400000)
      .select($"id", md5($"id".cast("string")).as("pad"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (256L * 1024 * 1024).toString)
      .parquet("/tmp/graft_compaction_spec/fat_dir")
    // single data file, moved to a bare .parquet path like the fixtures
    val dataFile = java.nio.file.Files.list(
        java.nio.file.Paths.get("/tmp/graft_compaction_spec/fat_dir"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/tmp/graft_compaction_spec"))
    java.nio.file.Files.copy(dataFile, java.nio.file.Paths.get(src),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val staged = Tables.readPath(spark, src)
    assert(staged != src, "oversized row group was not staged")
    // data identity: same rows, same values
    val a = spark.read.parquet(src).orderBy($"id").collect().toSeq
    val b = spark.read.parquet(staged).orderBy($"id").collect().toSeq
    assert(a == b, "compaction changed the data")
    // the point of the exercise: the staged copy scans with real
    // parallelism, the source cannot (1 row group → 1 non-empty task)
    assert(spark.read.parquet(staged).rdd.getNumPartitions > 1,
      "staged copy still scans as one split")
    // memoized: second resolve returns the same staged path
    assert(Tables.readPath(spark, src) == staged)
  }

  test("split-friendly files are read in place") {
    val src = "/tmp/graft_compaction_spec/thin.parquet"
    spark.range(0, 1000).coalesce(1)
      .write.mode("overwrite").parquet("/tmp/graft_compaction_spec/thin_dir")
    val dataFile = java.nio.file.Files.list(
        java.nio.file.Paths.get("/tmp/graft_compaction_spec/thin_dir"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(dataFile, java.nio.file.Paths.get(src),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(Tables.readPath(spark, src) == src)
    // directories are never staged (already multi-file)
    assert(Tables.readPath(spark, "/tmp/graft_compaction_spec/thin_dir")
      == "/tmp/graft_compaction_spec/thin_dir")
  }
}
