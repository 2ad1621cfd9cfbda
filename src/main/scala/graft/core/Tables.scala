package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md) and the
  * session defaults used by every entry point.
  *
  * Scale posture: every loader returns a lazy parquet scan — column
  * pruning and predicate pushdown reach the file scan because nothing
  * here forces materialization.
  */
object Tables {
  /** Session settings every entry point (Verify/Bench/tests) applies:
    * UTC for oracle parity, nanos-as-long for the events table,
    * AQE on for runtime re-planning at scale. */
  val SessionConfigs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.parquet.compression.codec" -> "snappy",
    // The test fixtures are single small parquet files; with the 128MB
    // default every scan is ONE task and per-row-expensive pipelines
    // run single-threaded. 2MB splits restore scan parallelism at
    // bench scale (a production corpus has thousands of splits and
    // keeps the default).
    "spark.sql.files.maxPartitionBytes" -> "2097152",
    "spark.sql.files.openCostInBytes" -> "262144")

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  /** Normalize an events frame's `ts` to a session-zone microsecond
    * TimestampType regardless of how the fixture stored it: older
    * driver fixtures wrote TIMESTAMP(NANOS) (surfacing as a raw
    * nanos Long under `spark.sql.legacy.parquet.nanosAsLong=true`),
    * newer ones write plain timestamp[us] (surfacing as
    * TIMESTAMP_NTZ). Both denote the same UTC instants; the session
    * zone is pinned UTC (see [[SessionConfigs]]) so the NTZ→LTZ cast
    * is value-preserving. Integer `div` (not `/`) on the nanos path —
    * epoch-nanos exceed 2^53, so double division would lose
    * precision. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  /** documents/embeddings feed per-row-EXPENSIVE operators (shingling,
    * hashing, lambda folds over 64-dim arrays). The fixture is one
    * small file — a single row-group parquet can't split below file
    * level, so scan parallelism alone isn't enough; an explicit
    * repartition (cheap: the whole table is <1 MB here) restores row
    * parallelism, which a real many-split corpus gets for free.
    * Partition count follows DATA size, not core count: these fixture
    * tables are a few thousand rows, and 32-way splits mean ~60-row
    * tasks whose scheduling overhead dominates — worse, iterative
    * consumers (KMeans) barrier on every tiny task each iteration. */
  private val FixtureSplits = 8
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").repartition(FixtureSplits)
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings").repartition(FixtureSplits)
}
