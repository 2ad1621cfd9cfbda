package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Scale-factor multiplier for evidence runs past the driver-supplied
  * sf0.1: replicates a source sf directory K times with key offsets,
  * preserving referential integrity (lineitem→orders/part/supplier,
  * orders→customer) and every per-table value distribution exactly.
  * Dimension tables (region, nation) are copied verbatim, matching
  * TPC-H semantics where they are scale-invariant.
  *
  * Keys in the driver's data are dense 0..N-1, so replica i shifts
  * each key by i*span (span = max+1 read from the data, not assumed).
  * Output layout mirrors the driver's: ONE parquet file per table at
  * dst/<table>.parquet, so graft.Verify, graft.Bench, and
  * tools/check.py (DuckDB read_parquet) all work unchanged.
  *
  * Usage: runMain graft.tools.MakeSf <srcSfDir> <dstDir> <k> [tables]
  * (tables = optional comma list; default all — a 1000x ladder probe
  * of the documents-family paths doesn't need a 600 M-row lineitem)
  */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir, kStr) = (args(0), args(1), args(2))
    val tables: Set[String] =
      if (args.length > 3) args(3).split(",").toSet
      else Set("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, srcDir, dstDir, k, tables)
    spark.stop()
  }

  /** The replication body, callable in-process (big-SF specs
    * regenerate their fixture if absent instead of silently
    * canceling — the evidence is then reproducible from a clean
    * machine). Deterministic: same src + k -> same rows. */
  def build(spark: SparkSession, srcDir: String, dstDir: String, k: Int,
            tables: Set[String]): Unit = {
    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    lazy val custSpan = span(tbl("customer"), "c_custkey")
    lazy val suppSpan = span(tbl("supplier"), "s_suppkey")
    lazy val partSpan = span(tbl("part"), "p_partkey")
    lazy val ordSpan  = span(tbl("orders"), "o_orderkey")

    /** Union of k copies of df, with each listed BIGINT key column
      * shifted by replica*span. Column order is preserved. */
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until k).map { i =>
        df.select(df.columns.map { c =>
          shifts.get(c) match {
            case Some(s) => (col(c) + lit(i * s)).as(c)
            case None    => col(c)
          }
        }.toSeq: _*)
      }.reduce(_ unionByName _)

    /** Write as a single parquet FILE at dst/<name>.parquet (the
      * driver's layout — DuckDB read_parquet needs a file). */
    def write(name: String, df: => DataFrame): Unit = {
      if (!tables.contains(name)) return
      val stage = s"$dstDir/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file for $name"))
      Files.move(part, Paths.get(s"$dstDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // clean the staging dir
      Files.walk(Paths.get(stage)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      println(s"[makesf] $name: ${spark.read.parquet(s"$dstDir/$name.parquet").count()} rows")
    }

    Files.createDirectories(Paths.get(dstDir))
    write("region", tbl("region"))
    write("nation", tbl("nation"))
    write("customer", replicate(tbl("customer"), Map("c_custkey" -> custSpan)))
    write("supplier", replicate(tbl("supplier"), Map("s_suppkey" -> suppSpan)))
    write("part", replicate(tbl("part"), Map("p_partkey" -> partSpan)))
    write("orders", replicate(tbl("orders"),
      Map("o_orderkey" -> ordSpan, "o_custkey" -> custSpan)))
    write("lineitem", replicate(tbl("lineitem"),
      Map("l_orderkey" -> ordSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)))
    // events is replicated by tools/make_sf_events.py instead: its ts
    // column is physically TIMESTAMP(NANOS), which Spark can neither
    // read without the nanosAsLong legacy long-coercion nor write back
    // — round-tripping here would silently change the storage type the
    // Tables.events loader and the DuckDB oracle both key on.
    write("documents", replicate(tbl("documents"),
      Map("doc_id" -> span(tbl("documents"), "doc_id"))))
    write("embeddings", replicate(tbl("embeddings"),
      Map("vec_id" -> span(tbl("embeddings"), "vec_id"))))
  }
}
