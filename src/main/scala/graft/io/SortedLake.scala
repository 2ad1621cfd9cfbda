package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort-on-write storage layout — zone-map data skipping for range
  * predicates, the lake-side complement to [[graft.io]]'s
  * directory-partitioned sinks (those prune on low-cardinality
  * EQUALITY columns; this skips on a CONTINUOUS column a directory
  * layout can't hold).
  *
  * `repartitionByRange(sortCol)` gives every output file a disjoint
  * value range, and `sortWithinPartitions` gives every parquet row
  * group inside the file a narrow sub-range, so the min/max statistics
  * parquet already keeps per row group become zone maps: a later
  * `sortCol >= x` scan skips whole files and row groups at the reader,
  * without a row of data read. On an UNSORTED layout the same pushed
  * filter skips nothing — every row group's [min, max] spans the full
  * domain — which is the measured contrast in SortedSkipSpec.
  *
  * Scale posture: the one range-partitioning shuffle at write time is
  * amortized over every scan that follows — the standard
  * sort-on-ingest contract (Z-order generalizes it to multiple
  * columns; one column needs only this). The row-group size knob is
  * exposed because skipping granularity IS the row group: at the
  * default 128 MiB a selective predicate still reads huge groups;
  * production lakes tune this per table. */
object SortedLake {

  /** Write `df` range-partitioned and sorted by `sortCol`.
    * `rowGroupBytes` caps the parquet block size so zone maps stay
    * fine-grained relative to the file. */
  def writeSorted(df: DataFrame, sortCol: String, path: String,
                  partitions: Int, rowGroupBytes: Long = 1L << 20): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
}
