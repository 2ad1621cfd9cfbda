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

  /** Quantile-bucket index of `c` against precomputed `boundaries`
    * (ascending): the count of boundaries ≤ value, a codegen'd
    * array-HOF over a ≤255-element literal — no join, no shuffle.
    * Rank-bucketing (rather than `width_bucket` over [min, max])
    * equalizes occupancy under skew, which is what keeps the Z-curve
    * square. */
  private def quantileBucket(c: org.apache.spark.sql.Column,
                             boundaries: Array[Double]): org.apache.spark.sql.Column =
    size(filter(typedLit(boundaries), b => b <= c.cast("double"))).cast("long")

  /** Interleave the low `bits` bits of `a` (odd positions) and `b`
    * (even positions) — the 2-D Morton / Z-value, pure integer
    * codegen. */
  private def morton(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i + 1))
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
    }

  /** Z-ORDER write: cluster `df` on the Morton interleave of the two
    * columns' rank buckets, so range predicates on EITHER column (or
    * both) skip row groups — the multi-column generalization of
    * [[writeSorted]], which helps exactly one column and leaves scans
    * on any other at 100%.
    *
    * Mechanics, all from the standard lake-engine playbook: sample
    * each column's quantile boundaries once (`approxQuantile`, one
    * distributed pass, driver gets ≤255 doubles), rank-bucket each row
    * against the broadcast boundaries map-side, interleave the bucket
    * bits into a Z-value, then range-partition + sort the write on it.
    * Every row group then covers a small SQUARE of the (c1, c2) rank
    * space, so a slab predicate on either axis intersects ~its
    * selectivity's worth of squares instead of every group. The
    * Z-value is a sort key only — it is not written. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
                    partitions: Int, bits: Int = 8,
                    rowGroupBytes: Long = 1L << 20): Unit = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1, 16], got $bits")
    val buckets = 1 << bits
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val Seq(b1, b2) = Seq(c1, c2).map { c =>
      df.stat.approxQuantile(c, probes, 0.001).distinct.sorted
    }
    val z = morton(quantileBucket(col(c1), b1), quantileBucket(col(c2), b2), bits)
    df.repartitionByRange(partitions, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
