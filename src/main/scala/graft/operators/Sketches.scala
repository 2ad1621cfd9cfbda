package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch: fixed d×w counter grid estimating any item's
  * frequency with one-sided error (est ≥ exact, excess bounded by
  * N/w per row, min over d rows). The point at corpus scale: the
  * sketch answers frequency queries WITHOUT a vocabulary — the
  * counter grid is d·w cells regardless of how many distinct items
  * exist, where an exact per-item count table is vocabulary-sized.
  * Complements [[HeavyHitters]] (exact top items, no tail) — CMS
  * serves the tail too, approximately.
  *
  * Determinism: bucket hashes are the md5-h15 scheme
  * ([[Dedup.md5Wid]] convention) — a pure function of (row, item), so
  * the full sketch, and therefore every estimate, is bit-replayable
  * by the DuckDB oracle. Build = one narrow d-way explode + one
  * grouped count onto d·w cells; estimates join items against the
  * tiny counter table (broadcast).
  */
object Sketches {

  /** Bucket of `item` in sketch row `r`: h15("cms<r>:" || item) % w. */
  def cmsBucket(item: Column, r: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$r:"), item).cast("binary")),
      1, 15), 16, 10).cast("long"), lit(w.toLong))

  /** DuckDB twin of [[cmsBucket]]. */
  def cmsBucketSql(expr: String, r: Int, w: Int): String = {
    val h = s"""list_reduce(list_transform(
       |      string_split(substr(md5('cms$r:' || $expr), 1, 15), ''),
       |      c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1),
       |      (a, b) -> a * 16 + b)""".stripMargin
    s"($h % $w)"
  }

  /** The d×w counter grid from an item column: (r, bucket, cnt). */
  def cmsCounters(items: DataFrame, itemCol: String,
                  d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket")))
    items.select(explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries` (one item per row): min over the d
    * row counters. The counter grid broadcasts — d·w cells. */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, itemCol: String,
                  d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket")))
    queries.select(col(itemCol), explode(array(cells: _*)).as("cell"))
      .select(col(itemCol), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("est"))
  }
}
