package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot maintenance for plain-parquet lakes: the MERGE
  * (upsert) and snapshot-diff primitives a table format gives you,
  * re-expressed as two relational operators so they run on any
  * Spark-readable layout.
  *
  * Scale posture:
  *  - [[keyedUpsert]] is one anti-join on the key — the base side
  *    shuffles once (or not at all when both sides are bucketed by
  *    the key, the [[Dedup.SignatureStore]] layout); the delta is
  *    typically a day's arrivals and broadcasts under AQE when small.
  *    Nothing is collected; the merged frame is written straight back.
  *  - [[snapshotDiff]] compares two corpus versions by CONTENT HASH,
  *    not raw payload: both sides project to (key, md5) before the
  *    full-outer join, so a 100 TB text column never reaches the
  *    shuffle — only 16-byte digests do. The join is key-keyed and
  *    co-partitions with the upsert above.
  */
object Merge {

  /** Delta-wins keyed upsert: every key present in `delta` replaces
    * the base row; keys absent from the base are inserts. Column sets
    * must match (`unionByName`). */
  def keyedUpsert(base: DataFrame, delta: DataFrame, key: String): DataFrame =
    delta.unionByName(
      base.join(delta.select(col(key)), Seq(key), "left_anti"))

  /** Additive partial-aggregate merge — the incremental-view-
    * maintenance primitive: a stored rollup and a delta rollup over
    * the same keys carry ADDITIVE measures (counts, DECIMAL sums),
    * so absorbing a new day is `union → re-sum`, never a re-scan of
    * history. At 100 TB this is the difference between aggregating
    * one day and aggregating three years; exactness holds because
    * every measure is addition-order-independent (BIGINT / DECIMAL —
    * see [[graft.queries.Q]]'s determinism contract). */
  def additiveMerge(parts: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "additiveMerge needs at least one measure")
    parts.groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** Row-level change classification between two snapshots of a keyed
    * table: `added` (key only in `next`), `removed` (key only in
    * `prev`), `changed` (both, different content hash), `unchanged`.
    * Returns (key, status); content equality is md5 over the given
    * payload column — hash equality ⇔ payload equality for change
    * accounting purposes, and only digests shuffle. Key presence is
    * carried by EXPLICIT side markers, never inferred from digest
    * nullness: a row whose payload is NULL hashes to NULL, and
    * conflating "hash is NULL" with "key absent" would report a
    * prev-only NULL-payload row as `added`. NULL payloads compare
    * null-safely: NULL↔NULL is `unchanged`, NULL↔text is `changed`. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      payload: String): DataFrame = {
    val a = prev.select(col(key), lit(true).as("_in_prev"),
      md5(col(payload)).as("_h_prev"))
    val b = next.select(col(key), lit(true).as("_in_next"),
      md5(col(payload)).as("_h_next"))
    a.join(b, Seq(key), "full_outer")
      .select(col(key),
        when(col("_in_prev").isNull, lit("added"))
          .when(col("_in_next").isNull, lit("removed"))
          .when(!(col("_h_prev") <=> col("_h_next")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
