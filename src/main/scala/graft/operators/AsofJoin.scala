package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row
  * with right.ts <= left.ts within the same key — the standard
  * event-to-state enrichment (trade→quote, event→latest order).
  *
  * Spark has no built-in as-of join; per the engine's preference
  * order this is COMPOSED from existing operators rather than a
  * custom SparkPlan: tag both sides, union, one window over
  * (key, ts) carrying the last-seen right payload forward, keep left
  * rows. Cost: a single shuffle on the key + one sort — the same
  * lower bound a dedicated sort-merge as-of physical operator would
  * have, so a custom plan buys nothing here.
  *
  * Skew note: the window partitions by the join key; at 100 TB with
  * hot keys, pre-bucket by (key, ts-range) and as-of within buckets
  * with boundary replication.
  */
object AsofJoin {

  /** @param rightPayload columns of `right` to carry (besides key/ts)
    * @return left rows + `rightPayload` columns of the as-of match;
    *         inner semantics (left rows with no prior right row drop)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tagged union: right rows sort BEFORE left rows at equal ts so
    // the match is inclusive (right.ts <= left.ts)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(
        "struct<" + rightPayload.map(c =>
          s"$c:${right.schema(c).dataType.sql}").mkString(",") + ">"))
    // NULL never matches (SQL/DuckDB ASOF semantics): drop right rows
    // with a null key or ts — otherwise a null ts sorts FIRST
    // (nulls-first ascending) and its payload would be carried to every
    // row of the key group. Left rows with a null key/ts then match
    // nothing by construction (nothing precedes them) and drop under
    // the inner semantics.
    val r = right
      .where(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select((Seq(col(rightKey).as("_k"), col(rightTs).as("_ts"),
        lit(0).as("_side"),
        struct(rightPayload.map(col): _*).as("_payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select(
      (leftCols.map(col) ++ Seq(col("_k"), col("_ts"), col("_side"),
        col("_payload"))): _*)
      .unionByName(r)
    // xxhash64(_payload) tiebreak: when several RIGHT rows share
    // (key, ts), `last` would otherwise pick whichever the unstable
    // sort placed later — run-to-run nondeterminism. The hash makes
    // the pick arbitrary-but-stable; tie-free data is unaffected.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), xxhash64(col("_payload")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_match").isNotNull)
    rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(c, col(s"_match.$c"))
    }.drop("_k", "_ts", "_side", "_payload", "_match")
  }
}
