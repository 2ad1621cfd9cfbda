package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark plan builder plus (where
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same
  * parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check (ML / streaming / mapPartitions operators).
  *
  * Determinism contract (driver hashes values): every query
  *  - orders its output by a unique key set, identically in both
  *    engines;
  *  - aggregates money-like doubles through DECIMAL (exact,
  *    addition-order-independent) and casts the result back to double,
  *    so Spark's parallel partial aggregation and DuckDB's sequential
  *    sum produce bit-identical values;
  *  - aliases every computed column identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[Q]
}
