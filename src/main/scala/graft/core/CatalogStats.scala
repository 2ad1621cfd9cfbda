package graft.core

import org.apache.spark.sql.SparkSession

/** Catalog-statistics plumbing for cost-based optimization: registers
  * fixture tables as EXTERNAL catalog tables under a dir-keyed
  * database and runs `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL
  * COLUMNS` over them, once per (session, dir) pair.
  *
  * This is the missing half of `q_table_stats`: that query PROVES
  * footer row counts equal scan counts; this module FEEDS row counts
  * and column NDV/min/max into Catalyst's cost-based optimizer so the
  * join-reorder and size-estimation rules (`spark.sql.cbo.*`, enabled
  * in [[Tables.SessionConfigs]]) actually consume them. CBO only ever
  * reads statistics attached to catalog relations, so every other
  * registered query — all of which read raw parquet paths — keeps its
  * exact pre-CBO plan; the stats change plans only for queries that
  * opt in by reading through [[ensure]]'s database.
  *
  * Scale posture: ANALYZE is the once-per-corpus-version catalog job
  * every warehouse runs (TPC benchmarks mandate it); its one scan per
  * table is paid at ingest, not per query, and the optimizer dividend
  * compounds across every subsequent join. The memo below mirrors
  * that: one ANALYZE sweep per JVM per fixture dir.
  */
object CatalogStats {

  // Weak-keyed by the live session object: identityHashCode strings
  // could collide after a session is GC'd (hash reuse skips the
  // CREATE/ANALYZE for a brand-new session → table-not-found), and
  // entries for dead sessions would pin memo state forever. The weak
  // map drops a session's memo with the session itself.
  private val analyzed =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]()

  /** Ensure `tables` exist as analyzed catalog tables for `dir`;
    * returns the database name to qualify them with. Idempotent and
    * memoized per (session, dir). */
  def ensure(spark: SparkSession, dir: String,
             tables: Seq[String]): String = synchronized {
    val db = "cbo_" + Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    // Memoized PER TABLE, not per db: two callers over the same dir
    // may ANALYZE different table subsets (join-order wants lineitem+
    // nation, broadcast wants orders+customer) — a db-level memo would
    // let whichever ran first starve the other of its tables.
    val seen = analyzed.computeIfAbsent(spark,
      _ => scala.collection.mutable.Set[String]())
    val missing = tables.filterNot(t => seen.contains(s"$db.$t"))
    if (missing.nonEmpty) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      missing.foreach { t =>
        val path = Tables.readPath(spark, s"$dir/$t.parquet")
        spark.sql(s"DROP TABLE IF EXISTS $db.$t")
        spark.sql(s"CREATE TABLE $db.$t USING parquet LOCATION '$path'")
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
        seen += s"$db.$t"
      }
    }
    db
  }
}
