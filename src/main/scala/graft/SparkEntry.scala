package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-domain modules; each module entry
  * carries its own DuckDB oracle SQL where the operator is
  * SQL-expressible.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    TpchQueries,
    EngineSurfaceQueries,
    DataSQueries,
    NorthStarQueries,
    MlQueries,
    SessionQueries,
    TrainDataQueries,
    LakeQueries,
    StatsQueries)

  private lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
