package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** TPC-H-shaped relational breadth on the reduced star schema
  * (SURVEY.md §2b "joins / aggregation" rows): correlated EXISTS,
  * scalar-subquery thresholds, disjunctive join predicates, group-
  * having-join-back, semi/anti composition — the optimizer surface a
  * standard engine must cover beyond the q1/q3/q5 of round 1.
  *
  * Scale notes per query inline; shared rules as in
  * [[RelationalQueries]]: dimensions broadcast, fact-fact joins
  * shuffle once on the join key, all aggregates algebraic (partial
  * map-side), money sums exact via DECIMAL then rounded to a shared
  * grid (see `Q` scaladoc / oracle-determinism rules).
  */
object TpchQueries extends QueryModule {

  private def dsum(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(30, scale))), 2).cast("double")

  private def t(n: String)(implicit s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, n)

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revSql = "l_extendedprice * (1.0 - l_discount)"

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6: pure scan-side revenue forecast — every predicate
    * reaches the parquet scan (PushedFilters), zero joins, one partial
    * agg. The at-scale ideal: I/O-bound, no shuffle beyond one row per
    * task. */
  private def q6(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 8).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q4
  /** TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi
    * join (the schema has no commitdate; "late line" = shipped after
    * the order date + 30 days). The semi join shuffles only the two
    * key columns, not the payload. */
  private def q4(implicit s: SparkSession, dir: String): DataFrame = {
    val late = t("lineitem").select(col("l_orderkey"), col("l_shipdate"))
    t("orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAYS)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q7
  /** TPC-H Q7 shape: volume shipping between two nations — the
    * supplier-side and customer-side nation joins are both broadcast;
    * the only big exchange is lineitem ⨝ orders. */
  private def q7(implicit s: SparkSession, dir: String): DataFrame = {
    val n1 = t("nation").select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = t("nation").select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    t("lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(rev, 8).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |  CAST(ROUND(SUM(CAST($revSql AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- q9
  /** TPC-H Q9 shape: profit by nation × year; cost proxied by
    * p_retailprice·qty·0.05 (no partsupp in the schema). part joins
    * by key after a pushed type filter. */
  private def q9(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .join(broadcast(t("part").where(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(rev - col("p_retailprice") * col("l_quantity") * lit(0.05), 8)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  private val q9Sql =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(ROUND(SUM(CAST($revSql - p_retailprice * l_quantity * 0.05 AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_type = 'ECONOMY'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- q10
  /** TPC-H Q10: returned-item revenue per customer, top 20 — the
    * aggregate is keyed by the high-cardinality custkey and the top-k
    * is a TakeOrderedAndProject, not a full sort. */
  private def q10(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem").where(col("l_returnflag") === "R")
      .join(t("orders")
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(rev, 8).as("revenue"), round(max(col("c_acctbal")), 2).as("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(ROUND(SUM(CAST($revSql AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
       |  ROUND(MAX(c_acctbal), 2) AS c_acctbal
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q14
  /** TPC-H Q14: promo revenue share — conditional aggregation over a
    * broadcast part join; the ratio of two exact DECIMAL sums is taken
    * once, in double, then rounded. */
  private def q14(implicit s: SparkSession, dir: String): DataFrame = {
    val promoRev = sum(when(col("p_type") === "PROMO", rev.cast(DecimalType(30, 8)))
      .otherwise(lit(0).cast(DecimalType(30, 8))))
    val allRev = sum(rev.cast(DecimalType(30, 8)))
    t("lineitem")
      .where(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-06-01").cast("timestamp"))
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      // decimal sums rounded to cents BEFORE the double cast (scale-8
      // unscaled values pass 2^53, where DuckDB's int128→double cast
      // double-rounds vs Spark's BigDecimal) so both engines divide
      // identical doubles; then the 1e-6 grid pin in pure IEEE ops
      .agg((floor(round(promoRev, 2).cast("double") * 100.0
          / round(allRev, 2).cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
        .as("promo_share"),
        count(lit(1)).as("n_items"))
  }

  private val q14Sql =
    s"""SELECT FLOOR(
       |    CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN CAST($revSql AS DECIMAL(30,8)) ELSE CAST(0 AS DECIMAL(30,8)) END), 2) AS DOUBLE)
       |    * 100.0
       |    / CAST(ROUND(SUM(CAST($revSql AS DECIMAL(30,8))), 2) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS promo_share,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-06-01'""".stripMargin

  // --------------------------------------------------------------- q17
  /** TPC-H Q17 shape: lineitems under 20%% of their part's average
    * quantity — the correlated scalar subquery decorrelates to a
    * grouped aggregate joined back on partkey (broadcast: one row per
    * part). The threshold avg comes from an exact DECIMAL sum so both
    * engines compare against identical doubles. */
  private def q17(implicit s: SparkSession, dir: String): DataFrame = {
    val avgQty = t("lineitem")
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg((sum(col("l_quantity").cast(DecimalType(30, 4))).cast("double") /
        count(lit(1))).as("avg_qty"))
    t("lineitem")
      .join(broadcast(t("part").where(col("p_brand") === "Brand#1" &&
        col("p_type") === "ECONOMY")), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap_partkey"))
      .where(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice"), 4).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  private val q17Sql =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN (SELECT l_partkey AS ap_partkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) AS avg_qty
      |      FROM lineitem GROUP BY 1) a ON l_partkey = ap_partkey
      |WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
      |  AND l_quantity < 0.5 * avg_qty""".stripMargin

  // --------------------------------------------------------------- q18
  /** TPC-H Q18: large orders — group-having on the fact, then join
    * BACK to orders/customer. The having-side aggregate reuses the
    * l_orderkey shuffle; the join back is on the same key (no extra
    * exchange under AQE). */
  private def q18(implicit s: SparkSession, dir: String): DataFrame = {
    val big = t("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(30, 4))).cast("double")
        .as("sum_qty"))
      .where(col("sum_qty") > 300.0)
    big.join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM (SELECT l_orderkey,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY 1) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE sum_qty > 300.0
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // --------------------------------------------------------------- q19
  /** TPC-H Q19: disjunctive bracketed predicates — one broadcast hash
    * join on partkey with the OR-of-ANDs evaluated as a post-join
    * filter (Catalyst extracts the common key; the disjunction never
    * forces a nested-loop join). */
  private def q19(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20, 30)))
      .agg(dsum(rev, 8).as("revenue"), count(lit(1)).as("n_items"))

  private val q19Sql =
    s"""SELECT CAST(ROUND(SUM(CAST($revSql AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------------- q22
  /** TPC-H Q22 shape: customers above the positive-balance average
    * with no RECENT orders — a scalar-subquery threshold (broadcast
    * single row) composed with a left-anti join on a filtered fact,
    * grouped by nation. */
  private def q22(implicit s: SparkSession, dir: String): DataFrame = {
    // 1e-6 grid pin via pure IEEE floor(x*1e6+0.5) — identical op
    // sequence in DuckDB's replay, no half-boundary divergence (the
    // q9-at-sf1 bug class; see RelationalQueries.davg)
    val thr = t("customer").where(col("c_acctbal") > 0.0)
      .agg((floor(sum(col("c_acctbal").cast(DecimalType(30, 4))).cast("double") /
        count(lit(1)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_bal"))
    val recent = t("orders")
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
    t("customer")
      .crossJoin(broadcast(thr))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  private val q22Sql =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,4))), 2) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT FLOOR(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000.0
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q6_forecast_revenue", (s, d) => q6(s, d), Some(q6Sql)),
    Q("q4_order_priority", (s, d) => q4(s, d), Some(q4Sql)),
    Q("q7_volume_shipping", (s, d) => q7(s, d), Some(q7Sql)),
    Q("q9_profit_by_nation", (s, d) => q9(s, d), Some(q9Sql)),
    Q("q10_returned_items", (s, d) => q10(s, d), Some(q10Sql)),
    Q("q14_promo_share", (s, d) => q14(s, d), Some(q14Sql)),
    Q("q17_small_quantity", (s, d) => q17(s, d), Some(q17Sql)),
    Q("q18_large_orders", (s, d) => q18(s, d), Some(q18Sql)),
    Q("q19_disjunctive", (s, d) => q19(s, d), Some(q19Sql)),
    Q("q22_idle_balances", (s, d) => q22(s, d), Some(q22Sql)))
}
