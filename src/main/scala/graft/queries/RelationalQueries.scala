package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** The standard-engine relational surface (SURVEY.md §2b): scans,
  * multi-way joins, grouped/rollup aggregation, windows, semi/anti
  * joins, set ops, distinct, JSON extraction, time-bucketed event
  * aggregation. All pure DataFrame plans — Catalyst supplies pushdown,
  * pruning, broadcast-join selection and whole-stage codegen.
  *
  * Scale notes per query are inline; the shared rules:
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact table for those joins;
  *  - fact-fact joins (orders ⨝ lineitem) shuffle on the join key
  *    once, and AQE handles skew at real scale;
  *  - aggregation is partial (map-side) before the exchange because
  *    all aggregates used are algebraic (sum/count/min/max).
  */
object RelationalQueries extends QueryModule {

  /** Exact, order-independent sum of a money-like double: through
    * DECIMAL, rounded to cents IN THE DECIMAL DOMAIN, then cast to
    * double. Rounding before the cast matters: both engines round the
    * same exact decimal half-up, and the scale-2 result converts to
    * double in one correctly-rounded step (cents magnitude « 2^53).
    * Rounding AFTER the cast — round(double, 2) — diverges when a
    * group sum lands exactly on a half-cent boundary: Spark rounds the
    * double's exact BigDecimal expansion while DuckDB rounds in float
    * arithmetic (found live: q9 at sf1, 279788514.835 → .84 vs .83). */
  private def dsum(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(DecimalType(30, scale))), 2).cast("double")

  /** Mean of a money-like double, pinned to a 1e-6 grid with pure
    * IEEE arithmetic: floor(x·1e6 + 0.5)/1e6. Both engines evaluate
    * the identical op sequence on identical inputs (the DECIMAL sum's
    * double cast is single-rounded in both while |unscaled| < 2^53,
    * true at every gate sf), so there is no divergence even exactly
    * at half-grid boundaries — unlike round(double, 6), which Spark
    * evaluates on the double's exact decimal expansion but DuckDB in
    * float arithmetic (the q9-at-sf1 bug class). Halves go to +inf. */
  private def davg(c: Column, scale: Int = 4): Column =
    floor(sum(c.cast(DecimalType(30, scale))).cast("double") / count(lit(1))
      * lit(1e6) + lit(0.5)) / lit(1e6)

  private def t(n: String)(implicit s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, n)

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-shaped pricing summary: one scan, grouped algebraic
    * aggregates; only 5 columns read (check ReadSchema), filter pushed
    * to parquet. */
  private def q1(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .where(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 12).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,12))), 2) AS DOUBLE) AS sum_charge,
      |  FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000.0 AS avg_qty,
      |  FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000.0 AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** Shipping-priority: broadcast(customer) ⨝ orders shuffles nothing
    * big; orders ⨝ lineitem is the one key shuffle; top-10 via
    * TakeOrderedAndProject (no full sort of the aggregate). */
  private def q3(implicit s: SparkSession, dir: String): DataFrame = {
    val cust = t("customer").where(col("c_mktsegment") === "BUILDING")
    val ord  = t("orders").where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = t("lineitem").where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** Multi-way star join: all four dimensions broadcast; the only big
    * exchange is orders ⨝ lineitem. */
  private def q5(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .join(t("orders").where(col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("supplier")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  private val q5Sql =
    """SELECT r_name, n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ------------------------------------------------------- window topk
  /** Per-customer top-3 orders by value: ranking window with a
    * deterministic tie-break; partitions by a high-cardinality key so
    * the window parallelizes. */
  private def qWindowTopk(implicit s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t("orders")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  private val qWindowTopkSql =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) x
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  // -------------------------------------------------- lateral subquery
  /** LATERAL correlated subquery (SQL:1999 lateral derived table,
    * Spark ≥3.2 `LATERAL`): for each nation, the top-2 customers by
    * account balance — the "per-row subquery" surface, distinct from
    * the window-function formulation of `q_window_topk`. Catalyst
    * DECORRELATES the lateral subquery into a ranked join
    * (DecorrelateInnerQuery), so the executed plan is the same
    * shuffle-partitioned window + join shape that scales — no
    * per-outer-row re-execution survives optimization; LateralSpec
    * asserts the decorrelated plan has no per-row loop. Projection
    * only — doubles pass through untouched, so parity is structural. */
  private def qLateralTopk(implicit s: SparkSession, dir: String): DataFrame = {
    t("nation").createOrReplaceTempView("nation_lat")
    t("customer").createOrReplaceTempView("customer_lat")
    s.sql("""
      SELECT n.n_name, tc.c_custkey, tc.c_name, tc.c_acctbal
      FROM nation_lat n,
      LATERAL (SELECT c_custkey, c_name, c_acctbal
               FROM customer_lat c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) tc
      ORDER BY n.n_name, tc.c_acctbal DESC, tc.c_custkey""")
  }

  private val qLateralTopkSql =
    """SELECT n.n_name, tc.c_custkey, tc.c_name, tc.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_name, c_acctbal
      |         FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) tc
      |ORDER BY n.n_name, tc.c_acctbal DESC, tc.c_custkey""".stripMargin

  // --------------------------------------------------- running window
  /** Analytic frame: per-supplier running quantity by ship date —
    * exercises rowsBetween frames (reference has only ranking use). */
  private def qWindowRunning(implicit s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t("lineitem")
      .where(col("l_suppkey") <= 3)
      .withColumn("running_qty",
        sum(col("l_quantity").cast(DecimalType(30, 4))).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
  }

  private val qWindowRunningSql =
    """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 3
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------------------ rollup
  /** Hierarchical rollup region → nation over customer balances.
    * NULLS FIRST pinned on both sides (DuckDB defaults NULLS LAST). */
  private def qRollup(implicit s: SparkSession, dir: String): DataFrame =
    t("customer")
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val qRollupSql =
    """SELECT r_name, n_name,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_bal,
      |  COUNT(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // --------------------------------------------------------- semi/anti
  /** EXISTS / NOT EXISTS as left-semi and left-anti joins; the id set
    * probed is the orders fact, aggregated to one row per kind. */
  private def qSemiAnti(implicit s: SparkSession, dir: String): DataFrame = {
    val cust = t("customer")
    val ord  = t("orders")
    val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val noO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withO.unionAll(noO).orderBy(col("kind"))
  }

  private val qSemiAntiSql =
    """SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY kind""".stripMargin

  // ------------------------------------------------------------ setops
  /** UNION / INTERSECT / EXCEPT over nation-key sets of customers vs
    * suppliers, tagged and stacked. */
  private def qSetops(implicit s: SparkSession, dir: String): DataFrame = {
    val c = t("customer").select(col("c_nationkey").as("nk")).distinct()
    val su = t("supplier").select(col("s_nationkey").as("nk")).distinct()
    val both   = c.intersect(su).withColumn("kind", lit("both"))
    val conly  = c.except(su).withColumn("kind", lit("customer_only"))
    val sonly  = su.except(c).withColumn("kind", lit("supplier_only"))
    both.unionAll(conly).unionAll(sonly)
      .select(col("kind"), col("nk")).orderBy(col("kind"), col("nk"))
  }

  private val qSetopsSql =
    """SELECT kind, nk FROM (
      |  SELECT 'both' AS kind, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'customer_only' AS kind, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'supplier_only' AS kind, nk FROM
      |    (SELECT s_nationkey AS nk FROM supplier EXCEPT SELECT c_nationkey FROM customer)
      |) x ORDER BY kind, nk""".stripMargin

  // ---------------------------------------------------------- distinct
  /** Exact distinct counts per group (the HLL `approx_count_distinct`
    * variant is benched separately — approx is not oracle-comparable). */
  private def qDistinct(implicit s: SparkSession, dir: String): DataFrame =
    t("orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  private val qDistinctSql =
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------------ json extract
  /** JSON scalar extraction from the events.props string column —
    * `get_json_object` stays codegen'd; a real pipeline would pin a
    * `from_json` schema to parse once. */
  private def qJsonExtract(implicit s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val qJsonExtractSql =
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Semi-structured VARIANT lifecycle — the Spark-4 successor to
    * per-path JSON string reparsing ([[qJsonExtract]]'s
    * `get_json_object`): `parse_json` decodes each event's props
    * ONCE into the binary VARIANT encoding, the variant column round-
    * trips through parquet (the shredded storage layout a 100 TB
    * event lake would keep, where string-JSON storage pays a reparse
    * on every read), and typed path extraction (`variant_get`) plus
    * missing-path null semantics (`try_variant_get`) run against the
    * decoded form. Oracle: the same aggregates straight off the raw
    * JSON strings — the variant encode → parquet → decode round trip
    * must be value-invisible. */
  private def qVariantExtract(implicit s: SparkSession, dir: String): DataFrame = {
    // variant encode + parquet write happen ONCE per JVM (the lake's
    // ingest job); the query measures the typed-path READ of the
    // shredded layout, which is the thing VARIANT storage buys.
    val out = graft.core.Scratch.buildOnce("events_variant", dir) { p =>
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          parse_json(col("props")).as("v"))
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(out)
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"),
        try_variant_get(col("v"), "$.absent", "long").as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(col("miss")).as("n_absent"))
      .orderBy(col("event_type"))
  }

  private val qVariantExtractSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.absent')) AS n_absent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------------------- hourly window
  /** Batch form of the tumbling-window event aggregation (the
    * streaming twin with watermarking lives in graft.streaming). */
  private def qHourlyEvents(implicit s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  private val qHourlyEventsSql =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // -------------------------------------------- RANGE-frame window
  /** Trailing-hour RANGE frame per user: for every event, how many
    * events and how much value the user produced in the preceding
    * 3600 seconds (inclusive). A VALUE-based frame, not a row count —
    * the one window-frame class the rows-frame queries don't cover.
    * Epoch seconds as the order key (integer on both engines; peers
    * share a second and get identical frame aggregates, so the result
    * is order-deterministic); the frame sum goes through DECIMAL
    * (addition-order-free). Scale: partitioned by user_id — no global
    * window; the frame is bounded by time, not partition size. */
  private def qWindowRange(implicit s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(s, dir)
      .where(col("user_id") <= 30)
      .withColumn("sec", col("ts").cast("long"))
      .select(col("user_id"), col("sec"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value").cast(DecimalType(30, 4))).over(w), 2)
          .cast("double").as("v_1h"))
      .orderBy(col("user_id"), col("sec"))
  }

  private val qWindowRangeSql =
    """SELECT user_id, epoch_us(ts) // 1000000 AS sec,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,4))) OVER w, 2) AS DOUBLE) AS v_1h
      |FROM events WHERE user_id <= 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, sec""".stripMargin

  // ------------------------------------------------------- correlation
  /** Scalar-function + conditional-aggregation breadth: per order
    * priority, share of high-value orders and price stats. */
  private def qCaseAgg(implicit s: SparkSession, dir: String): DataFrame =
    t("orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L)).as("n_big"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"))

  private val qCaseAggSql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_price,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------- cube
  /** Full CUBE over order status × priority (rollup's sibling —
    * SURVEY §2b grouping-sets row). */
  private def qCube(implicit s: SparkSession, dir: String): DataFrame =
    t("orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val qCubeSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // --------------------------------------------------------- row slice
  /** Row-range slice by explicit order (reference S3,
    * `main.py:157–159`) through [[graft.operators.Selection.sliceRows]]. */
  private def qRowSlice(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.Selection
      .sliceRows(t("orders").select(col("o_orderkey"), col("o_totalprice")),
        "o_orderkey", 100, 120)
      .orderBy(col("o_orderkey"))

  private val qRowSliceSql =
    """SELECT o_orderkey, o_totalprice FROM
      |  (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey
      |   LIMIT 20 OFFSET 100)
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------- salted aggregate
  /** Two-stage salted aggregation over a pathologically hot key
    * (l_returnflag has 3 values — at 100 TB each lands on one reducer
    * without salting) via [[graft.operators.Skew.saltedCountSum]].
    * Salting is invisible in the result, so the oracle is a plain
    * GROUP BY; the plan assertion (PlanShapeSpec) proves the two-stage
    * shape. Decimal sum keeps the partials addition-order-independent
    * so the salted reassembly is bit-exact. */
  private def qSkewSalted(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedCountSum(
        t("lineitem").select(col("l_returnflag"),
          col("l_quantity").cast(DecimalType(30, 4)).as("qty")),
        Seq("l_returnflag"), "qty")
      .select(col("l_returnflag"), col("n"),
        round(col("total"), 2).cast("double").as("total_qty"))
      .orderBy(col("l_returnflag"))

  private val qSkewSaltedSql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------- salted join
  /** Salted-replicate JOIN over an engineered hot key: half of
    * lineitem is rewritten to part key 1 (one key = 50% of the fact —
    * the shape where one reducer holds half the shuffle), then joined
    * to the part dim through [[graft.operators.Skew.saltedJoin]] with
    * the dim pinned to a shuffle join (`shuffle_hash` — the mid-size-
    * dim case where broadcast is off the table and AQE would have to
    * replicate the dim partition per split at runtime). The salt is
    * invisible in the result, so the oracle is the plain SQL join;
    * SkewSpec asserts the (keys, _salt) join shape and the hot key's
    * fan-out across salts. */
  private def qSkewJoin(implicit s: SparkSession, dir: String): DataFrame = {
    val fact = t("lineitem").select(
      when(col("l_orderkey") % 2 === 0, lit(1L))
        .otherwise(col("l_partkey")).as("p_partkey"),
      col("l_orderkey"),
      col("l_quantity").cast(DecimalType(30, 4)).as("qty"))
    val dim = t("part").select(col("p_partkey"), col("p_brand"))
      .hint("shuffle_hash")
    graft.operators.Skew.saltedJoin(fact, dim, Seq("p_partkey"), salts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("qty")), 2).cast("double").as("total_qty"))
      .orderBy(col("p_brand"))
  }

  private val qSkewJoinSql =
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,4))), 2) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN part
      |  ON p_partkey = CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_partkey END
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------------------------------------ HLL distinct
  /** approx_count_distinct (HyperLogLog++) — the at-scale variant of
    * q_distinct; rows-only (sketch estimates are engine-specific). */
  private def qApproxDistinct(implicit s: SparkSession, dir: String): DataFrame =
    t("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------- as-of join
  /** As-of join (events → latest order at or before the event, per
    * user) via [[graft.operators.AsofJoin]]'s union+window
    * composition; DuckDB's native ASOF JOIN is the oracle. The right
    * side is deduplicated per (custkey, orderdate) — both engines
    * would otherwise pick an arbitrary row among equal timestamps. */
  private def qAsofJoin(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"),
      col("user_id"), col("ts"))
    val ord = t("orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    graft.operators.AsofJoin.asofJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }

  private val qAsofJoinSql =
    """WITH ord AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
      |    max_by(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT event_id, o_orderkey, o_totalprice
      |FROM events ASOF JOIN ord
      |  ON events.user_id = ord.o_custkey AND events.ts >= ord.o_orderdate
      |ORDER BY event_id""".stripMargin

  /** The same as-of join through the custom Catalyst operator
    * ([[graft.plans.AsofJoinNative]]: logical node + Strategy +
    * physical merge exec) — the (c)-tier contrast to the composed
    * union+window form above; identical oracle. */
  private def qAsofJoinNative(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"),
      col("user_id"), col("ts"))
    val ord = t("orders")
      .groupBy(col("o_custkey"),
        // NTZ parquet date → TimestampType, matching the events side
        // (session timezone is pinned UTC, so the instant is identical)
        col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    graft.plans.AsofJoinNative.asofJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate")
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------- range join
  /** Range (theta) join: events matched to the same user's orders
    * within a ±2-year window around the order date. The equi key
    * (user) carries the join through a hash join; the range predicate
    * filters inside it — the standard way to keep a theta join off the
    * nested-loop path. */
  private def qRangeJoin(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val ord = t("orders").select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate"))
    ev.join(ord,
        col("user_id") === col("o_custkey") &&
          col("ts") >= col("o_orderdate") &&
          col("ts") <= col("o_orderdate") + expr("INTERVAL 12000 DAYS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("user_id"))
  }

  private val qRangeJoinSql =
    """SELECT user_id, COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM events JOIN orders
      |  ON user_id = o_custkey
      | AND ts >= o_orderdate
      | AND ts <= o_orderdate + INTERVAL 12000 DAYS
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** [[qRangeJoin]] through the custom whole-operator node
    * ([[graft.plans.RangeJoinNative]]): same pairs, same DuckDB
    * oracle, but the band predicate is a SEARCH BOUND (per-key
    * interval index, O(log group + matches) per probe) instead of a
    * residual filter over each buffered key group. The right side is
    * pre-projected to key + band + payload — the node is opaque to
    * Catalyst's column pruning, so pruning happens by construction. */
  private def qRangeJoinNative(implicit s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    val ord = t("orders").select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("win_lo"),
      (col("o_orderdate").cast("timestamp") + expr("INTERVAL 12000 DAYS"))
        .as("win_hi"))
    graft.plans.RangeJoinNative.rangeJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        valueCol = "ts", loCol = "win_lo", hiCol = "win_hi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("user_id"))
  }

  // ------------------------------------- dynamic partition pruning
  /** DYNAMIC partition pruning evidence — the runtime half of the
    * pruning story (PartitionPruningSpec covers the static half,
    * where the partition filter is a literal in the query). Here the
    * fact table (lineitem, written partitioned by ship year — the
    * date-partitioned layout every 100 TB fact table uses) is joined
    * to a dimension whose partition-key values survive a
    * NON-partition predicate (order-date window + priority), so the
    * set of fact partitions to read is only known at runtime. Spark
    * plants a DynamicPruningExpression on the fact scan fed by the
    * reused broadcast of the dimension — the fact directories for
    * non-qualifying years are never listed, let alone read. At 100 TB
    * this is the difference between scanning one year and scanning
    * the whole lake; `DppSpec` asserts the expression is in the plan
    * AND that the scan's partition count drops to the qualifying
    * years. Oracle: the same semantics over the raw table (an IN
    * subquery on the derived year) — the partitioned round trip must
    * be value-invisible. */
  private def qDppJoin(implicit s: SparkSession, dir: String): DataFrame = {
    // The partitioned fact layout is built ONCE per JVM (the lake's
    // date-partitioned ingest); the query itself is the runtime-pruned
    // READ — so the gate and the ladder measure DPP, not a rewrite.
    val out = graft.core.Scratch.buildOnce("lineitem_by_year", dir) { p =>
      t("lineitem")
        .withColumn("ship_year", year(col("l_shipdate")))
        .write.mode("overwrite").partitionBy("ship_year").parquet(p)
    }
    val fact = s.read.parquet(out)
    val dimYears = t("orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") <= lit("1997-12-31").cast("date") &&
        col("o_orderpriority") === "1-URGENT")
      .select(year(col("o_orderdate")).as("ship_year")).distinct()
    fact.join(dimYears, "ship_year")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  private val qDppJoinSql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,4))), 2) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE year(l_shipdate) IN (
      |  SELECT DISTINCT year(o_orderdate) FROM orders
      |  WHERE o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
      |    AND o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ KMV distinct sketch
  /** Per-group KMV distinct estimate ([[graft.operators.Sketches]]
    * K-minimum-values) — the hash-exact sibling of
    * [[qApproxDistinct]]'s HyperLogLog, whose register merge no other
    * engine can replay. Same question (distinct parts per return
    * flag), answered by a k-value deterministic sketch the DuckDB
    * oracle reproduces bit-for-bit, estimate arithmetic included.
    * `exact_parts` rides along so the accuracy contract (rel. err
    * ≈ 1/√(k−2)) is gated, not asserted in prose. At sf0.001 each
    * flag has < k distinct parts, so the exact-degradation branch is
    * the one under gate; from sf0.01 up the estimator branch is.
    * Scale: one distinct shuffle + WindowGroupLimit partial top-k
    * (KmvSpec asserts the pre-shuffle limit); the exact twin column
    * is itself one grouped count-distinct. */
  private val KmvK = 512
  private def qKmvDistinct(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val li = t("lineitem")
    val sk = Sketches.kmvPerGroup(li, "l_returnflag", "l_partkey", KmvK)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    sk.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("k_got"), col("kth_min"),
        col("est_distinct"), col("exact_parts"))
      .orderBy(col("l_returnflag"))
  }

  private def kmvEstSql(kGot: String, kthMin: String): String = {
    val num = graft.operators.Sketches.kmvNumerator(KmvK)
    s"""CASE WHEN $kGot < $KmvK THEN $kGot
       |     ELSE CAST(floor($num / CAST($kthMin AS DOUBLE)) AS BIGINT) END"""
      .stripMargin
  }

  private val qKmvDistinctSql = {
    val h = graft.operators.Sketches.kmvHashSql("l_partkey")
    s"""WITH hv AS (
       |  SELECT DISTINCT l_returnflag, $h AS hv FROM lineitem),
       |topk AS (
       |  SELECT l_returnflag, hv,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
       |  FROM hv),
       |sk AS (
       |  SELECT l_returnflag, COUNT(*) AS k_got, MAX(hv) AS kth_min
       |  FROM topk WHERE rn <= $KmvK GROUP BY 1),
       |ex AS (
       |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
       |  FROM lineitem GROUP BY 1)
       |SELECT s.l_returnflag, s.k_got, s.kth_min,
       |  ${kmvEstSql("s.k_got", "s.kth_min")} AS est_distinct,
       |  e.exact_parts
       |FROM sk s JOIN ex e USING (l_returnflag)
       |ORDER BY s.l_returnflag""".stripMargin
  }

  /** The KMV MERGE identity as a gated query: sketch each half of the
    * corpus (split by part-key parity), merge the two k-value
    * sketches, and emit the merged estimate next to the one-shot
    * whole-corpus sketch plus the symmetric difference of the two
    * sketches' value sets — which must be EMPTY (`sym_diff` = 0,
    * oracle-checked). This is the algebra that lets per-shard /
    * per-day sketches compose at 100 TB without re-reading raw data:
    * merge is k-sized work, and it is exact, not approximate. */
  private def qKmvMerge(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val li = t("lineitem")
    // each sketch is <= k rows but feeds 2-3 consumers below; caching
    // them caps the plan at three corpus scans (one per sketch build)
    // instead of one per consumer (graft.core.Caches contract)
    val whole = graft.core.Caches.track(
      Sketches.kmvSketch(li, "l_orderkey", KmvK))
    val a = Sketches.kmvSketch(
      li.where(col("l_partkey") % 2 === 0), "l_orderkey", KmvK)
    val b = Sketches.kmvSketch(
      li.where(col("l_partkey") % 2 === 1), "l_orderkey", KmvK)
    val merged = graft.core.Caches.track(Sketches.kmvMergeTwo(a, b, KmvK))
    val ew = Sketches.kmvEstimate(whole, KmvK)
      .select(col("k_got"), col("kth_min").as("kth_min_whole"),
        col("est_distinct").as("est_whole"))
    val em = Sketches.kmvEstimate(merged, KmvK)
      .select(col("kth_min").as("kth_min_merged"),
        col("est_distinct").as("est_merged"))
    val sd = whole.except(merged).union(merged.except(whole))
      .agg(count(lit(1)).as("sym_diff"))
    ew.crossJoin(em).crossJoin(sd)
  }

  private val qKmvMergeSql = {
    val h = graft.operators.Sketches.kmvHashSql("l_orderkey")
    s"""WITH hw AS (SELECT DISTINCT $h AS hv FROM lineitem),
       |skw AS (SELECT hv FROM hw ORDER BY hv LIMIT $KmvK),
       |ha AS (SELECT DISTINCT $h AS hv FROM lineitem WHERE l_partkey % 2 = 0),
       |ska AS (SELECT hv FROM ha ORDER BY hv LIMIT $KmvK),
       |hb AS (SELECT DISTINCT $h AS hv FROM lineitem WHERE l_partkey % 2 = 1),
       |skb AS (SELECT hv FROM hb ORDER BY hv LIMIT $KmvK),
       |skm AS (
       |  SELECT hv FROM (
       |    SELECT DISTINCT hv FROM (
       |      SELECT hv FROM ska UNION ALL SELECT hv FROM skb))
       |  ORDER BY hv LIMIT $KmvK),
       |ew AS (SELECT COUNT(*) AS k_got, MAX(hv) AS kth_min_whole FROM skw),
       |em AS (SELECT MAX(hv) AS kth_min_merged FROM skm),
       |sd AS (
       |  SELECT COUNT(*) AS sym_diff FROM (
       |    (SELECT hv FROM skw EXCEPT SELECT hv FROM skm)
       |    UNION ALL
       |    (SELECT hv FROM skm EXCEPT SELECT hv FROM skw)))
       |SELECT ew.k_got, ew.kth_min_whole,
       |  ${kmvEstSql("ew.k_got", "ew.kth_min_whole")} AS est_whole,
       |  em.kth_min_merged,
       |  ${kmvEstSql("ew.k_got", "em.kth_min_merged")} AS est_merged,
       |  sd.sym_diff
       |FROM ew CROSS JOIN em CROSS JOIN sd""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q_range_join", (s, d) => qRangeJoin(s, d), Some(qRangeJoinSql)),
    Q("q_range_join_native", (s, d) => qRangeJoinNative(s, d), Some(qRangeJoinSql)),
    Q("q_dpp_join", (s, d) => qDppJoin(s, d), Some(qDppJoinSql)),
    Q("q_kmv_distinct", (s, d) => qKmvDistinct(s, d), Some(qKmvDistinctSql)),
    Q("q_kmv_merge", (s, d) => qKmvMerge(s, d), Some(qKmvMergeSql)),
    Q("q_asof_join", (s, d) => qAsofJoin(s, d), Some(qAsofJoinSql)),
    Q("q_asof_join_native", (s, d) => qAsofJoinNative(s, d), Some(qAsofJoinSql)),
    Q("q_cube", (s, d) => qCube(s, d), Some(qCubeSql)),
    Q("q_row_slice", (s, d) => qRowSlice(s, d), Some(qRowSliceSql)),
    Q("q_approx_distinct", (s, d) => qApproxDistinct(s, d), None),
    Q("q_skew_salted", (s, d) => qSkewSalted(s, d), Some(qSkewSaltedSql)),
    Q("q_skew_join", (s, d) => qSkewJoin(s, d), Some(qSkewJoinSql)),
    Q("q1_pricing_summary", (s, d) => q1(s, d), Some(q1Sql)),
    Q("q3_shipping_priority", (s, d) => q3(s, d), Some(q3Sql)),
    Q("q5_local_supplier", (s, d) => q5(s, d), Some(q5Sql)),
    Q("q_window_topk", (s, d) => qWindowTopk(s, d), Some(qWindowTopkSql)),
    Q("q_lateral_topk", (s, d) => qLateralTopk(s, d), Some(qLateralTopkSql)),
    Q("q_window_running", (s, d) => qWindowRunning(s, d), Some(qWindowRunningSql)),
    Q("q_window_range", (s, d) => qWindowRange(s, d), Some(qWindowRangeSql)),
    Q("q_rollup", (s, d) => qRollup(s, d), Some(qRollupSql)),
    Q("q_semi_anti", (s, d) => qSemiAnti(s, d), Some(qSemiAntiSql)),
    Q("q_setops", (s, d) => qSetops(s, d), Some(qSetopsSql)),
    Q("q_distinct", (s, d) => qDistinct(s, d), Some(qDistinctSql)),
    Q("q_json_extract", (s, d) => qJsonExtract(s, d), Some(qJsonExtractSql)),
    Q("q_variant_extract", (s, d) => qVariantExtract(s, d), Some(qVariantExtractSql)),
    Q("q_hourly_events", (s, d) => qHourlyEvents(s, d), Some(qHourlyEventsSql)),
    Q("q_case_agg", (s, d) => qCaseAgg(s, d), Some(qCaseAggSql)))
}
