package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows on one key — the shape that funnels one reducer
    val df = spark.range(20000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        ($"id" % 100).cast("long").as("v"))
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy($"k").collect().toSeq
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .orderBy($"k").collect().toSeq
    assert(salted == direct)
  }

  test("stage 1 spreads a hot key across salt sub-keys") {
    val df = spark.range(1000).select(lit(0L).as("k"), $"id".as("v"))
    // with one key and 8 salts the two-stage plan has two exchanges
    val out = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2, p)
  }

  test("AQE OptimizeSkewedJoin splits the hot partition of a skewed SMJ") {
    // Joins rely on AQE's runtime skew split rather than manual
    // salting (Skew.saltedAgg covers aggregation). This proves the
    // reliance is real on this engine's session shape: a 90%-hot-key
    // sort-merge join must come out of AQE with skew=true splits.
    // Thresholds are lowered to make a local-scale fixture skewed by
    // AQE's definition (factor x median AND absolute bytes); the
    // mechanism is identical at 100 TB with the defaults (256 MB).
    val c = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // pad must be INCOMPRESSIBLE: skew detection reads the shuffle
      // map sizes post-compression, and a constant pad lz4-compresses
      // below any threshold no matter how many rows pile on the key
      val left = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 10 = 0 THEN id % 100 ELSE 0 END AS k",
        "concat(md5(cast(id AS string)), md5(cast(id + 7 AS string))) AS pad")
      val right = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
      val joined = left.join(right, "k")
      // execute through the Dataset's OWN QueryExecution — .write /
      // .foreach / .count all build a fresh one and would leave this
      // plan un-finalized; collect() is the action that drives it
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the SMJ skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // The third leg of the runtime-optimization evidence (with AQE
    // skew split and coalesce): InjectRuntimeFilter must push a bloom
    // filter built from the SELECTIVE dimension side into the fact
    // scan, so at 100 TB the join reads a fraction of the fact table.
    // The application-side size threshold defaults to 10 GB — far
    // above any local fixture — so it is lowered here; the mechanism
    // is identical at scale with the defaults.
    val c = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // broadcast joins skip runtime filters (broadcast IS the filter);
      // force the shuffle-join shape the 100 TB fact join takes
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = graft.core.Tables.lineitem(spark, TestSpark.SfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = graft.core.Tables.orders(spark, TestSpark.SfDir)
        .where(col("o_orderpriority") === "1-URGENT") // selective dim filter
        .select(col("o_orderkey"), col("o_custkey"))
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected InjectRuntimeFilter to add a bloom probe to the fact scan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("saltedJoin equals the plain join on an engineered hot key and fans it across salts") {
    // one key carries half the fact — the single-stuck-reducer shape
    val fact = spark.range(20000).select(
      when($"id" % 2 === 0, lit(1L)).otherwise($"id" % 50 + 2).as("k"),
      $"id".as("v"))
    val dim = spark.range(60).select($"id".as("k"), ($"id" * 7).as("w"))
    val direct = fact.join(dim, Seq("k"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), sum($"w").as("sw"))
      .orderBy($"k").collect().toSeq
    val viaSalt = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), sum($"w").as("sw"))
      .orderBy($"k").collect().toSeq
    assert(viaSalt == direct, "salt leaked into the join result")
    // the hot key's rows really spread over all 8 salt sub-keys
    // (same full-row salt expression saltedJoin derives)
    val hotSalts = fact.where($"k" === 1L)
      .select(pmod(xxhash64(fact.columns.map(col): _*), lit(8L)).as("s"))
      .distinct().count()
    assert(hotSalts == 8L, s"hot key landed on only $hotSalts salts")
    // and the physical join is keyed on (k, _salt) — the salt is in
    // the join, not just in a projection
    val j = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan.take(1000))
  }

  test("saltCols restores fan-out when a hot key's rows are identical") {
    // FULLY identical (key, value) rows: the full-row hash maps all of
    // them to one salt (documented limitation) — salting on a stable
    // per-row id must spread them AND stay correct
    val df = spark.range(5000)
      .select($"id", lit(0L).as("k"), lit(1L).as("v"))
    val allCols = df.drop("id")
    // full-row default over identical rows: ONE distinct salt
    val defSalts = allCols.select(
      pmod(xxhash64(allCols.columns.map(col): _*), lit(8L)).as("s"))
      .distinct().count()
    assert(defSalts == 1L, s"expected degenerate 1 salt, got $defSalts")
    // id-salted: all 8 salts populated, result identical to direct agg
    val idSalts = df.select(pmod(xxhash64($"id"), lit(8L)).as("s"))
      .distinct().count()
    assert(idSalts == 8L, s"expected 8 salts via id, got $idSalts")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total")).collect().toSeq
    val salted = Skew.saltedCountSum(df.select($"k", $"v", $"id"),
        Seq("k"), "v", salts = 8, saltCols = Seq("id"))
      .collect().toSeq
    assert(salted == direct)
  }
}
