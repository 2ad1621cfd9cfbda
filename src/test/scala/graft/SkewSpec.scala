package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** sf10 fixture for the two 100× probes — SELF-HEALING: if the
    * lineitem/part files are absent (fresh machine, cleaned /tmp),
    * regenerate them from the driver's sf0.1 via the deterministic
    * [[graft.tools.MakeSf.build]] replicate instead of silently
    * canceling, so `sbt test` from a clean checkout still exercises
    * the production-threshold skew evidence. Bounded: two tables at
    * one 100× replicate (~60 M lineitem rows), paid once per machine.
    * Opt out with SPARK_GRAFT_NO_FIXTURE_GEN=1 (documented skip). */
  private lazy val sf10Dir: Option[String] = {
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_BIGSF_DIR", "/tmp/sf10")
    val src = "/root/testdata/sf0.1"
    val need = Seq("lineitem", "part").filterNot(t =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$sf10/$t.parquet")))
    if (need.isEmpty) Some(sf10)
    else if (sys.env.contains("SPARK_GRAFT_NO_FIXTURE_GEN")) None
    else if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$src/lineitem.parquet"))) None
    else {
      graft.tools.MakeSf.build(spark, src, sf10, 100, need.toSet)
      Some(sf10)
    }
  }

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

  test("sf10: AQE splits q_skew_join's engineered hot key with PRODUCTION thresholds") {
    // The one 100 TB failure mode previously proven only at bench SF:
    // a skewed shuffle. At sf10 the q_skew_join fact side puts 30 M
    // rows (half of lineitem) on part key 1 — big enough that AQE's
    // DEFAULT skew definition (256 MB AND 5x median, post-compression
    // map sizes) fires with no tuned-down thresholds. Runs only where
    // the big-SF fixture exists (the driver/dev hosts keep /tmp/sf10;
    // a bare container gets the documented skip).
    val sf10 = sf10Dir.getOrElse(cancel(
      "big-SF fixture absent and regeneration unavailable (no sf0.1 " +
        "source or SPARK_GRAFT_NO_FIXTURE_GEN=1): skipping 100x skew evidence"))
    val c = spark.conf
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      // 64 reducers so the median partition is corpus/64, not
      // corpus/4 — the production shape where one hot key dwarfs the
      // median. Skew thresholds themselves stay at the DEFAULTS.
      c.set("spark.sql.shuffle.partitions", "64")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // an incompressible payload rides along because skew detection
      // reads map output sizes POST-compression: a constant key + 3
      // numerics lz4-packs the 30 M-row hot partition under the 256 MB
      // default and AQE (correctly) sees no skew; md5 hex keeps the
      // bytes honest — a production fact row is never 32 bytes either
      val fact = graft.core.Tables.lineitem(spark, sf10).select(
        when($"l_orderkey" % 2 === 0, lit(1L)).otherwise($"l_partkey")
          .as("p_partkey"),
        $"l_orderkey", $"l_extendedprice", $"l_discount",
        md5(concat_ws("|", $"l_orderkey", $"l_linenumber")).as("pad"))
      val dim = graft.core.Tables.table(spark, sf10, "part")
        .select($"p_partkey", $"p_brand")
      // the agg must CONSUME the payload — otherwise Catalyst's column
      // pruning (correctly) strips it below the fact Exchange and the
      // shuffled hot partition is 8 bytes/row again
      val agg = fact.join(dim, "p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), sum(length($"pad")).as("padlen"))
      val rows = agg.collect()
      assert(rows.map(_.getLong(1)).sum == 60000000L)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the sf10 hot partition skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("sf10: saltedJoin fans the 30M-row hot key across all 8 salts") {
    // Runtime counterpart of the plan-shape assertion: the salt
    // actually SPREADS the hot key's 30 M rows near-uniformly at
    // 100x bench SF (hash of varying l_orderkey/qty), so no single
    // reducer holds the key.
    val sf10 = sf10Dir.getOrElse(cancel(
      "big-SF fixture absent and regeneration unavailable (no sf0.1 " +
        "source or SPARK_GRAFT_NO_FIXTURE_GEN=1): skipping 100x skew evidence"))
    val fact = graft.core.Tables.lineitem(spark, sf10).select(
      when($"l_orderkey" % 2 === 0, lit(1L)).otherwise($"l_partkey")
        .as("p_partkey"),
      $"l_orderkey",
      $"l_quantity".cast(org.apache.spark.sql.types.DecimalType(30, 4))
        .as("qty"))
    val perSalt = fact
      .withColumn("_salt", pmod(xxhash64(fact.columns.map(col): _*), lit(8L)))
      .where($"p_partkey" === 1L)
      .groupBy($"_salt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSalt.keySet == (0L until 8L).toSet,
      s"hot key missing salts: ${perSalt.keySet}")
    // all 30 M even-orderkey rows, plus the handful of odd-orderkey
    // rows whose NATURAL l_partkey is 1 — the hot key absorbs both
    val total = perSalt.values.sum
    assert(total >= 30000000L && total < 30100000L, s"hot key rows: $total")
    // near-uniform: every salt holds at least half its fair share
    assert(perSalt.values.min > total / 16,
      s"salt spread collapsed: $perSalt")
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
