package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.plans.RangeJoinNative

/** The custom-physical-operator equi+range join (RangeJoinPlan +
  * Strategy + RangeJoinExec) must agree row-for-row with the composed
  * equi-join + band-residual form, plan through the custom exec with
  * the exchanges/sorts Catalyst inserts from its declared
  * requirements, and push filters to BOTH sides (inner-join pairs are
  * independent, unlike the as-of node's latest-row dependency). */
class RangeJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.SfDir

  private def ev = Tables.events(spark, SfDir)
    .select(col("user_id"), col("event_id"), col("ts"))
  private def ord = Tables.orders(spark, SfDir)
    .select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("win_lo"),
      (col("o_orderdate").cast("timestamp") + expr("INTERVAL 12000 DAYS"))
        .as("win_hi"))

  private def native = RangeJoinNative.rangeJoin(ev, ord,
    "user_id", "o_custkey", "ts", "win_lo", "win_hi")

  test("native range join matches the composed equi-join + band filter") {
    val composed = ev.join(ord,
      col("user_id") === col("o_custkey") &&
        col("ts") >= col("win_lo") && col("ts") <= col("win_hi"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(3))
    val n = native.select(col("user_id"), col("event_id"), col("ts"),
      col("o_orderkey")).collect().map(key).sorted.toSeq
    val c = composed.select(col("user_id"), col("event_id"), col("ts"),
      col("o_orderkey")).collect().map(key).sorted.toSeq
    assert(n.nonEmpty)
    assert(n == c)
  }

  test("plans through RangeJoinExec; exchanges/sorts come from declared requirements") {
    val df = native
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), plan)
    // EnsureRequirements hash-clusters each child on its key …
    assert(plan.contains("hashpartitioning(user_id"), plan)
    assert(plan.contains("hashpartitioning(o_custkey"), plan)
    // … and sorts both within partitions
    assert("Sort \\[".r.findAllIn(plan).length >= 2, plan)
  }

  test("filters push below the range join on BOTH sides") {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import graft.plans.RangeJoinPlan
    val filtered = native
      .where(col("user_id") < 10L && col("o_orderkey") % 2 === 0)
    val opt = filtered.queryExecution.optimizedPlan
    val join = opt.collectFirst { case j: RangeJoinPlan => j }
    assert(join.isDefined, opt.toString)
    // no Filter remains above the join …
    assert(opt.collectFirst {
      case f: Filter if f.collectFirst { case j: RangeJoinPlan => j }.isDefined => f
    }.isEmpty, opt.toString)
    // … each conjunct moved into its own child
    assert(join.get.left.collectFirst { case f: Filter => f }.isDefined, opt.toString)
    assert(join.get.right.collectFirst { case f: Filter => f }.isDefined, opt.toString)
    // semantics unchanged vs pre-filtering by hand
    val prefiltered = RangeJoinNative.rangeJoin(
      ev.where(col("user_id") < 10L),
      ord.where(col("o_orderkey") % 2 === 0),
      "user_id", "o_custkey", "ts", "win_lo", "win_hi")
    val a = filtered.select("event_id", "o_orderkey").collect().toSet
    val b = prefiltered.select("event_id", "o_orderkey").collect().toSet
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("NULL key/value/bounds never match; empty bands match nothing") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(100L), "e-ok"),
      (None, Some(100L), "e-nullk"),
      (Some(1L), Option.empty[Long], "e-nullv"))
      .toDF("k", "v", "ev")
    val r = Seq(
      (Some(1L), Some(50L), Some(150L), "r-hit"),
      (Some(1L), Some(150L), Some(50L), "r-empty"),   // lo > hi
      (None, Some(0L), Some(1000L), "r-nullk"),
      (Some(1L), Option.empty[Long], Some(1000L), "r-nulllo"),
      (Some(1L), Some(0L), Option.empty[Long], "r-nullhi"))
      .toDF("rk", "lo", "hi", "pay")
    val out = RangeJoinNative.rangeJoin(l, r, "k", "rk", "v", "lo", "hi")
      .select(col("ev"), col("pay")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(out == Set("e-ok" -> "r-hit"))
  }

  test("inclusive bounds on both ends") {
    import spark.implicits._
    val l = Seq((1L, 50L, "at-lo"), (1L, 150L, "at-hi"),
      (1L, 49L, "below"), (1L, 151L, "above"))
      .toDF("k", "v", "ev")
    val r = Seq((1L, 50L, 150L, "band")).toDF("rk", "lo", "hi", "pay")
    val out = RangeJoinNative.rangeJoin(l, r, "k", "rk", "v", "lo", "hi")
      .select(col("ev")).collect().map(_.getString(0)).toSet
    assert(out == Set("at-lo", "at-hi"))
  }

  test("self-join lineage gets fresh exprIds on the right side") {
    import spark.implicits._
    val base = Seq((1L, 100L), (1L, 200L)).toDF("k", "v")
    val right = base.select(col("k"), (col("v") - 50L).as("lo"),
      (col("v") + 50L).as("hi"), col("v").as("rv"))
    val out = RangeJoinNative.rangeJoin(base, right, "k", "k", "v", "lo", "hi")
      .toDF("k", "v", "rk", "lo", "hi", "rv")
    val rows = out.select(col("v"), col("rv")).as[(Long, Long)]
      .collect().toSet
    // each v only inside its own ±50 band (bands are 100 apart)
    assert(rows == Set((100L, 100L), (200L, 200L)))
  }

  test("hot key group: interval-index enumeration matches brute force") {
    import spark.implicits._
    // one key, 200 nested/overlapping/disjoint intervals, 100 probes —
    // the regime where the builtin plan re-filters the whole group per
    // probe and the index must still enumerate the exact match set
    val rng = new scala.util.Random(7)
    val intervals = (0 until 200).map { i =>
      val lo = rng.nextInt(1000).toLong
      (1L, lo, lo + rng.nextInt(300).toLong, i.toLong)
    }
    val probes = (0 until 100).map(i => (1L, rng.nextInt(1400).toLong, i.toLong))
    val r = intervals.toDF("rk", "lo", "hi", "rid")
    val l = probes.toDF("k", "v", "lid")
    val out = RangeJoinNative.rangeJoin(l, r, "k", "rk", "v", "lo", "hi")
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    val expect = (for {
      (_, v, lid) <- probes
      (_, lo, hi, rid) <- intervals
      if lo <= v && v <= hi
    } yield (lid, rid)).toSet
    assert(out == expect)
    assert(expect.nonEmpty)
  }
}
