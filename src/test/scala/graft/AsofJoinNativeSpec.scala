package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, AsofJoinNative}

/** The custom-physical-operator as-of join (AsofJoinPlan + Strategy +
  * AsofJoinExec) must agree row-for-row with the composed union+window
  * form, and must actually plan through the custom exec with the
  * exchanges/sorts Catalyst inserts from its declared requirements. */
class AsofJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.SfDir

  private def ev = Tables.events(spark, SfDir)
    .select(col("event_id"), col("user_id"), col("ts"))
  private def ord = Tables.orders(spark, SfDir)
    .groupBy(col("o_custkey"),
      col("o_orderdate").cast("timestamp").as("o_orderdate"))
    .agg(max(col("o_orderkey")).as("o_orderkey"),
      max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))

  private def native = AsofJoinNative.asofJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate")
    .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))

  test("native as-of join matches the composed union+window form") {
    val composed = AsofJoin.asofJoin(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
    val n = native.orderBy("event_id").collect().toSeq
    val c = composed.orderBy("event_id").collect().toSeq
    assert(n.nonEmpty)
    assert(n == c)
  }

  test("plans through AsofJoinExec") {
    val df = native
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
  }

  test("left-side filters push below the as-of join") {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import graft.plans.AsofJoinPlan
    val filtered = AsofJoinNative.asofJoin(ev, ord,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .where(col("user_id") < 10L)
    val opt = filtered.queryExecution.optimizedPlan
    val join = opt.collectFirst { case j: AsofJoinPlan => j }
    assert(join.isDefined, opt.toString)
    // no Filter remains above the join …
    assert(opt.collectFirst {
      case f: Filter if f.collectFirst { case j: AsofJoinPlan => j }.isDefined => f
    }.isEmpty, opt.toString)
    // … it moved into the left child
    assert(join.get.left.collectFirst { case f: Filter => f }.isDefined, opt.toString)
    // semantics unchanged: pre-filtering the left side == post-filtering the join
    val prefiltered = AsofJoinNative.asofJoin(
        ev.where(col("user_id") < 10L), ord,
        "user_id", "o_custkey", "ts", "o_orderdate")
    val a = filtered.select("event_id", "o_orderkey", "o_totalprice").collect().toSet
    val b = prefiltered.select("event_id", "o_orderkey", "o_totalprice").collect().toSet
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("NULL keys and timestamps never match (SQL semantics)") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(100L), "e-ok"),     // normal match
      (None,     Some(100L), "e-nullk"),  // null key → no match
      (Some(1L), None,       "e-nullt"))  // null ts → no match
      .toDF("k", "t", "ev")
    val r = Seq(
      (Some(1L), Some(50L), "r50"),
      (None,     Some(10L), "r-nullk"),   // null right key → never a match
      (Some(1L), None,      "r-nullt"))   // null right ts → never a match
      .toDF("rk", "rt", "pay")
    val out = AsofJoinNative.asofJoin(l, r, "k", "rk", "t", "rt")
      .select(col("ev"), col("pay")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // only the fully-non-null pair joins; a null rightTs (sorting
    // first) must NOT be picked up as "earliest" candidate either
    assert(out == Set("e-ok" -> "r50"))
  }

  test("composed as-of join also never matches NULL key/ts") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(100L), "e-ok"),
      (None,     Some(100L), "e-nullk"),
      (Some(1L), None,       "e-nullt"))
      .toDF("k", "t", "ev")
    val r = Seq(
      (Some(1L), Some(50L), "r50"),
      (None,     Some(10L), "r-nullk"),
      (Some(1L), None,      "r-nullt"))
      .toDF("rk", "rt", "pay")
    val out = AsofJoin.asofJoin(l, r, "k", "rk", "t", "rt", Seq("pay"))
      .select(col("ev"), col("pay")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(out == Set("e-ok" -> "r50"))
  }

  test("self-join lineage gets fresh exprIds on the right side") {
    import spark.implicits._
    val base = Seq((1L, 100L, 1.0), (1L, 200L, 2.0)).toDF("k", "t", "v")
    // the right side shares the left's lineage UNALIASED — identical
    // exprIds on both sides without deduplication
    val right = base.where(col("t") <= 100L)
    val out = AsofJoinNative.asofJoin(base, right, "k", "k", "t", "t")
      .toDF("k", "t", "v", "rk", "rt", "rv")
    // left t=200 matches right t=100: a correct right-side binding
    // yields rt=100 there; duplicate exprIds would collapse rt onto t
    val rows = out.select(col("t"), col("rt")).as[(Long, Long)]
      .collect().toSet
    assert(rows == Set((100L, 100L), (200L, 100L)))
  }

  test("ties on equal timestamps are inclusive (right.ts <= left.ts)") {
    import spark.implicits._
    val l = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "t", "ev")
    val r = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (3L, 10L, "rx"))
      .toDF("k", "t", "pay")
    val out = AsofJoinNative.asofJoin(
        l, r.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
        "k", "rk", "t", "rt")
      .select(col("ev"), col("pay")).collect().map(x => (x.getString(0), x.getString(1))).toSet
    // e1 matches the equal-ts r100; e2 the later r150; e3 has no prior row → drops
    assert(out == Set("e1" -> "r100", "e2" -> "r150"))
  }
}
