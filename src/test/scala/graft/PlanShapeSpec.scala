package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that make these queries
  * scale — filters reaching the parquet scan, column pruning, small
  * dimensions broadcast, top-k via TakeOrderedAndProject (no full
  * sort), whole-stage codegen on the hot path. Run at sf0.001; the
  * plan shape is scale-invariant even though the data is tiny.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.SfDir

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q6: every predicate is pushed to the parquet scan") {
    val p = planOf("q6_forecast_revenue")
    // the plan's toString elides the tail of the PushedFilters list,
    // so assert on the visible prefix + the Filter node predicates
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p)
    assert(p.contains(">= 0.05)") && p.contains("< 24.0)"), p)
  }

  test("q1: scan reads only the columns the query needs") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey")
      && !p.contains("l_orderkey"), s"unpruned columns in:\n$p")
  }

  test("q5: all four dimension joins are broadcast") {
    val p = planOf("q5_local_supplier")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 4, s"expected >=4 broadcast joins, got $n in:\n$p")
  }

  test("q3/q10/q18: top-k is TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q3_shipping_priority", "q10_returned_items",
        "q18_large_orders")) {
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q plan:\n$p")
    }
  }

  test("q1 aggregates inside whole-stage codegen with partial aggregation") {
    val p = planOf("q1_pricing_summary")
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(p.contains("*(1)"), p)
    // partial (map-side) aggregate before the exchange
    assert(p.contains("partial_sum"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q_dedup_exact shuffles the 8-byte hash, not the text") {
    val df = SparkEntry.queries("q_dedup_exact")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the exchange partitions on the grouped key (content_key),
    // and the scan prunes to the two columns used
    assert(!p.contains("lang") && !p.contains("source"),
      s"unpruned document columns in:\n$p")
  }
}
