package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Depth stress for the recursive-CTE gapfill spine: the fixture's
  * event window is ~30 days (30 iterative levels), so the sf ladder
  * never exercises the guard headroom. This drives the SAME query
  * shape over a synthetic MULTI-YEAR span — ~1100 day-step levels
  * from a handful of input rows — proving the recursion depth tracks
  * range/step (the time window), not row count, and that the
  * `MAX RECURSION LEVEL 5000` guard has real headroom over any
  * plausible event-lake window (13+ years of days). */
class RcteDepthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("day-step recursion completes a ~1100-level multi-year span") {
    // two groups, THREE input rows each, spanning 1100 days: depth is
    // a function of the span alone — 1100 levels here vs 30 at every
    // bench SF, while sf10 feeds 10M rows through the same 30 levels
    val spanDays = 1100
    val t0 = Timestamp.valueOf("2020-01-01 05:00:00")
    def plusDays(d: Int) = new Timestamp(t0.getTime + d * 86400000L)
    val rows = Seq(
      ("click", t0), ("click", plusDays(400)), ("click", plusDays(spanDays)),
      ("view", plusDays(3)), ("view", plusDays(700)), ("view", plusDays(987)))
    val hours = rows.toDF("event_type", "hour")

    val out = graft.queries.LakeQueries.gapfillRcteOver(spark, hours)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_hours"), sum($"n_events").as("n_nonzero"),
        min($"hour").as("mn"), max($"hour").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .toMap

    // dense spine: every hour between each group's min and max,
    // inclusive — (span in hours) + 1 rows, zero-filled
    val clickHours = spanDays.toLong * 24 + 1
    val viewHours = (987L - 3L) * 24 + 1
    assert(out("click")._1 == clickHours, s"click: ${out("click")}")
    assert(out("view")._1 == viewHours, s"view: ${out("view")}")
    // exactly the input rows are nonzero (distinct hours each)
    assert(out("click")._2 == 3L && out("view")._2 == 3L)
    // the spine is clipped to each group's own bounds
    assert(out("click")._3 == t0 && out("click")._4 == plusDays(spanDays))
    assert(out("view")._3 == plusDays(3) && out("view")._4 == plusDays(987))
  }
}
