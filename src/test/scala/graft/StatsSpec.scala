package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Statistical analytics surfaces ([[graft.queries.StatsQueries]]). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("moving average stays within the window's min/max envelope") {
    val ma = graft.SparkEntry.queries("q_moving_avg")(spark, dir).cache()
    // MA of non-negative counts is non-negative and ≤ window max ≤ global max
    val mx = ma.agg(max("n_events")).head().getLong(0)
    assert(ma.where(col("ma7") < 0 || col("ma7") > mx).count() === 0)
    // a zero-filled gap must be averaged over: at sf0.001 gaps exist,
    // so some MA values are strictly between 0 and 1
    assert(ma.where(col("ma7") > 0 && col("ma7") < 1).count() > 0)
    ma.unpersist()
  }

  test("cohort retention: offset-0 count equals the cohort size") {
    val ret = graft.SparkEntry.queries("q_cohort_retention")(spark, dir).cache()
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohortSizes = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      .groupBy("cohort_day").agg(countDistinct("user_id").as("expected"))
    val day0 = ret.where(col("offset") === 0)
      .join(cohortSizes, "cohort_day")
    // every user is active on their own first day
    assert(day0.where(col("n_users") =!= col("expected")).count() === 0)
    // retention is monotonically bounded by cohort size at every offset
    val over = ret.join(cohortSizes, "cohort_day")
      .where(col("n_users") > col("expected"))
    assert(over.count() === 0)
    ret.unpersist()
  }

  test("histogram bins partition the corpus exactly") {
    val h = graft.SparkEntry.queries("q_histogram")(spark, dir)
    val total = h.agg(sum("n")).head().getLong(0)
    assert(total === Tables.documents(spark, dir).count())
    assert(h.where(col("bin") < 0 || col("bin") > 9).count() === 0)
  }

  test("winsorized mean lies within the clip bounds") {
    val w = graft.SparkEntry.queries("q_winsorize")(spark, dir)
    assert(w.where(col("mean_winsorized") < col("p05") ||
      col("mean_winsorized") > col("p95")).count() === 0)
    // clip accounting: strictly-below-p05 (resp. above-p95) values
    // number at most floor(0.05·(n−1)) + 1 under linear interpolation
    val bound = floor((col("n") - 1) * 0.05) + 1
    assert(w.where(col("n_clip_lo") > bound || col("n_clip_hi") > bound)
      .count() === 0)
  }

  test("histogram-path grouped quantile equals sort-based percentile exactly") {
    import graft.operators.Quantiles
    val d = Tables.documents(spark, dir).select(col("lang"), col("n_chars"))
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val hist = Quantiles.exactGroupedQuantile(d, "lang", "n_chars", p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sorted = d.groupBy("lang")
        .agg(expr(s"percentile(n_chars, $p)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      hist.foreach { case (l, v) =>
        assert(v === sorted(l), s"p=$p lang=$l: $v vs ${sorted(l)}")
      }
    }
  }

  test("histogram-interpolated percentile within one bin width of the exact percentile") {
    // the deterministic error bound the q_approx_percentile_hist
    // scaladoc claims: |est - exact| <= range/B per group.
    // LARGE-n assumption (stated in the scaladoc): the estimate
    // targets rank p*n, the exact type-7 percentile rank p*(n-1)+1;
    // that <=1-rank convention offset is negligible at this fixture's
    // group sizes (thousands of rows per flag) but could push a TINY
    // group's exact quantile into an adjacent bin — this bound is
    // asserted at gated sizes, not claimed universally.
    val li = Tables.lineitem(spark, dir)
    val est = graft.SparkEntry.queries("q_approx_percentile_hist")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("q"),
        ((max(col("l_extendedprice")) - min(col("l_extendedprice"))) / 1000.0)
          .as("wd"))
      .collect().map { r =>
        val q = r.getSeq[Double](1)
        r.getString(0) -> (q(0), q(1), r.getDouble(2))
      }.toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (flag, (p50, p95)) =>
      val (e50, e95, wd) = exact(flag)
      assert(math.abs(p50 - e50) <= wd, s"$flag p50: $p50 vs $e50 (wd=$wd)")
      assert(math.abs(p95 - e95) <= wd, s"$flag p95: $p95 vs $e95 (wd=$wd)")
    }
  }

  test("exact-sum Pearson r matches the builtin corr to float tolerance") {
    val r = graft.SparkEntry.queries("q_correlation")(spark, dir)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    val builtin = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"flag $k: $v vs ${builtin(k)}")
      assert(v >= -1.0 && v <= 1.0)
    }
  }
}
