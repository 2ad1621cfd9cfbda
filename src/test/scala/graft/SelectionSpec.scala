package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    // group a: 10 rows conf 1..10 → p25=3.25, p75=7.75 → band {4..7}
    (1 to 10).map(i => ("a", i.toLong, i.toDouble)),
    // group b: 3 rows (below minGroupSize) → passthrough
    Seq(("b", 100L, 1.0), ("b", 101L, 50.0), ("b", 102L, 99.0))
  ).flatten.toDF("grp", "id", "conf")

  test("percentileBand keeps the 25–75 band, linear interpolation") {
    val out = Selection.percentileBand(fixture, "grp", "conf",
      minGroupSize = 5)
    val a = out.where($"grp" === "a").select("id").as[Long].collect().sorted
    assert(a.toSeq == Seq(4L, 5L, 6L, 7L))
  }

  test("percentileBand passes small groups through whole") {
    val out = Selection.percentileBand(fixture, "grp", "conf",
      minGroupSize = 5)
    assert(out.where($"grp" === "b").count() == 3)
  }

  test("strideSample takes every len/n-th in order, at most n") {
    val df = (1 to 20).map(i => ("g", i.toLong)).toDF("grp", "id")
    val out = Selection.strideSample(df, "grp", "id", 5)
      .select("id").as[Long].collect().sorted.toSeq
    // step = 20/5 = 4 → ids 1, 5, 9, 13, 17
    assert(out == Seq(1L, 5L, 9L, 13L, 17L))
  }

  test("strideSample passes groups smaller than n") {
    val df = (1 to 3).map(i => ("g", i.toLong)).toDF("grp", "id")
    assert(Selection.strideSample(df, "grp", "id", 5).count() == 3)
  }

  test("poolSplit partitions the pool") {
    val pool = (1L to 100L).toDF("id")
    val sel = Seq(3L, 7L, 9L).toDF("id")
    val (lab, unlab) = Selection.poolSplit(pool, sel, "id")
    assert(lab.count() == 3 && unlab.count() == 97)
    assert(lab.intersect(unlab).count() == 0)
  }

  test("sliceRows honors [start, end) and -1") {
    val df = (1L to 10L).toDF("id")
    assert(Selection.sliceRows(df, "id", 2, 5).as[Long].collect().sorted.toSeq
      == Seq(3L, 4L, 5L))
    assert(Selection.sliceRows(df, "id", 8, -1).count() == 2)
    // degenerate / out-of-range slices are empty, never an error
    assert(Selection.sliceRows(df, "id", 5, 3).count() == 0)
    assert(Selection.sliceRows(df, "id", 20, 25).count() == 0)
    assert(Selection.sliceRows(df, "id", 20, -1).count() == 0)
  }

  test("sliceRows: both paths equal sorted-take semantics on shuffled input") {
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((1L to 500L).toVector)
    val df = ids.toDF("id").repartition(7)
    val sorted = (1L to 500L).toVector
    // small-bound path (offset/limit)
    assert(Selection.sliceRows(df, "id", 37, 61).as[Long].collect().sorted.toSeq
      == sorted.slice(37, 61))
    // deep path (zipWithIndex; end = -1)
    assert(Selection.sliceRows(df, "id", 490, -1).as[Long].collect().sorted.toSeq
      == sorted.slice(490, 500))
  }

  test("sampleByStrategy orders by metric") {
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 3.0)).toDF("id", "m")
    val least = Selection.sampleByStrategy(df, "LeastConfidence", 2, $"m")
      .select("id").as[Long].collect().toSet
    assert(least == Set(2L, 3L))
  }

  test("tokenBudgetSelect equals the naive global greedy window") {
    import org.apache.spark.sql.expressions.Window
    // adversarial: duplicate scores straddling bucket boundaries
    // (0.1239 vs 0.124), many ties inside one bucket, varying tokens
    val df = (1 to 400).map { i =>
      val score = (i % 25) / 200.0 + (if (i % 3 == 0) 0.0005 else 0.0)
      (i.toLong, score, (i % 7 + 1).toLong)
    }.toDF("id", "score", "ntok")
    for (budget <- Seq(0L, 17L, 250L, 800L, 100000L)) {
      val got = Selection.tokenBudgetSelect(df, "id", "score", "ntok", budget)
        .select($"id", $"cum_tokens").as[(Long, Long)].collect().toMap
      val wNaive = Window.orderBy($"score".desc, $"id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum_tokens", sum($"ntok").over(wNaive))
        .where($"cum_tokens" <= budget)
        .select($"id", $"cum_tokens").as[(Long, Long)].collect().toMap
      assert(got == want, s"budget=$budget")
      assert(got.values.forall(_ <= budget))
    }
  }

  test("tokenBudgetSelect fails loudly on null or out-of-[0,1] scores") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val outOfRange = Seq((1L, 0.5, 1L), (2L, 1.5, 1L)).toDF("id", "score", "ntok")
    val e1 = intercept[Exception] {
      Selection.tokenBudgetSelect(outOfRange, "id", "score", "ntok", 10L).collect()
    }
    assert(msgChain(e1).contains("must be non-null in [0,1]"), msgChain(e1))
    val withNull = Seq((1L, Some(0.5), 1L), (2L, None: Option[Double], 1L))
      .toDF("id", "score", "ntok")
    val e2 = intercept[Exception] {
      Selection.tokenBudgetSelect(withNull, "id", "score", "ntok", 10L).collect()
    }
    assert(msgChain(e2).contains("must be non-null in [0,1]"), msgChain(e2))
    // boundary values 0.0 and 1.0 are legal, not guard-tripped
    val ok = Seq((1L, 0.0, 1L), (2L, 1.0, 1L)).toDF("id", "score", "ntok")
    assert(Selection.tokenBudgetSelect(ok, "id", "score", "ntok", 10L).count() == 2)
  }

  test("stratifiedFractionSample equals the naive per-stratum window") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (s"L${i % 3}", i.toLong)).toDF("lang", "id")
    for (f <- Seq(0.0, 0.07, 0.1, 0.5, 1.0)) {
      val got = Selection.stratifiedFractionSample(df, "lang", "id", f)
        .select($"lang", $"id").as[(String, Long)].collect().toSet
      val byLang = Window.partitionBy($"lang")
      val w = byLang.orderBy(md5($"id".cast("string")), $"id")
      val want = df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(byLang))
        .where($"rn" <= ceil($"cnt" * f))
        .select($"lang", $"id").as[(String, Long)].collect().toSet
      assert(got == want, s"fraction=$f")
    }
  }

  test("stratifiedFractionSample plan windows per (stratum, bucket)") {
    val df = (1 to 100).map(i => (s"L${i % 2}", i.toLong)).toDF("lang", "id")
    val plan = Selection.stratifiedFractionSample(df, "lang", "id", 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(lang") &&
      plan.contains("_ss_bucket"),
      s"expected (stratum, bucket)-partitioned window exchange in:\n$plan")
  }

  test("tokenBudgetSelect plan sorts per bucket, not globally") {
    // the row-bearing window must be hash-partitioned on the bucket;
    // the only single-partition window allowed is the ≤1001-row
    // histogram (its input is an Aggregate, not the row stream)
    val df = (1 to 100).map(i => (i.toLong, i / 100.0, 1L))
      .toDF("id", "score", "ntok")
    val plan = Selection.tokenBudgetSelect(df, "id", "score", "ntok", 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_tb_bucket"),
      s"expected bucket-partitioned window exchange in:\n$plan")
  }

  test("tokenBudgetSelect fails loudly on null or negative token counts") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val negative = Seq((1L, 0.5, 3L), (2L, 0.6, -1L)).toDF("id", "score", "ntok")
    val e1 = intercept[Exception] {
      Selection.tokenBudgetSelect(negative, "id", "score", "ntok", 10L).collect()
    }
    assert(msgChain(e1).contains("must be non-null and >= 0"), msgChain(e1))
    val withNull = Seq((1L, 0.5, Some(3L)), (2L, 0.6, None: Option[Long]))
      .toDF("id", "score", "ntok")
    val e2 = intercept[Exception] {
      Selection.tokenBudgetSelect(withNull, "id", "score", "ntok", 10L).collect()
    }
    assert(msgChain(e2).contains("must be non-null and >= 0"), msgChain(e2))
    // zero-token rows are legal (and selectable at the exact frontier)
    val ok = Seq((1L, 0.9, 0L), (2L, 0.5, 10L)).toDF("id", "score", "ntok")
    assert(Selection.tokenBudgetSelect(ok, "id", "score", "ntok", 10L).count() == 2)
  }

  test("tokenBudgetSelect prunes past-frontier buckets before the sort") {
    import org.apache.spark.sql.catalyst.plans.logical
    // corpus ≫ budget: 10k rows of 5 tokens each, budget 40 — only the
    // top bucket(s) may reach the refinement window
    val df = (1 to 10000).map(i => (i.toLong, (i % 100) / 100.0, 5L))
      .toDF("id", "score", "ntok")
    val out = Selection.tokenBudgetSelect(df, "id", "score", "ntok", 40L)
    // correctness at the frontier: 8 best rows selected
    assert(out.count() == 8)
    val lp = out.queryExecution.optimizedPlan
    val windows = lp.collect {
      case w: logical.Window
        if w.partitionSpec.exists(_.toString.contains("_tb_bucket")) => w
    }
    assert(windows.nonEmpty, s"expected a bucket-partitioned Window in:\n$lp")
    windows.foreach { w =>
      val pruned = w.child.collect {
        case f: logical.Filter if f.condition.toString.contains("_tb_prefix") => f
      }
      assert(pruned.nonEmpty,
        s"frontier filter on _tb_prefix must sit BELOW the refinement window:\n$lp")
    }
  }

  test("weightedSample: k distinct rows, heavy weight wins, repartition-invariant") {
    val df = ((1 to 200).map(i => (i.toLong, 10L)) :+ (999L, 1000000L))
      .toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Selection.weightedSample(d, "id", "w", k = 20, seed = 7L)
        .select($"id").as[Long].collect().sorted.toSeq
    val out = ids(df)
    assert(out.size == 20 && out.distinct.size == 20)
    // a weight 10^5× the others has inclusion probability ≈ 1
    assert(out.contains(999L))
    // deterministic and independent of physical layout
    assert(ids(df.repartition(13)) == out)
    // a different seed draws a different sample
    assert(Selection.weightedSample(df, "id", "w", 20, seed = 8L)
      .select($"id").as[Long].collect().sorted.toSeq != out)
  }

  test("weightedSample fails loudly on non-positive weights") {
    val bad = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Selection.weightedSample(bad, "id", "w", 2, seed = 1L).collect()
    }
    assert(e.getMessage != null)
  }
}
