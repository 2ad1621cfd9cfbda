package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish: item k appears ~60/k times over a 40-item universe —
  // far more items than the 8-bucket width, so collisions are certain
  private def items = (1 to 40).flatMap(k =>
    Seq.fill(60 / k + 1)(s"item$k")).toDF("item")

  private val D = 3
  private val W = 8

  test("cms estimates are one-sided: est >= exact for every item, any partitioning") {
    def run(parts: Int) = {
      val it = items.repartition(parts)
      val counters = Sketches.cmsCounters(it, "item", D, W)
      val exact = it.groupBy($"item").agg(count(lit(1)).as("exact"))
      Sketches.cmsEstimate(counters, exact.select($"item"), "item", D, W)
        .join(exact, "item")
        .select($"item", $"exact", $"est")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    }
    val out = run(1)
    assert(out.size == 40)
    out.foreach { case (i, exact, est) =>
      assert(est >= exact, s"$i: est $est < exact $exact")
    }
    // undersized grid ⇒ some real overestimates (non-vacuous fixture)
    assert(out.exists { case (_, exact, est) => est > exact })
    // deterministic hashing ⇒ identical sketch under any layout
    assert(run(7) == out)
  }

  test("counter grid is d*w-bounded and mass-conserving per row") {
    val counters = Sketches.cmsCounters(items, "item", D, W)
      .as[(Int, Long, Long)].collect()
    assert(counters.length <= D * W)
    val n = items.count()
    (0 until D).foreach { r =>
      assert(counters.filter(_._1 == r).map(_._3).sum == n, s"row $r mass")
    }
  }
}
