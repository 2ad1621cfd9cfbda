package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed corpus: 3 planted heavy hitters + a long near-unique tail,
  // interleaved so heavy rows land in every partition
  private def corpus(seed: Int) = {
    val rows = (1 to 30000).map { i =>
      if (i % 5 == 0) "hot_a"
      else if (i % 7 == 0) "hot_b"
      else if (i % 11 == 0) "hot_c"
      else s"tail_${seed}_$i"
    }
    rows.toDF("word")
  }

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"word").agg(count(lit(1)).as("cnt"))
      .crossJoin(df.agg(count(lit(1)).as("n")))
      .where($"cnt" * k > $"n").select($"word", $"cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("exact equals the plain GROUP BY ... HAVING formulation") {
    val df = corpus(1).repartition(8)
    for (k <- Seq(10, 200, 2000)) {
      val got = HeavyHitters.exact(df, "word", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == naive(df, k), s"k=$k")
    }
    // the planted hitters are found at k=20 (each > 1/20 of the corpus:
    // ~6000, ~3430, ~1870 of 30000)
    val hot = HeavyHitters.exact(df, "word", 20)
      .select("word").as[String].collect().toSet
    assert(hot == Set("hot_a", "hot_b", "hot_c"))
  }

  test("result is invariant to partitioning (MG candidate order-dependence verified away)") {
    val a = HeavyHitters.exact(corpus(2).repartition(2), "word", 50)
      .collect().map(_.toSeq).toSet
    val b = HeavyHitters.exact(corpus(2).repartition(16).sortWithinPartitions(rand(7)), "word", 50)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("candidate set is bounded by partitions * (k-1) and is a superset of true hitters") {
    val df = corpus(3).repartition(6)
    val k = 40
    val cands = HeavyHitters.mgCandidates(df, "word", k)
      .as[String].collect().toSet
    assert(cands.size <= 6 * (k - 1),
      s"${cands.size} candidates exceeds the 6*(k-1) bound")
    val truth = naive(df, k).map(_._1)
    assert(truth.subsetOf(cands), "MG must never false-negative a true heavy hitter")
  }

  test("verify plan: broadcast semi join feeds the recount (no vocabulary shuffle)") {
    val plan = HeavyHitters.exact(corpus(4), "word", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast LEFT SEMI candidate filter in:\n$plan")
  }
}
