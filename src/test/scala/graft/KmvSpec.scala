package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** K-minimum-values distinct sketch: merge algebra, exact-degradation
  * branch, estimator accuracy, layout-independence, and the two plan
  * shapes that make it a map-side-combining sketch (partial top-k
  * BEFORE any exchange). */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 128

  private def ids(lo: Int, hi: Int, parts: Int = 4) =
    (lo until hi).map(i => s"item$i").toDF("item").repartition(parts)

  test("empty sketch degrades to (k_got=0, kth_min=0, est=0) — no ANSI error") {
    // zero input rows: element_at(sketch, -1) would ERROR under the
    // default ANSI mode without the guard (r11 ADVICE); the streaming
    // query must degrade, not fail
    val empty = Seq.empty[Long].toDF("hv")
      .agg(Sketches.kmvAggCol(col("hv"), K).as("sketch"))
      .select(Sketches.kmvEstimateFromBuffer(col("sketch"), K): _*)
      .collect()
    assert(empty.length == 1)
    val r = empty.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("merge identity: kmv(A union B) == k-smallest(kmv(A) union kmv(B)), bit-equal") {
    val a = ids(0, 3000)
    val b = ids(2000, 7000) // overlapping halves
    val whole = Sketches.kmvSketch(a.union(b), "item", K)
      .as[Long].collect().sorted.toSeq
    val merged = Sketches.kmvMergeTwo(
        Sketches.kmvSketch(a, "item", K), Sketches.kmvSketch(b, "item", K), K)
      .as[Long].collect().sorted.toSeq
    assert(whole.size == K)
    assert(merged == whole)
  }

  test("fewer than k distinct hashes: sketch degrades to EXACT count") {
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(
        ids(0, 100).union(ids(0, 100)), "item", K), K)
      .select($"k_got", $"est_distinct").as[(Long, Long)].head()
    assert(est == ((100L, 100L)))
  }

  test("estimator branch: relative error within 3x stderr at n=20000, k=128") {
    val n = 20000
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(ids(0, n, parts = 8), "item", K), K)
      .select($"est_distinct").as[Long].head()
    val relErr = math.abs(est.toDouble / n - 1.0)
    val bound = 3.0 / math.sqrt(K - 2.0) // ~0.27
    assert(relErr <= bound, s"est $est vs $n: relErr $relErr > $bound")
  }

  test("sketch values are layout-independent (deterministic hashing)") {
    def run(parts: Int) = Sketches.kmvSketch(ids(0, 5000, parts), "item", K)
      .as[Long].collect().sorted.toSeq
    assert(run(1) == run(13))
  }

  test("KmvAgg aggregate == relational sketch, any partitioning (monoid merge is shape-free)") {
    def viaAgg(parts: Int): Seq[Long] = ids(0, 5000, parts)
      .select(Sketches.kmvHash($"item").as("hv"))
      .agg(Sketches.kmvAggCol($"hv", K).as("sk"))
      .select(explode($"sk").as("hv")).as[Long].collect().sorted.toSeq
    val relational = Sketches.kmvSketch(ids(0, 5000), "item", K)
      .as[Long].collect().sorted.toSeq
    assert(viaAgg(1) == relational)
    assert(viaAgg(17) == relational)
  }

  test("KmvAgg reduce/merge invariants: sorted, duplicate-free, capped at k") {
    val agg = new graft.operators.KmvAgg(4)
    val one = Seq(9L, 3L, 9L, 7L, 1L, 5L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(one.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 smallest, dedup'd, sorted
    val other = Seq(2L, 4L, 0L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(one, other).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(agg.merge(other, one).toSeq == Seq(0L, 1L, 2L, 3L)) // commutes
    assert(agg.merge(one, agg.zero).toSeq == one.toSeq)        // identity
  }

  test("global sketch plans as TakeOrderedAndProject (per-partition partial top-k)") {
    val plan = Sketches.kmvSketch(ids(0, 1000), "item", K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("per-group sketch plans a WindowGroupLimit below the window exchange") {
    val df = (0 until 5000).map(i => (s"g${i % 3}", s"item$i")).toDF("g", "item")
      .repartition(8)
    val out = Sketches.kmvPerGroup(df, "g", "item", K)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    // and the per-group estimates are sane: 3 groups, each > K distinct
    val rows = out.select($"g", $"k_got").as[(String, Long)].collect().toMap
    assert(rows.keySet == Set("g0", "g1", "g2"))
    assert(rows.values.forall(_ == K))
  }
}
