package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Selection

/** Property tests for the selection core (SURVEY §5): invariants that
  * must hold for ANY data, not just fixtures — band ⊆ group, per-group
  * sample bound, small-group passthrough, pool-split partition law.
  * (Plain ScalaCheck generators driven with fixed seeds — the
  * scalatest bridge artifact isn't in the offline cache.)
  */
class SelectionProps extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val groupsGen: Gen[List[(String, Long, Double)]] = for {
    nGroups <- Gen.choose(1, 4)
    rows <- Gen.listOfN(60, for {
      g <- Gen.choose(0, nGroups - 1)
      conf <- Gen.choose(-1000.0, 1000.0)
    } yield (s"g$g", conf))
  } yield rows.zipWithIndex.map { case ((g, c), i) => (g, i.toLong, c) }

  test("percentileBand: output ⊆ input; small groups whole; large keep ~50%") {
    samples(groupsGen, 8).foreach { rows =>
      val df = rows.toDF("grp", "id", "conf")
      val out = Selection.percentileBand(df, "grp", "conf", minGroupSize = 10)
      val inIds = rows.map(_._2).toSet
      val outRows = out.select("grp", "id").as[(String, Long)].collect()
      assert(outRows.map(_._2).forall(inIds))
      val inCounts = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val outCounts = outRows.groupBy(_._1).view.mapValues(_.size).toMap
      inCounts.foreach { case (g, n) =>
        val kept = outCounts.getOrElse(g, 0)
        if (n < 10) assert(kept == n, s"small group $g must pass whole")
        else assert(kept >= n / 2 - 2 && kept <= n, s"band of $g kept $kept of $n")
      }
    }
  }

  test("strideSample: exact systematic pattern for any (groupSize, n)") {
    val cases = samples(Gen.zip(Gen.choose(1, 40), Gen.choose(1, 8)), 12)
    cases.foreach { case (groupSize, n) =>
      val df = (1 to groupSize).map(i => ("g", i.toLong)).toDF("grp", "id")
      val out = Selection.strideSample(df, "grp", "id", n)
        .select("id").as[Long].collect().sorted
      if (groupSize <= n) assert(out.length == groupSize)
      else {
        val step = groupSize / n
        val expected = (0 until n).map(k => 1L + k * step)
        assert(out.toSeq == expected,
          s"groupSize=$groupSize n=$n got ${out.toSeq}")
      }
    }
  }

  test("poolSplit: semi ∪ anti == pool, disjoint") {
    samples(Gen.listOf(Gen.choose(1L, 50L)), 8).foreach { sel =>
      val pool = (1L to 50L).toDF("id")
      val ids = sel.toDF("id")
      val (lab, unlab) = Selection.poolSplit(pool, ids, "id")
      val l = lab.as[Long].collect().toSet
      val u = unlab.as[Long].collect().toSet
      assert((l & u).isEmpty)
      assert((l | u) == (1L to 50L).toSet)
      assert(l == sel.toSet.filter(x => x >= 1 && x <= 50))
    }
  }
}
