package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextRank

class TextRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 'hub' is adjacent to every other word; the tail words only ever
  // touch the hub
  private def docsDf = Seq(
    (1L, "hub alpha hub beta hub gamma"),
    (2L, "hub delta hub alpha hub beta"),
    (3L, "hub gamma hub delta")).toDF("doc_id", "text")

  test("cooccurrenceEdges: symmetric, weighted, no self-loops") {
    val e = TextRank.cooccurrenceEdges(docsDf, "text")
      .select($"src", $"dst", $"w").as[(String, String, Long)].collect()
    assert(e.forall { case (s, d, _) => s != d })
    val m = e.map { case (s, d, w) => (s, d) -> w }.toMap
    m.foreach { case ((s, d), w) => assert(m((d, s)) == w, s"asymmetric $s-$d") }
    // hub↔alpha adjacency: docs 1 and 2 each contribute "hub alpha"
    // and "alpha hub" — weight 4
    assert(m(("hub", "alpha")) == 4L)
  }

  test("textRank: hub dominates, mass conserved, partition-invariant") {
    def run(parts: Int) =
      TextRank.textRank(docsDf.repartition(parts), "text",
          damping = 0.85, iters = 10)
        .select($"word", $"r").as[(String, Double)].collect().sortBy(_._1)
    val out = run(1)
    val ranks = out.toMap
    assert(ranks.keySet == Set("hub", "alpha", "beta", "gamma", "delta"))
    assert(out.maxBy(_._2)._1 == "hub")
    // stationary mass ≈ 1 (9-dp rounding drifts a hair per round)
    val mass = out.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
    // decimal sums ⇒ bit-identical under any partitioning
    assert(run(7).toSeq == out.toSeq)
  }
}
