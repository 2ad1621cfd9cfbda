package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scorers

class ScorersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ProxyBackend is deterministic and seed-sensitive") {
    val a = new Scorers.ProxyBackend(42L)
    val b = new Scorers.ProxyBackend(42L)
    val c = new Scorers.ProxyBackend(7L)
    assert(a.ppl("hello world") == b.ppl("hello world"))
    assert(a.ppl("hello world") != c.ppl("hello world"))
    assert(a.embed("x").toSeq == b.embed("x").toSeq)
    assert(a.tokenLoss("p", "a b c").length == 3)
  }

  test("withModelScores adds ppl/emb/reward via mapPartitions") {
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    val out = Scorers.withModelScores(df, "text",
      () => new Scorers.ProxyBackend(42L))
    assert(out.columns.toSet ==
      Set("id", "text", "ppl_ins_alone", "emb_ins_alone", "score_rw"))
    val row = out.where($"id" === 1).head()
    assert(row.getAs[collection.Seq[Float]]("emb_ins_alone").size == 64)
    assert(row.getAs[Double]("ppl_ins_alone") > 0)
  }

  test("ifdScore: guards — null for empty spans, drop ratio > 1") {
    val df = Seq(
      (1L, Seq(2.0, 2.0), Seq(1.0, 1.0)),   // ratio 0.5 → keep
      (2L, Seq(1.0), Seq(3.0)),             // ratio 3 → dropped
      (3L, Seq.empty[Double], Seq(1.0)))    // empty → null kept
      .toDF("id", "loss_alone", "loss_cond")
    val out = Scorers.ifdScore(df)
    val byId = out.select($"id", $"score_ifd").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1L).contains(0.5))
    assert(!byId.contains(2L))
    assert(byId(3L).isEmpty)
  }

  test("ifdPipeline runs end to end on alpaca rows") {
    val alpaca = Seq(("write a poem", "", "roses are red and violets are blue"))
      .toDF("instruction", "input", "output")
    val out = Scorers.ifdPipeline(alpaca, () => new Scorers.ProxyBackend(42L))
    assert(out.count() <= 1) // kept or guarded away, never duplicated
  }

  test("ifdPipeline skips rows whose prompt overflows max_length") {
    // the templated prompt of the long row has far more whitespace
    // tokens than maxLength=40; the short row survives
    val longIns = (1 to 60).map(i => s"w$i").mkString(" ")
    val alpaca = Seq(
      ("short instruction", "", "a b c"),
      (longIns, "", "a b c"))
      .toDF("instruction", "input", "output")
    val out = Scorers.ifdPipeline(alpaca,
      () => new Scorers.ProxyBackend(42L), maxLength = 40)
    val kept = out.select("instruction").as[String].collect().toSeq
    assert(!kept.contains(longIns))
    assert(kept.forall(_ == "short instruction") && kept.size <= 1)
  }

  test("gradientRows emits long-format entries per param") {
    val df = Seq((5L, "some text")).toDF("doc_id", "text")
    val g = Scorers.gradientRows(df, "doc_id", "text",
      Seq("l0", "l1"), 4, () => new Scorers.ProxyBackend(1L))
    assert(g.count() == 8)
    assert(g.select("param_key").distinct().count() == 2)
  }
}
