package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Training-data hygiene ops: the leakage-safe split's defining
  * property (no near-duplicate family straddles a split boundary) and
  * boilerplate stripping's window semantics on a constructed corpus. */
class TrainHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leakage-safe split: near-dup pairs and exact dups NEVER straddle splits") {
    val assigned = graft.queries.NorthStarQueries
      .leakageSafeAssignment(spark, TestSpark.SfDir)
      .cache()
    try {
      val d = graft.core.Tables.documents(spark, TestSpark.SfDir)
        .select($"doc_id", $"text")
      // exact duplicates: same text => same split
      val textSplits = d.join(assigned, "doc_id")
        .groupBy($"text").agg(countDistinct($"split").as("n"))
      assert(textSplits.where($"n" > 1).count() == 0)
      // near-duplicates: every verified near-dup pair (over exact
      // reps, the same recipe the operator uses) shares a split
      val reps = d.groupBy($"text").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id", $"text")
      val pairs = Dedup.nearDupPairs(reps, "doc_id", "text",
        n = 3, k = 12, bands = 4, threshold = 0.5)
      assert(pairs.count() > 0, "fixture should contain near-dup pairs")
      val straddling = pairs
        .join(assigned.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
        .join(assigned.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
        .where($"sa" =!= $"sb")
      assert(straddling.count() == 0)
      // and the split is not degenerate: more than one split used
      assert(assigned.select($"split").distinct().count() >= 2)
    } finally assigned.unpersist()
  }

  test("boilerplate strip: shared spans drop, unique spans survive in order") {
    // w1..w8 is an 8-token window shared by docs 1 and 2 (boilerplate
    // at maxDocs=1); each doc also has a unique 8-token window; doc 3
    // is entirely unique
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val u1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val u2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val u3 = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared $u1"), // window 0 = shared, window 1 = unique
      (2L, s"$shared $u2"),
      (3L, u3)
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text",
        win = 8, maxDocs = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 1L, u1)))
    assert(out(2L) == ((2L, 1L, u2)))
    assert(out(3L) == ((1L, 1L, u3)))
  }

  test("boilerplate strip: fully-boilerplate doc rebuilds to empty text") {
    val t = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text",
        win = 8, maxDocs = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((1L, 0L, "")) && out(2L) == ((1L, 0L, "")))
  }
}
