package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

class TextFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokens splits on any whitespace, trimmed") {
    assert(one[collection.Seq[String]](TextFns.tokens($"t"), "  a  b\tc ") == Seq("a", "b", "c"))
  }

  test("tokenCount / subwordCount") {
    assert(one[Int](TextFns.tokenCount($"t"), "one two three") == 3)
    // 3 words + floor(13/6)=2 extra for the 13-char word
    assert(one[Long](TextFns.subwordCount($"t"), "a bb ccccccccccccc") == 5L)
  }

  test("shingles: n-grams in order; short text degenerates to one") {
    assert(one[collection.Seq[String]](TextFns.shingles($"t", 3), "a b c d")
      == Seq("a b c", "b c d"))
    assert(one[collection.Seq[String]](TextFns.shingles($"t", 3), "a b") == Seq("a b"))
  }

  test("promptToUse branches on empty input") {
    val df = Seq(("inst", ""), ("inst", "ctx")).toDF("i", "in")
      .select(TextFns.promptToUse($"i", $"in").as("p"))
    val ps = df.as[String].collect()
    assert(ps(0).contains("### Instruction:\ninst") && !ps(0).contains("### Input:"))
    assert(ps(1).contains("### Input:\nctx"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val a = one[Long](TextFns.fingerprint($"t"), "ab c")
    val b = one[Long](TextFns.fingerprint($"t"), "ba c")
    val a2 = one[Long](TextFns.fingerprint($"t"), "ab c")
    assert(a == a2 && a != b)
  }

  test("langId returns a declared language deterministically") {
    val l = one[String](TextFns.langId($"t"), "the spark and the vector")
    assert(TextFns.LangMarkers.map(_._1).contains(l))
    assert(l == "en") // 2×'the' + 'and' beats 'spark'+'vector'
  }

  test("qualityScore stays in [0,1] on corpus docs") {
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
    val mm = docs.select(
      min(TextFns.qualityScore($"text")).as("lo"),
      max(TextFns.qualityScore($"text")).as("hi")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }
}
