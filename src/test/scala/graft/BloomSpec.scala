package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BloomMightContain

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom probe has zero false negatives and bounded false positives") {
    val inserted = (1L to 10000L).map(_ * 7919L)
    val bloom = BloomMightContain.build(
      inserted.toDF("h"), "h", inserted.size.toLong, fpp = 0.01)
    // every inserted hash must probe true (distributed filter path)
    val kept = inserted.toDF("h")
      .where(BloomMightContain.probe($"h", bloom)).count()
    assert(kept == inserted.size, "bloom filters must never false-negative")
    // disjoint values: fp rate near the configured 1%
    val disjoint = (1L to 10000L).map(_ * 7919L + 1L)
    val fps = disjoint.toDF("h")
      .where(BloomMightContain.probe($"h", bloom)).count()
    assert(fps < 500, s"false-positive rate ${fps / 10000.0} far above fpp=0.01")
  }

  test("interpreted eval matches the codegen filter path") {
    val inserted = (1L to 2000L).map(_ * 31L)
    val bloom = BloomMightContain.build(
      inserted.toDF("h"), "h", 2000L, fpp = 0.03)
    val probeAll = (1L to 4000L).toDF("h")
      .select($"h", BloomMightContain.probe($"h" * 31L, bloom).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    // interpreted: eval the expression row-by-row via a local Literal plan
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(bloom)
    (1L to 4000L).foreach { i =>
      assert(probeAll(i) == bf.mightContainLong(i * 31L), s"i=$i")
      val interp = graft.plans.BloomMightContain(Literal(i * 31L), bloom)
        .eval(null).asInstanceOf[Boolean]
      assert(interp == probeAll(i), s"interpreted/codegen split at i=$i")
    }
  }

  test("non-long probe input is rejected at analysis") {
    val bloom = BloomMightContain.build(Seq(1L).toDF("h"), "h", 1L, 0.01)
    val e = intercept[Exception] {
      Seq("a").toDF("s").where(BloomMightContain.probe($"s", bloom)).collect()
    }
    assert(e.getMessage.contains("bloom_might_contain") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }

  test("q_decontam_bloom equals exact q_decontaminate at fixture scale") {
    val exact = SparkEntry.queries("q_decontaminate")(spark, TestSpark.SfDir)
      .collect().map(_.toSeq).toSeq
    val bloomed = SparkEntry.queries("q_decontam_bloom")(spark, TestSpark.SfDir)
      .collect().map(_.toSeq).toSeq
    assert(bloomed == exact,
      "bloom prefilter + exact verify must be indistinguishable from the exact join")
  }

  test("q_decontam_bloom plan: bloom filter below the train-side shuffle of a shuffle join") {
    val df = SparkEntry.queries("q_decontam_bloom")(spark, TestSpark.SfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"exact verify must run in the big-eval (shuffle join) regime:\n$plan")
    val joinAt = plan.indexOf("ShuffledHashJoin")
    val bloomAt = plan.indexOf("bloom_might_contain")
    assert(bloomAt > joinAt && bloomAt >= 0,
      s"bloom_might_contain must prefilter BELOW the join (map-side, pre-shuffle):\n$plan")
  }
}
