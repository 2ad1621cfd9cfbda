package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactMoments

class ExactMomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ExactMoments is partition-count invariant (exact decimal merge)") {
    val base = graft.core.Tables.orders(spark, TestSpark.SfDir)
      .select($"o_totalprice")
    def run(parts: Int) =
      base.repartition(parts)
        .agg(ExactMoments($"o_totalprice").as("m"))
        .select($"m.n", $"m.mean", $"m.var_samp")
        .head()
    val a = run(1)
    val b = run(17)
    assert(a.getLong(0) == b.getLong(0))
    // bit-identical, not approximately equal: the buffers are exact
    assert(a.getDouble(1) == b.getDouble(1))
    assert(a.getDouble(2) == b.getDouble(2))
  }

  test("ExactMoments matches the textbook formula on a known set") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val out = xs.toDF("x").agg(ExactMoments($"x").as("m"))
      .select($"m.n", $"m.mean", $"m.var_samp").head()
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - 2.5) < 1e-12)
    // var_samp of 1..4 = 5/3
    assert(math.abs(out.getDouble(2) - 5.0 / 3.0) < 1e-9)
  }
}
