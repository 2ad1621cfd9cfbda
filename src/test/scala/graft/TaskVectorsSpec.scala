package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TaskVectors

class TaskVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tv(rows: (String, Long, Double)*) =
    rows.toDF("param_key", "idx", "value")

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Double)].collect()
      .map { case (k, i, v) => (k, i) -> v }.toMap

  test("diff = finetuned − base") {
    val d = toMap(TaskVectors.diff(
      tv(("w", 0, 5.0), ("w", 1, 3.0)), tv(("w", 0, 2.0), ("w", 1, 7.0))))
    assert(d == Map(("w", 0L) -> 3.0, ("w", 1L) -> -4.0))
  }

  test("weightedMerge = Σ coef·tv") {
    val m = toMap(TaskVectors.weightedMerge(Seq(
      tv(("w", 0, 1.0)) -> 2.0, tv(("w", 0, 10.0)) -> 0.5)))
    assert(m == Map(("w", 0L) -> 7.0))
  }

  test("applyTo adds scaled vector, missing entries pass through") {
    val m = toMap(TaskVectors.applyTo(
      tv(("w", 0, 1.0), ("w", 1, 1.0)), tv(("w", 0, 10.0)), 0.1))
    assert(m == Map(("w", 0L) -> 2.0, ("w", 1L) -> 1.0))
  }

  test("topKMask zeroes all but the top fraction by magnitude") {
    val masked = toMap(TaskVectors.topKMask(
      tv(("w", 0, 1.0), ("w", 1, -9.0), ("w", 2, 2.0), ("w", 3, 0.5)), 0.25))
    assert(masked(("w", 1L)) == -9.0)
    assert(masked(("w", 0L)) == 0.0 && masked(("w", 2L)) == 0.0)
  }

  test("disjointMerge mean keeps only majority-sign entries") {
    val stacked = Seq(
      ("m1", "w", 0L, 4.0), ("m2", "w", 0L, 2.0), ("m3", "w", 0L, -1.0),
      ("m1", "w", 1L, -4.0), ("m2", "w", 1L, -2.0), ("m3", "w", 1L, 1.0))
      .toDF("model", "param_key", "idx", "value")
    val m = toMap(TaskVectors.disjointMerge(stacked, "mean"))
    assert(m == Map(("w", 0L) -> 3.0, ("w", 1L) -> -3.0))
  }

  test("disjointMerge max re-signs the max magnitude") {
    val stacked = Seq(
      ("m1", "w", 0L, -4.0), ("m2", "w", 0L, -6.0), ("m3", "w", 0L, 1.0))
      .toDF("model", "param_key", "idx", "value")
    val m = toMap(TaskVectors.disjointMerge(stacked, "max"))
    assert(m == Map(("w", 0L) -> -6.0))
  }

  test("gradientSimilarityTopK ranks by dot product") {
    val ex = Seq((1L, "w", 0L, 1.0), (2L, "w", 0L, -1.0))
      .toDF("example_id", "param_key", "idx", "value")
    val vg = Seq(("w", 0L, 2.0)).toDF("param_key", "idx", "value")
    val top = TaskVectors.gradientSimilarityTopK(ex, vg, 1)
      .select("example_id").as[Long].head()
    assert(top == 1L)
  }
}
