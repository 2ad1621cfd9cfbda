package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // linearly separable by x1: y = 1 iff x1 > 0.5 (plus a little slack
  // band so a few GD rounds suffice)
  private def fixture = (1 to 400).map { i =>
    val x1 = (i % 100) / 100.0
    val y  = if (x1 > 0.5) 1 else 0
    (i.toLong, y, 1.0, x1)
  }.toDF("id", "y", "x0", "x1")

  private val cols = Seq("x0", "x1")

  test("trainLogistic learns a separable rule well above majority") {
    val w = QualityModel.trainLogistic(fixture, cols, "y", lr = 8.0, rounds = 24)
    val scored = fixture.withColumn("pred",
      (QualityModel.scoreZ(cols, w) > 0.0).cast("int"))
    val acc = scored.where($"pred" === $"y").count().toDouble /
      scored.count()
    assert(acc >= 0.9, s"accuracy $acc with w=${w.toSeq}")
    // the learned boundary must slope the right way
    assert(w(1) > 0.0 && w(0) < 0.0, s"w=${w.toSeq}")
  }

  test("weights are bit-identical across partitionings (decimal gradient sums)") {
    def train(parts: Int) =
      QualityModel.trainLogistic(fixture.repartition(parts), cols, "y",
        lr = 8.0, rounds = 10).toSeq
    val w1 = train(1)
    assert(w1 == train(7) && w1 == train(32))
  }

  test("empty training set fails loudly") {
    val e = intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(fixture.where($"id" < 0), cols, "y", 1.0, 2)
    }
    assert(e.getMessage.contains("empty training set"))
  }
}
