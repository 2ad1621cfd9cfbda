package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lloydExactAssign: separable points land in the seeded clusters") {
    // ids 0 and 1 seed the two clusters; the rest split around them
    val pts = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(0.2f, 0.0f)), (3L, Array(9.8f, 10.1f)),
      (4L, Array(0.1f, 0.1f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.lloydExactAssign(pts, "vec_id", "embedding",
        k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(Seq(0L, 2L, 4L).forall(out(_) == 0))
    assert(Seq(1L, 3L).forall(out(_) == 1))
  }

  test("lloydExactAssign is deterministic across reruns") {
    val pts = (0L until 40L).map(i =>
      (i, Array((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    def run() = Clustering.lloydExactAssign(pts, "vec_id", "embedding",
        k = 3, iters = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSeq.sorted
    assert(run() == run())
  }

  test("powerIterProjection recovers the dominant direction") {
    // points spread 10x wider along axis 0 than axis 1: after 2
    // rounds the direction is ~axis 0, so |proj| tracks |x0|
    val pts = (0L until 50L).map { i =>
      (i, Array(((i % 10).toFloat - 4.5f) * 10f, (i % 3).toFloat - 1f))
    }.toDF("vec_id", "embedding")
    val out = Clustering.powerIterProjection(pts, "embedding", iters = 2)
      .select("vec_id", "proj").as[(Long, Double)].collect().toMap
    // |proj| ordering tracks |x0| ordering: EVERY near-axis row
    // (|x0| = 5) projects strictly smaller than every extreme row
    // (|x0| = 45)
    val near    = out.collect { case (i, p) if i % 10 == 4 || i % 10 == 5 => p.abs }
    val extreme = out.collect { case (i, p) if i % 10 == 0 || i % 10 == 9 => p.abs }
    assert(near.nonEmpty && extreme.nonEmpty)
    assert(near.max < extreme.min)
  }

  test("powerIterProjection is deterministic across reruns") {
    val pts = (0L until 30L).map(i =>
      (i, Array((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    def run() = Clustering.powerIterProjection(pts, "embedding", 2)
      .select("vec_id", "proj").as[(Long, Double)].collect().toSeq.sorted
    assert(run() == run())
  }

  test("kmeansLabels produces k clusters under a fixed seed") {
    val pts = (0L until 60L).map(i =>
      (i, Array((i % 4).toFloat * 5, (i % 4).toFloat * 5)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansLabels(pts, "embedding", k = 4, seed = 0L)
    assert(out.select("cluster").distinct().count() == 4)
  }
}
