package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("cosine: identical → 1, orthogonal → 0") {
    val out = vecs.alias("a").join(vecs.alias("b"),
        $"a.vec_id" === 0 && $"b.vec_id".isin(0L, 2L))
      .select($"b.vec_id",
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(0L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val top = Similarity.bruteForceTopK(
        vecs.where($"vec_id" === 0), vecs, "vec_id", "vec_id", "embedding", 2)
      .select("vec_id", "rk").as[(Long, Int)].collect().toMap
    assert(top(1L) == 1)      // nearest is the 0.9/0.1 vector
    assert(!top.contains(0L)) // self excluded
  }

  test("kcenterGreedy returns k distinct ids, spread out") {
    val chosen = Similarity.kcenterGreedy(vecs, "vec_id", "embedding",
      k = 3, seedId = 0L)
    assert(chosen.size == 3 && chosen.distinct.size == 3)
    // farthest-first from vec 0 must pick the two orthogonal axes
    assert(chosen.toSet.subsetOf(Set(0L, 2L, 3L)))
  }

  test("lshTopK returns a subset of brute-force candidates with exact sims") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir)
    val q = embs.where($"vec_id" === 0)
    val lsh = Similarity.lshTopK(q, embs, "vec_id", "vec_id", "embedding", 3, 5)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(q, embs, "vec_id", "vec_id", "embedding", 2000)
      .select("vec_id", "sim").as[(Long, Double)].collect().toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (id, s) => assert(bf(id) == s) } // sims agree exactly
  }
}
