package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.Clustering

class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("kmeansLabels yields k clusters, deterministic under seed") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir)
    val l1 = Clustering.kmeansLabels(embs, "embedding", 5, 0L)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val l2 = Clustering.kmeansLabels(embs, "embedding", 5, 0L)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(l1.values.toSet.size == 5)
    assert(l1 == l2)
  }

  test("multimodal stub pipeline: schema, determinism, frame bounds") {
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir).limit(30)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(media.select("kind").distinct().count() == 3)
    val f1 = Multimodal.extractFeatures(media)
    val f2 = Multimodal.extractFeatures(media)
    assert(f1.exceptAll(f2).count() == 0)
    val sampled = Multimodal.sampleFrames(f1, 4, 8)
    import org.apache.spark.sql.functions._
    assert(sampled.where(size(col("frame_idx")) > 8).count() == 0)
    assert(sampled.where(size(col("frame_idx")) < 1).count() == 0)
  }
}
