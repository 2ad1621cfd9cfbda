package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.ClusterPairsNative

/** The custom UNARY cluster-pairs operator (ClusterPairsPlan +
  * Strategy + ClusterPairsExec) must emit exactly the composed
  * self-join's within-group pair set WITH payloads, shuffle the
  * labeled table ONCE (the self-join exchanges it twice), skip
  * SQL-null keys/ids while letting null PAYLOADS ride (a joined row
  * with a null embedding also pairs — its cosine is null and the
  * filter above drops it), and make the full semantic-dedup query
  * bit-identical through the node. */
class ClusterPairsNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic labeled table: 8 groups of mixed size incl. singletons,
    * payload = a 2-vector derived from the id. */
  private def labeled = spark.range(120).select(
    ($"id" % 8).cast("int").as("cluster"),
    $"id".as("vid"),
    array(($"id" % 13).cast("float"), ($"id" % 7).cast("float")).as("emb"))

  test("native pairs equal the composed self-join pairs, payloads included") {
    val native = ClusterPairsNative.clusterPairs(labeled, "cluster", "vid", "emb")
      .select($"id_a", $"id_b", $"pay_a", $"pay_b")
    val composed = {
      val l = labeled
      l.alias("x").join(l.alias("y"), Seq("cluster"))
        .where($"x.vid" < $"y.vid")
        .select($"x.vid".as("id_a"), $"y.vid".as("id_b"),
          $"x.emb".as("pay_a"), $"y.emb".as("pay_b"))
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Float](2).mkString(","), r.getSeq[Float](3).mkString(",")))
        .sorted.toSeq
    val n = canon(native)
    assert(n.nonEmpty)
    assert(n == canon(composed))
  }

  test("pairs are ordered (id_a < id_b) and the labeled table shuffles ONCE") {
    val pairs = ClusterPairsNative.clusterPairs(labeled, "cluster", "vid", "emb")
    val rows = pairs.select($"id_a", $"id_b").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val plan = pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ClusterPairs"), plan)
    // one Exchange, inserted by EnsureRequirements from the declared
    // ClusteredDistribution — the self-join form has two
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(cluster"), plan)
  }

  test("null key/id rows never pair; null payloads DO ride along") {
    val withNulls = spark.createDataFrame(Seq(
      (Some(0), Some(1L), Some(Seq(1.0f))),
      (Some(0), Some(2L), None: Option[Seq[Float]]), // null payload: pairs
      (None,    Some(3L), Some(Seq(3.0f))),          // null key: never pairs
      (Some(0), None,     Some(Seq(4.0f)))           // null id: never pairs
    )).toDF("cluster", "vid", "emb")
    val out = ClusterPairsNative.clusterPairs(withNulls, "cluster", "vid", "emb")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.isNullAt(3))).toSeq
    assert(out == Seq((1L, 2L, true)))
  }

  test("duplicate ids in one group never self-pair (strict <)") {
    val dup = Seq((0, 7L, Seq(1.0f)), (0, 7L, Seq(2.0f)), (0, 9L, Seq(3.0f)))
      .toDF("cluster", "vid", "emb")
    val out = ClusterPairsNative.clusterPairs(dup, "cluster", "vid", "emb")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // two copies of 7 each pair with 9, never with each other
    assert(out.sorted == Seq((7L, 9L), (7L, 9L)))
  }

  test("pushed pair predicate equals the .where form (and filters before materializing)") {
    import org.apache.spark.sql.catalyst.expressions.{
      Expression, GreaterThanOrEqual, Literal, Round}
    val pred = (a: Expression, b: Expression) =>
      GreaterThanOrEqual(
        Round(graft.plans.ArrayCosineSim(a, b), Literal(6)),
        Literal(0.9)): Expression
    val pushed = ClusterPairsNative
      .clusterPairs(labeled, "cluster", "vid", "emb", Some(pred))
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val above = ClusterPairsNative
      .clusterPairs(labeled, "cluster", "vid", "emb")
      .where(round(graft.operators.Similarity
        .cosine($"pay_a", $"pay_b"), 6) >= 0.9)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pushed.nonEmpty && pushed == above)
    // the threshold is a real boundary on this frame: some pairs drop
    val all = ClusterPairsNative.clusterPairs(labeled, "cluster", "vid", "emb")
    assert(pushed.size.toLong < all.count())
  }

  test("pushed predicate drops null-payload pairs exactly like .where") {
    import org.apache.spark.sql.catalyst.expressions.{
      Expression, GreaterThanOrEqual, Literal, Round}
    val withNullPay = spark.createDataFrame(Seq(
      (0, 1L, Some(Seq(1.0f, 0.0f))),
      (0, 2L, None: Option[Seq[Float]]), // null emb: cosine null -> dropped
      (0, 3L, Some(Seq(1.0f, 0.0f)))
    )).toDF("cluster", "vid", "emb")
    val pred = (a: Expression, b: Expression) =>
      GreaterThanOrEqual(
        Round(graft.plans.ArrayCosineSim(a, b), Literal(6)),
        Literal(0.5)): Expression
    val out = ClusterPairsNative
      .clusterPairs(withNullPay, "cluster", "vid", "emb", Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L)))
  }

  test("semanticDedupNative is row-identical to semanticDedup on real embeddings") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val composed = canon(Similarity.semanticDedup(
      embs, "vec_id", "embedding", k = 4, iters = 2, tau = 0.4))
    val native = canon(Similarity.semanticDedupNative(
      embs, "vec_id", "embedding", k = 4, iters = 2, tau = 0.4))
    assert(native.nonEmpty)
    assert(native == composed)
    // the decision boundary is real on this fixture: both keeps and drops
    assert(native.exists(_._3 == 0) && native.exists(_._3 == 1))
  }
}
