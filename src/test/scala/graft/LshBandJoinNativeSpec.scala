package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.plans.LshBandJoinNative

/** The custom UNARY band-pairs operator (LshBandPairsPlan + Strategy +
  * LshBandPairsExec) must emit exactly the composed self-join's
  * candidate set, shuffle the banded table ONCE (the self-join
  * exchanges it twice), skip SQL-null keys/ids, never self-pair
  * duplicate ids, and stream a hot bucket's quadratic pair set without
  * materializing it. */
class LshBandJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic banded table: 40 buckets of mixed size incl. singletons. */
  private def banded = spark.range(400).select(
    ($"id" % 4).cast("int").as("band"),
    concat(lit("s"), ($"id" % 40).cast("string")).as("bsig"),
    $"id".as("doc_id"))

  test("native pairs equal the composed self-join pairs") {
    val native = LshBandJoinNative.bandPairs(banded, "band", "bsig", "doc_id")
      .distinct()
    val composed = {
      val b = banded
      b.alias("x").join(b.alias("y"), Seq("band", "bsig"))
        .where($"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"))
        .distinct()
    }
    val n = native.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val c = composed.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(n.nonEmpty)
    assert(n == c)
  }

  test("pairs are ordered (id_a < id_b) and the banded table shuffles ONCE") {
    val pairs = LshBandJoinNative.bandPairs(banded, "band", "bsig", "doc_id")
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    // count in the FINAL plan only — AQE's toString repeats the
    // initial plan below it, which would double-count the exchange
    val plan = pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("LshBandPairs"), plan)
    // one Exchange, inserted by EnsureRequirements from the declared
    // ClusteredDistribution — the self-join form has two
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(band"), plan)
  }

  test("null band/bsig/id rows never match (SQL join semantics)") {
    val withNulls = spark.createDataFrame(Seq(
      (Some(0), Some("a"), Some(1L)),
      (Some(0), Some("a"), Some(2L)),
      (None,    Some("a"), Some(3L)),   // null band
      (Some(0), None,      Some(4L)),   // null bsig
      (Some(0), Some("a"), None)        // null id
    )).toDF("band", "bsig", "doc_id")
    val out = LshBandJoinNative.bandPairs(withNulls, "band", "bsig", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("duplicate ids in one bucket never self-pair (strict <)") {
    val dup = Seq((0, "a", 7L), (0, "a", 7L), (0, "a", 9L))
      .toDF("band", "bsig", "doc_id")
    val out = LshBandJoinNative.bandPairs(dup, "band", "bsig", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // two copies of 7 each pair with 9 (duplicate candidate — the
    // caller's distinct collapses it), but never with each other
    assert(out.sorted == Seq((7L, 9L), (7L, 9L)))
    val distinct = LshBandJoinNative.bandPairs(dup, "band", "bsig", "doc_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(distinct == Seq((7L, 9L)))
  }

  test("hot bucket: 200-id bucket streams all C(200,2) pairs exactly") {
    val hot = spark.range(200).select(
      lit(0).as("band"), lit("hot").as("bsig"), $"id".as("doc_id"))
    val out = LshBandJoinNative.bandPairs(hot, "band", "bsig", "doc_id")
    assert(out.count() == 200L * 199 / 2)
    // spot-check extremes survive the streaming cursor
    val set = out.where($"id_a" === 0L || $"id_b" === 199L).count()
    assert(set == 199L + 198L + 1L - 1L) // (0,*)=199 plus (*,199)=199 minus shared (0,199)
  }

  test("lshCandidatePairsNative equals lshCandidatePairs on real signatures") {
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select($"doc_id", $"text")
    val sets = docs.select($"doc_id",
      graft.functions.TextFns.shinglesDistinct($"text", 3).as("shset"))
    val wids = sets.select($"doc_id", explode($"shset").as("sh"))
      .select($"doc_id", Dedup.md5Wid($"sh").as("wid"))
    val sigs = Dedup.minhashSignatures(wids, "doc_id", "wid", 12).cache()
    try {
      val composed = Dedup.lshCandidatePairs(sigs, "doc_id", 4, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val native = Dedup.lshCandidatePairsNative(sigs, "doc_id", 4, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(native.nonEmpty)
      assert(native == composed)
      // and with the bucket-size backstop engaged
      val composedCap = Dedup.lshCandidatePairs(sigs, "doc_id", 4, 3, maxBucketSize = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val nativeCap = Dedup.lshCandidatePairsNative(sigs, "doc_id", 4, 3, maxBucketSize = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(nativeCap == composedCap)
    } finally sigs.unpersist()
  }
}
