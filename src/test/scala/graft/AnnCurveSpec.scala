package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The IVF operating curve on the REAL fixture (sf0.1: 2000 distinct
  * vectors, fixture labels as cells) — the adversarial regime where
  * cells are uncorrelated with vector geometry, complementing
  * SimilaritySpec's clustered-fixture recall tests (the favorable
  * regime). Pins the properties that hold REGARDLESS of regime:
  * recall is monotone in probes (probed cell sets are nested — the
  * top-N cells by the same deterministic centroid score), full probe
  * is exact, and on uncorrelated cells recall tracks the scan
  * fraction (probes/nlist) rather than beating it — the honest
  * statement that IVF's payoff comes from clustered data, not from
  * the probe mechanism itself. Measured curve recorded in
  * PROFILE_r13 (sf0.1: 0.11/0.26/0.58/1.0 at 1/2/5/10 probes). */
class AnnCurveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IVF recall curve on the sf fixture: monotone in probes, exact at full probe") {
    val dir = "/root/testdata/sf0.1"
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet")))
    val embs = graft.core.Tables.embeddings(spark, dir).cache()
    val queries = embs.where($"vec_id" < 20)
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(Similarity.bruteForceTopK(
      queries, embs, "vec_id", "vec_id", "embedding", k))
    val recalls = Seq(2, 5, 10).map { probes =>
      val ivf = topSets(Similarity.ivfTopK(queries, embs,
        "vec_id", "vec_id", "embedding", "label", probes, k))
      probes -> brute.keysIterator.map { q =>
        (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    }.toMap
    assert(recalls(2) <= recalls(5) && recalls(5) <= recalls(10),
      s"recall must be monotone in probes: $recalls")
    assert(recalls(10) == 1.0,
      s"probing every cell must recover brute force exactly: $recalls")
    // deterministic fixture → deterministic curve; the measured sf0.1
    // operating points with a safety margin (exact: 0.26 / 0.575)
    assert(recalls(2) >= 0.2 && recalls(5) >= 0.5,
      s"sf0.1 operating points moved: $recalls")
    embs.unpersist()
  }

  test("sf100: IVF curve at 1000x (2M vectors) — duplicate retrieval beats the linear regime") {
    // At 1000x the fixture is a 1000-fold replicate: each query's true
    // top-10 are its own exact copies, and copies share their cell —
    // so low-probe recall BEATS probes/nlist whenever the probe ranks
    // the query's own cell first (measured: 0.40 at 1 probe vs 0.10
    // linear, 0.60 at 2, 1.0 at 10 — AnnCurve r13). This is the
    // dedup-at-scale regime: IVF retrieves duplicate families
    // scanning ~1 cell. Fixture self-heals (one deterministic 1000x
    // embeddings replicate) so the rung survives a cleaned /tmp.
    val dir = "/tmp/sf100"
    val embPath = java.nio.file.Paths.get(s"$dir/embeddings.parquet")
    if (!java.nio.file.Files.exists(embPath)) {
      assume(!sys.env.contains("SPARK_GRAFT_NO_FIXTURE_GEN"),
        "sf100 fixture absent and regeneration opted out")
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(
        "/root/testdata/sf0.1/embeddings.parquet")))
      graft.tools.MakeSf.build(spark, "/root/testdata/sf0.1", dir, 1000,
        Set("embeddings"))
    }
    val embs = graft.core.Tables.embeddings(spark, dir).cache()
    val queries = embs.where($"vec_id" < 20)
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(Similarity.bruteForceTopK(
      queries, embs, "vec_id", "vec_id", "embedding", k))
    val recalls = Seq(2, 10).map { probes =>
      val ivf = topSets(Similarity.ivfTopK(queries, embs,
        "vec_id", "vec_id", "embedding", "label", probes, k))
      probes -> brute.keysIterator.map { q =>
        (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    }.toMap
    assert(recalls(10) == 1.0, s"full probe must be exact: $recalls")
    // the measured 1000x operating point (deterministic fixture):
    // 2 probes = 20% scan recovers 60% — 3x the uncorrelated regime
    assert(recalls(2) >= 0.5, s"sf100 duplicate-retrieval point moved: $recalls")
    embs.unpersist()
  }

  test("sf10 UNIQUE-vector fixture: IVF operating point in the geometric-cell regime") {
    // The r13 verdict's honest caveat: big-SF recall on the plain
    // replicate measures duplicate-family retrieval (copies share
    // cells). This rung regenerates the UNIQUE fixture — 200 k
    // distinct unit vectors via MakeSf's seeded per-copy jitter
    // (eps = 0.2, sibling cosine ~0.69) with labels reassigned to the
    // nearest of 10 fixed anchors — and pins the true
    // nearest-neighbor-search operating point on it. Deterministic
    // regen (LCG jitter, no RNG state) makes the pinned numbers
    // reproducible from a clean /tmp; the 2 M-vector twin of this
    // curve (AnnCurve on /tmp/sf100u, ivfpq mode) is recorded in
    // PROFILE_r14.
    val dir = "/tmp/sf10u"
    val embPath = java.nio.file.Paths.get(s"$dir/embeddings.parquet")
    if (!java.nio.file.Files.exists(embPath)) {
      assume(!sys.env.contains("SPARK_GRAFT_NO_FIXTURE_GEN"),
        "sf10u fixture absent and regeneration opted out")
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(
        "/root/testdata/sf0.1/embeddings.parquet")))
      graft.tools.MakeSf.build(spark, "/root/testdata/sf0.1", dir, 100,
        Set("embeddings"), perturbEps = Some(0.2))
    }
    val embs = graft.core.Tables.embeddings(spark, dir).cache()
    // every vector is unique — the property the fixture exists for
    val (n, distinct) = (embs.count(),
      embs.select($"embedding").distinct().count())
    assert(n == 200000L && distinct == n,
      s"unique fixture must have all-distinct vectors: $distinct of $n")
    val queries = embs.where($"vec_id" < 20)
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(Similarity.bruteForceTopK(
      queries, embs, "vec_id", "vec_id", "embedding", k))
    def recallAt(ivf: Map[Long, Set[Long]]): Double =
      brute.keysIterator.map { q =>
        (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    val recalls = Seq(2, 3, 5, 10).map { probes =>
      probes -> recallAt(topSets(Similarity.ivfTopK(queries, embs,
        "vec_id", "vec_id", "embedding", "label", probes, k)))
    }.toMap
    assert(recalls(2) <= recalls(3) && recalls(3) <= recalls(5) &&
      recalls(5) <= recalls(10), s"recall must be monotone in probes: $recalls")
    assert(recalls(10) == 1.0, s"full probe must be exact: $recalls")
    // measured on the deterministic fixture: 0.775 / 0.925 / 0.975 at
    // 2 / 3 / 5 probes — geometric cells pay: 30% scan -> 92.5%
    // recall, ~3x the linear (probes/nlist) floor. Margins below.
    assert(recalls(2) >= 0.6, s"2-probe operating point moved: $recalls")
    assert(recalls(3) >= 0.85, s"3-probe operating point moved: $recalls")
    assert(recalls(5) >= 0.9, s"5-probe operating point moved: $recalls")
    // the serving composite (IVF-PQ, ADC over 4x16 codes + exact
    // re-rank at cands=60) holds the same 3-probe point: candidate
    // loss from quantization is recovered by the re-rank margin
    val ivfpq = recallAt(topSets(Similarity.ivfPqTopK(queries, embs,
      "vec_id", "vec_id", "embedding", "label", probes = 3,
      blocks = 4, codes = 16, iters = 2, cands = 60, k = k)))
    assert(ivfpq >= 0.8, s"IVF-PQ 3-probe operating point moved: $ivfpq")
    embs.unpersist()
    graft.core.Caches.releaseAll()
  }
}
