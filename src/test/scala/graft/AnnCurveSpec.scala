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
}
