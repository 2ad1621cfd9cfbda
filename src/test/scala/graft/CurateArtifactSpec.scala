package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.NorthStarQueries

/** "Curate once, derive twice": the curation DAG (dedup → CC → band)
  * is persisted once as a parquet checkpoint artifact, and BOTH the
  * stride sample and the partitioned training sink are derived from
  * the artifact without re-running the DAG — the stage-checkpoint
  * reuse the reference's pipeline has (reference `main.py:312-314`),
  * at curation scale.
  */
class CurateArtifactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.SfDir
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("artifact derivations equal the recomputed pipeline/sink and the DAG executes at most once") {
    val before = NorthStarQueries.curatedArtifactRuns.get
    val sample    = run("q_curate_from_artifact").collect().toSeq
    val sinkRows  = run("q_curate_sink_artifact").collect().toSeq
    val sampleAgn = run("q_curate_from_artifact").collect().toSeq
    val after = NorthStarQueries.curatedArtifactRuns.get
    // three derivations, at most ONE DAG execution (zero if another
    // suite already materialized this dir's artifact in this JVM)
    assert(after - before <= 1,
      s"curation DAG executed ${after - before} times for artifact derivations")
    assert(sample == sampleAgn)
    // value-identical to the paths that recompute the DAG every time
    assert(sample == run("q_curate_pipeline").collect().toSeq,
      "artifact-derived stride sample drifted from the recomputed pipeline")
    assert(sinkRows == run("q_curate_sink").collect().toSeq,
      "artifact-derived sink drifted from the recomputed sink")
    graft.core.Caches.releaseAll()
  }

  test("the artifact path's plan is a checkpoint scan — the curation DAG does not appear") {
    val df = run("q_curate_from_artifact")
    val plan = df.queryExecution.optimizedPlan.toString
    // the DAG's signature operators (near-dup joins, CC propagation)
    // are joins; the artifact path is scan + stride window only
    assert(!plan.contains("Join"),
      s"artifact-derived sample still plans the curation DAG:\n${plan.take(1500)}")
    graft.core.Caches.releaseAll()
  }
}
