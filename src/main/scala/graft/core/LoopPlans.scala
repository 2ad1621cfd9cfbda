package graft.core

import org.apache.spark.sql.DataFrame

/** Opt-in capture of IN-LOOP iteration plans for the iterative
  * operators (connected components, TextRank, gradient descent,
  * Lloyd's). The committed before/after dumps of those operators are
  * uninformative by construction — the final frame is a
  * localCheckpoint, so `explain` shows only a scan of the checkpoint
  * RDD and none of the per-round join strategy the optimization
  * claims are about (r14 verdict #4/#9). Operators call
  * [[dump]] on a round's frame BEFORE checkpointing it; when
  * `SPARK_GRAFT_LOOP_PLANS` names a directory, the FIRST frame per
  * tag per JVM is explained (formatted) into `<dir>/<tag>.txt`.
  * When the env var is unset (bench, verify, driver runs) the call is
  * a no-op costing one Option check — no plan is rendered.
  */
object LoopPlans {
  private val dir: Option[java.nio.file.Path] =
    sys.env.get("SPARK_GRAFT_LOOP_PLANS").map(java.nio.file.Paths.get(_))
  private val dumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dump(tag: String, df: DataFrame): Unit = dir.foreach { d =>
    if (dumped.add(tag)) {
      try {
        java.nio.file.Files.createDirectories(d)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(d.resolve(s"$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case e: Throwable =>
        System.err.println(s"[loopplans] $tag failed: ${e.getMessage}")
      }
    }
  }
}
