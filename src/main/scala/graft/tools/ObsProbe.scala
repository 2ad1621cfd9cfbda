package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does an [[org.apache.spark.sql.Observation]] metric
  * fire when the observed Dataset's action is `localCheckpoint`
  * (eager)? The connected-components loop rides its per-round change
  * count on the checkpoint materialization instead of a second count
  * job — this probe is the liveness evidence for that design (the
  * loop itself also keeps a scan-count fallback, so a regression in
  * Spark's listener behavior degrades to the old cost, not a hang).
  * Prints OBS_OK with the observed sums, or OBS_TIMEOUT.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(1000).selectExpr("id", "id % 7 AS k")
    val obs = org.apache.spark.sql.Observation()
    val seen = new java.util.concurrent.atomic.AtomicReference[String](null)
    val ck = df.observe(obs, sum(col("id")).as("s"),
        sum(when(col("k") === 0, 1L).otherwise(0L)).as("c"))
      .select(col("id"))
      .localCheckpoint()
    println(s"[probe] checkpoint rows=${ck.count()}")
    val t = new Thread(() => seen.set(obs.get.toString))
    t.setDaemon(true); t.start(); t.join(15000)
    if (seen.get == null) println("OBS_TIMEOUT")
    else println(s"OBS_OK ${seen.get}")
    // second probe: empty observed input (sum over zero rows)
    val obs2 = org.apache.spark.sql.Observation()
    spark.range(10).where("id < 0")
      .observe(obs2, sum(col("id")).as("s")).localCheckpoint()
    val t2 = new Thread(() => seen.set("empty=" + obs2.get.toString))
    t2.setDaemon(true); t2.start(); t2.join(15000)
    println(s"OBS_EMPTY ${seen.get}")
    spark.stop()
  }
}
