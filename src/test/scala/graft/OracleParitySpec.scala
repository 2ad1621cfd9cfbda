package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Local replica of the driver's DuckDB correctness gate for the
  * highest-churn queries, so a parity break surfaces at `sbt test`
  * time instead of at the driver gate.
  *
  * Default-ON whenever the host python3 can import duckdb (the
  * dev/driver hosts can; it is not a JVM dependency, so a bare
  * container without it just skips). `SPARK_GRAFT_ORACLE=0` is the
  * explicit opt-OUT; any other value forces the gate on.
  *
  * Safe to run inside `sbt test`: suites execute sequentially in the
  * forked test JVM (`Test / testForkedParallel` defaults to false and
  * build.sbt pins it), so `Verify.dump`'s per-query
  * `Caches.releaseAll` can never unpersist another in-flight suite's
  * tracked cache.
  */
class OracleParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // the queries most likely to drift: newest oracles + the dedup
  // family whose Spark and SQL sides share hand-mirrored hash math
  private val churn = Set(
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_minhash_scalable",
    "q_quantile_bucket", "q_json_roundtrip", "q_image_headers",
    "q_audio_headers",
    // r9-final additions: hand-mirrored hash/window/decimal math
    "q_dedup_embed_scalable", "q_cdc_apply", "q_rollup_incremental",
    "q_median_scalable", "q_export_manifest")

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_VERIFY",
    "/root/testdata/sf0.01")

  private def oracleEnabled: Boolean = {
    import scala.sys.process._
    sys.env.get("SPARK_GRAFT_ORACLE").map(_.toLowerCase) match {
      case Some("0") | Some("false") => false // explicit opt-out
      case Some(_)                   => true  // explicit opt-in (legacy form)
      case None => // default: on iff the host can actually run the gate
        // (duckdb importable AND the sf fixture present — a host with
        // one but not the other gets the documented skip, not a fail)
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sfDir)) &&
          (try Process(Seq("python3", "-c", "import duckdb")).! == 0
           catch { case _: Exception => false })
    }
  }

  test("DuckDB oracle parity holds for the highest-churn queries") {
    assume(oracleEnabled,
      "python3+duckdb or test data unavailable (or SPARK_GRAFT_ORACLE=0): " +
        "skipping parity gate")
    val out = Files.createTempDirectory("graft_oracle_gate").toString
    Verify.dump(spark, sfDir, out, Some(churn))
    import scala.sys.process._
    val log = new StringBuilder
    val code = Process(Seq("python3", "tools/check.py", out, sfDir))
      .!(ProcessLogger(l => log.append(l).append('\n'),
         l => log.append(l).append('\n')))
    assert(code == 0, s"oracle parity gate failed:\n$log")
    assert(log.toString.contains("ALL OK"), log.toString)
  }
}
