package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Local replica of the driver's DuckDB correctness gate for the
  * highest-churn queries, so a parity break surfaces at `sbt test`
  * time instead of at the driver gate.
  *
  * Opt-in (`SPARK_GRAFT_ORACLE=1 sbt test`) because it shells out to
  * the host python3 + duckdb — available on the dev/driver host but
  * not a JVM dependency. Skipped (canceled) otherwise.
  */
class OracleParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // the queries most likely to drift: newest oracles + the dedup
  // family whose Spark and SQL sides share hand-mirrored hash math
  private val churn = Set(
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_minhash_scalable",
    "q_quantile_bucket", "q_json_roundtrip", "q_image_headers")

  test("DuckDB oracle parity holds for the highest-churn queries") {
    assume(sys.env.get("SPARK_GRAFT_ORACLE").contains("1"),
      "set SPARK_GRAFT_ORACLE=1 to run the local DuckDB parity gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_VERIFY",
      "/root/testdata/sf0.01")
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
