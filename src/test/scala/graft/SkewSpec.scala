package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows on one key — the shape that funnels one reducer
    val df = spark.range(20000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        ($"id" % 100).cast("long").as("v"))
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy($"k").collect().toSeq
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .orderBy($"k").collect().toSeq
    assert(salted == direct)
  }

  test("stage 1 spreads a hot key across salt sub-keys") {
    val df = spark.range(1000).select(lit(0L).as("k"), $"id".as("v"))
    // with one key and 8 salts the two-stage plan has two exchanges
    val out = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2, p)
  }

  test("saltCols restores fan-out when a hot key's rows are identical") {
    // FULLY identical (key, value) rows: the full-row hash maps all of
    // them to one salt (documented limitation) — salting on a stable
    // per-row id must spread them AND stay correct
    val df = spark.range(5000)
      .select($"id", lit(0L).as("k"), lit(1L).as("v"))
    val allCols = df.drop("id")
    // full-row default over identical rows: ONE distinct salt
    val defSalts = allCols.select(
      pmod(xxhash64(allCols.columns.map(col): _*), lit(8L)).as("s"))
      .distinct().count()
    assert(defSalts == 1L, s"expected degenerate 1 salt, got $defSalts")
    // id-salted: all 8 salts populated, result identical to direct agg
    val idSalts = df.select(pmod(xxhash64($"id"), lit(8L)).as("s"))
      .distinct().count()
    assert(idSalts == 8L, s"expected 8 salts via id, got $idSalts")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total")).collect().toSeq
    val salted = Skew.saltedCountSum(df.select($"k", $"v", $"id"),
        Seq("k"), "v", salts = 8, saltCols = Seq("id"))
      .collect().toSeq
    assert(salted == direct)
  }
}
