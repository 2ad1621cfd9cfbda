package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, Similarity}
import graft.plans.ArrayCosineSim

class PlansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ArrayCosineSim equals the HOF formulation bit-for-bit on real data") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir).limit(100)
    val diff = embs.alias("a").join(embs.alias("b"),
        $"a.vec_id" < $"b.vec_id")
      .select(
        ArrayCosineSim($"a.embedding", $"b.embedding").as("native"),
        Similarity.cosineHof($"a.embedding", $"b.embedding").as("hof"))
      .where($"native" =!= $"hof")
    assert(diff.count() == 0)
  }

  test("ArrayCosineSim participates in whole-stage codegen") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir).limit(5)
    val df = embs.select(ArrayCosineSim($"embedding", $"embedding"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains(") Project [arraycosinesim") && plan.contains("*("),
      s"expected codegen'd project in:\n$plan")
  }

  test("TextFingerprint equals the HOF formulation on the corpus") {
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
    val diff = docs.select(
        graft.functions.TextFns.fingerprint($"text").as("native"),
        graft.functions.TextFns.fingerprintHof($"text").as("hof"))
      .where($"native" =!= $"hof")
    assert(diff.count() == 0)
    // non-ASCII code points weigh like ascii() (first code point value)
    val uni = Seq("héllo wörld ✓").toDF("text").select(
      graft.functions.TextFns.fingerprint($"text").as("n"),
      graft.functions.TextFns.fingerprintHof($"text").as("h")).head()
    assert(uni.getLong(0) == uni.getLong(1))
  }

  test("WordShingles equals the HOF formulation on the corpus and edge cases") {
    import graft.functions.TextFns
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select($"text")
      .unionAll(Seq("", " ", "one", "a b", "a b c", "a  b\tc d", "\ta b c")
        .toDF("text"))
    for (n <- Seq(2, 3, 5)) {
      val diff = docs.select(
          TextFns.shingles($"text", n).as("native"),
          TextFns.shinglesHof($"text", n).as("hof"),
          TextFns.shinglesDistinct($"text", n).as("nd"),
          array_distinct(TextFns.shinglesHof($"text", n)).as("hd"))
        .where($"native" =!= $"hof" || $"nd" =!= $"hd")
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("SubwordCount and PosWeightedSum equal their HOF formulations") {
    import graft.functions.TextFns
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
    assert(docs.select(TextFns.subwordCount($"text").as("n"),
        TextFns.subwordCountHof($"text").as("h"))
      .where($"n" =!= $"h").count() == 0)
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir)
    val hof = aggregate(
      transform($"embedding", (x, i) => x.cast("double") * (i + 1)),
      lit(0.0), (a, x) => a + x)
    assert(embs.select(graft.plans.PosWeightedSum($"embedding").as("n"),
        hof.as("h"))
      .where($"n" =!= $"h").count() == 0)
  }

  test("StringArrayJaccard equals the intersect/union formulation") {
    import graft.functions.TextFns
    val sets = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select($"doc_id", TextFns.shinglesDistinct($"text", 3).as("s"))
      .limit(60).cache()
    val pairs = sets.alias("a").join(sets.alias("b"),
        $"a.doc_id" < $"b.doc_id")
      .select(
        graft.plans.StringArrayJaccard($"a.s", $"b.s").as("native"),
        (size(array_intersect($"a.s", $"b.s")).cast("double") /
          size(array_union($"a.s", $"b.s"))).as("hof"))
      .where($"native" =!= $"hof")
    assert(pairs.count() == 0)
    sets.unpersist()
  }

  test("ArraySqDistToConst equals the HOF formulation") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir).limit(200)
    val center = embs.orderBy($"vec_id").head()
      .getSeq[Float](embs.schema.fieldIndex("embedding")).map(_.toDouble).toArray
    val hof = aggregate(zip_with($"embedding", lit(center), (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (a, v) => a + v)
    val diff = embs.select(
        graft.plans.ArraySqDistToConst($"embedding", center).as("native"),
        hof.as("hof"))
      .where($"native" =!= $"hof")
    assert(diff.count() == 0)
  }

  test("HyperplaneBuckets equals the per-table HOF buckets") {
    val embs = graft.core.Tables.embeddings(spark, TestSpark.SfDir).limit(200)
    val tables = 6; val planes = 3
    val native = embs.select($"vec_id",
      graft.plans.HyperplaneBuckets($"embedding", planes, tables).as("bkts"))
    val hof = embs.select($"vec_id" +: (0 until tables).map(t =>
      Similarity.hyperplaneBucket($"embedding", planes, t).as(s"b$t")): _*)
    val joined = native.join(hof, "vec_id")
    val diff = joined.where((0 until tables).map(t =>
      element_at($"bkts", t + 1) =!= col(s"b$t")).reduce(_ || _))
    assert(diff.count() == 0)
  }

  test("ShingleExplode generator equals explode(WordShingles) row-for-row") {
    val docs = graft.core.Tables.documents(spark, TestSpark.SfDir)
      .select($"doc_id", $"text")
    for (n <- Seq(1, 3)) {
      val gen = docs.select($"doc_id",
        graft.plans.ShingleExplode($"text", n).as("sh"))
      val arr = docs.select($"doc_id",
        explode(graft.plans.WordShingles($"text", n, distinct = false)).as("sh"))
      val a = gen.groupBy($"doc_id", $"sh").count()
        .orderBy($"doc_id", $"sh").collect().toSeq
      val b = arr.groupBy($"doc_id", $"sh").count()
        .orderBy($"doc_id", $"sh").collect().toSeq
      assert(a.nonEmpty)
      assert(a == b, s"n=$n mismatch")
    }
    // short-text fallback: fewer tokens than n → one joined shingle
    val one = Seq("a b").toDF("text")
      .select(graft.plans.ShingleExplode($"text", 5).as("sh"))
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("a b"))
  }

  test("shingle_explode works through the SQL door") {
    graft.plans.GraftFunctions.register(spark)
    Seq(("x", "w1 w2 w3")).toDF("id", "text").createOrReplaceTempView("t_gen")
    val rows = spark.sql(
      "SELECT shingle_explode(text, 2) AS sh FROM t_gen")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("w1 w2", "w2 w3"))
  }

  test("array natives refuse degenerate inputs instead of silently zeroing") {
    import graft.plans.{ArrayCosineSim, StringArrayJaccard}
    // mismatched lengths: loud error, never a truncated similarity
    val ragged = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b").select(ArrayCosineSim($"a", $"b"))
    val e1 = intercept[Exception] { ragged.collect() }
    assert(e1.toString.contains("length mismatch") ||
      Option(e1.getCause).exists(_.toString.contains("length mismatch")))
    // null element: loud error, never read as 0.0
    val withNull = Seq(("x")).toDF("id")
      .selectExpr("array(cast(1.0 as float), cast(null as float)) AS a",
        "array(cast(1.0 as float), cast(1.0 as float)) AS b")
      .select(ArrayCosineSim($"a", $"b"))
    val e2 = intercept[Exception] { withNull.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    assert(msgs(e2).contains("null array element"))
    // duplicate elements: distinct-view jaccard (array_intersect/union
    // semantics), never > 1
    val dup = Seq((Seq("x"), Seq("x", "x"))).toDF("a", "b")
      .select(StringArrayJaccard($"a", $"b").as("j"))
      .as[Double].head()
    assert(dup == 1.0, s"expected distinct-view jaccard 1.0, got $dup")
  }

  test("asofJoin picks the most recent right row at or before left ts") {
    def ts(s: String) = Timestamp.valueOf(s)
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:30")),
      (2L, 10L, ts("2024-01-01 10:02:00")),
      (3L, 20L, ts("2024-01-01 10:00:10")),
      (4L, 30L, ts("2024-01-01 09:00:00"))) // before any quote → drops
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 10:01:00"), 101.0),
      (10L, ts("2024-01-01 10:02:00"), 102.0), // equal ts → inclusive
      (20L, ts("2024-01-01 10:00:10"), 200.0))
      .toDF("qsym", "qt", "px")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "qsym", "t", "qt",
        Seq("px"))
      .select("trade_id", "px").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 100.0, 2L -> 102.0, 3L -> 200.0))
  }
}
