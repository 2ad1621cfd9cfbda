package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch probe: isolate the gradient-descent round cost — the
  * reference-object weight expression (WeightedDotConst) vs the
  * literal-fold formulation it replaced. Prints per-variant wall
  * seconds for the same rounds over the same cached frame, plus the
  * first/last weights so the two paths are provably bit-identical.
  */
object GdProbe {
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def gradient(train: DataFrame, featCols: Seq[String],
                       labelCol: String, w: Array[Double],
                       useNative: Boolean): Array[Double] = {
    val z =
      if (useNative) graft.plans.WeightedDotConst(featCols.map(col), w)
      else featCols.zipWithIndex.map { case (f, j) =>
        lit(w(j)) * col(f)
      }.reduceLeft(_ + _)
    val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    val e = p - col(labelCol).cast("double")
    val sums = featCols.map(f =>
      sum(round(e * col(f), 9).cast(DecimalType(28, 9))).as(s"g_$f"))
    val row = train.agg(sums.head, sums.tail: _*).head()
    featCols.indices.map { j =>
      val d = row.getDecimal(j)
      if (d == null) 0.0 else d.doubleValue()
    }.toArray
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 24
    val n = if (args.length > 1) args(1).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feats = Seq("x0", "x1", "x2", "x3", "x4", "x5")
    val df = spark.range(n).selectExpr(
      "cast(1.0 as double) x0",
      "cast((id % 100) / 100.0 as double) x1",
      "cast((id % 7) / 7.0 as double) x2",
      "cast((id % 13) / 13.0 as double) x3",
      "cast((id % 31) / 31.0 as double) x4",
      "cast((id % 3) / 3.0 as double) x5",
      "cast(id % 2 as int) y").cache()
    df.count()
    val nn = n.toDouble
    // --codegen mode: dump the generated source of one gradient
    // aggregate for two different weight vectors and report whether
    // the bodies are identical (the cache-hit precondition)
    if (args.contains("--dumpsrc")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
      var w = Array.fill(feats.size)(0.0)
      for (r <- 0 until rounds) {
        System.err.println(s"=== ROUND $r ===")
        val g = gradient(df, feats, "y", w, useNative = true)
        w = w.indices.map(j => round9(w(j) - 2.0 * g(j) / nn)).toArray
      }
      spark.stop(); return
    }
    if (args.contains("--exprsrc")) {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference => BR}
      import org.apache.spark.sql.types.DoubleType
      def srcOf(w: Array[Double]): String = {
        val ctx = new org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
        val ex = graft.plans.WeightedDotConst(
          (0 until w.length).map(i => BR(i, DoubleType, nullable = false)), w)
        val code = ex.genCode(ctx).code.toString
        code + "||" + ctx.references.map(_.getClass.getSimpleName).mkString(",")
      }
      val a = srcOf(Array(0.0, 1.0)); val b = srcOf(Array(0.5, -2.5))
      println(s"[gd-exprsrc] identical=${a == b}")
      if (a != b) println(s"[gd-exprsrc] A=$a\n[gd-exprsrc] B=$b")
      else println(s"[gd-exprsrc] src=$a")
      spark.stop(); return
    }
    if (args.contains("--codegen")) {
      def src(w: Array[Double], native: Boolean): String = {
        val z =
          if (native) graft.plans.WeightedDotConst(feats.map(col), w)
          else feats.zipWithIndex.map { case (f, j) =>
            lit(w(j)) * col(f) }.reduceLeft(_ + _)
        val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
        val e = p - col("y").cast("double")
        val sums = feats.map(f =>
          sum(round(e * col(f), 9).cast(DecimalType(28, 9))).as(s"g_$f"))
        val agg = df.agg(sums.head, sums.tail: _*)
        agg.head() // AQE: the final (codegen-bearing) plan exists only after execution
        org.apache.spark.sql.execution.debug.codegenString(
          agg.queryExecution.executedPlan)
      }
      val w1 = Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      val w2 = Array(0.125, -0.25, 0.5, -0.125, 0.0625, 0.75)
      Seq(true, false).foreach { nat =>
        val a = src(w1, nat); val b = src(w2, nat)
        println(s"[gd-codegen] native=$nat identical=${a == b} lenA=${a.length} lenB=${b.length}")
        if (a != b && nat) {
          val diffs = a.linesIterator.zip(b.linesIterator)
            .filter { case (x, y) => x != y }.take(10)
          diffs.foreach { case (x, y) =>
            println(s"[gd-codegen] A: $x"); println(s"[gd-codegen] B: $y") }
        }
      }
      spark.stop(); return
    }
    val cm = org.apache.spark.metrics.source.CodegenMetrics
    Seq(true, false, true, false).foreach { native =>
      var w = Array.fill(feats.size)(0.0)
      val c0 = cm.METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime()
      for (_ <- 0 until rounds) {
        val g = gradient(df, feats, "y", w, native)
        w = w.indices.map(j => round9(w(j) - 2.0 * g(j) / nn)).toArray
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val compiles = cm.METRIC_COMPILATION_TIME.getCount - c0
      println(f"[gd] native=$native%-5s rounds=$rounds wall=$dt%7.3f s  " +
        f"compiles=$compiles%3d  w=${w.take(2).mkString(",")}")
    }
    spark.stop()
  }
}
