package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextIndex

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 docs over a 6-word vocabulary with skewed tf — every word is a
  // "stopword" (df ≈ corpus), the regime the bounded-heap path exists for
  private def docsDf = (1 to 40).map { i =>
    val words = (0 until 6).flatMap(w => Seq.fill((i * (w + 1)) % 7 + 1)(s"w$w"))
    (i.toLong, words.mkString(" "))
  }.toDF("doc_id", "text")

  test("topPostingsPerTerm equals the naive per-term window, any partitioning") {
    val posts = TextIndex.postings(docsDf, "doc_id", "text")
    def naive(p: Int) = {
      val w = Window.partitionBy($"word").orderBy($"tf".desc, $"doc")
      posts.withColumn("rk", row_number().over(w)).where($"rk" <= p)
        .select($"word", $"doc", $"tf", $"rk")
        .collect().map(_.toSeq).toSet
    }
    for (p <- Seq(1, 3, 10); parts <- Seq(1, 7)) {
      val got = TextIndex.topPostingsPerTerm(posts.repartition(parts), p)
        .select($"word", $"doc", $"tf", $"rk")
        .collect().map(_.toSeq).toSet
      assert(got == naive(p), s"p=$p parts=$parts")
    }
  }

  test("invertedIndex: df/cf exact, postings serialized in rank order") {
    val idx = TextIndex.invertedIndex(docsDf, "doc_id", "text", topP = 3)
      .orderBy($"word")
      .select($"word", $"df", $"cf", $"postings")
      .as[(String, Long, Long, String)].collect()
    assert(idx.map(_._1).toSeq == (0 until 6).map(i => s"w$i"))
    idx.foreach { case (w, df, cf, postings) =>
      assert(df == 40, s"$w present in every doc")
      val entries = postings.split(",")
      assert(entries.length == 3)
      val tfs = entries.map(_.split(":")(1).toLong).toSeq
      assert(tfs == tfs.sortBy(-_), s"$w postings not tf-descending: $postings")
      assert(cf >= tfs.sum)
    }
  }

  test("bm25TopK ranks higher-tf docs first; scores positive and bounded-sane") {
    // doc 1 is stuffed with the query term, doc 3 barely mentions it
    val df = Seq(
      (1L, "apple apple apple apple pie"),
      (2L, "apple apple banana pie pie"),
      (3L, "apple banana banana banana pie")).toDF("doc_id", "text")
    val out = TextIndex.bm25TopK(df, "doc_id", "text",
        Seq("apple"), k1 = 1.2, b = 0.75, topK = 3)
      .select($"doc", $"score").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_._2 > 0))
    // equal doc lengths ⇒ pure tf ordering, strictly monotone
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
  }
}
