package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HttpBackend, MiniJson, Scorers}

/** The real-inference seam, proven end to end: a local HTTP model
  * server (JDK HttpServer; serves the deterministic proxy model over
  * the documented JSON protocol) stands in for a vLLM/TGI-style
  * endpoint, and the full Spark scoring pipelines run against it
  * through [[HttpBackend]] — results must be EXACTLY what the in-JVM
  * proxy computes, which makes the proxy the oracle for the transport.
  */
class HttpBackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Fixture inference server: the proxy model behind HTTP. */
  private def withServer(failFirst: Int = 0)(f: String => Unit): Unit = {
    // one model per server thread: ProxyBackend's MessageDigest is
    // stateful and NOT thread-safe (same reason the Spark side inits
    // one backend per partition)
    val models = ThreadLocal.withInitial[Scorers.ProxyBackend](
      () => new Scorers.ProxyBackend(seed = 42L))
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/score", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), MiniJson.UTF8)
      val resp =
        if (failures.getAndDecrement() > 0) { // transient-failure mode
          exchange.sendResponseHeaders(503, -1); None
        } else Some({
          val model = models.get()
          MiniJson.extractString(body, "op") match {
          case "ppl"    => MiniJson.num(model.ppl(MiniJson.extractString(body, "text")))
          case "embed"  => MiniJson.nums(
            model.embed(MiniJson.extractString(body, "text")).map(_.toDouble).toSeq)
          case "reward" => MiniJson.num(model.reward(
            MiniJson.extractString(body, "prompt"),
            MiniJson.extractString(body, "completion")))
          case "token_loss" => MiniJson.nums(model.tokenLoss(
            MiniJson.extractString(body, "prompt"),
            MiniJson.extractString(body, "completion")).toSeq)
          case other => throw new IllegalArgumentException(s"bad op $other")
        }})
      resp.foreach { r =>
        val bytes = r.getBytes(MiniJson.UTF8)
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      }
      exchange.close()
    })
    // a few threads: local[*] partitions call concurrently
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/score")
    finally server.stop(0)
  }

  private def fixtureDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "with \"quotes\" and \\backslashes\\ and\nnewlines\tand unicode é中"),
    (3L, ""),
    (4L, "plain words once more for the scorer")).toDF("doc_id", "text")

  test("HTTP backend reproduces the proxy exactly through withModelScores") {
    withServer() { url =>
      def run(make: () => Scorers.ModelBackend) =
        Scorers.withModelScores(fixtureDocs, "text", make)
          .select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
          .collect().sortBy(_.getLong(0)).toSeq
      val viaHttp = run(() => new HttpBackend(url))
      val viaProxy = run(() => new Scorers.ProxyBackend(42L))
      assert(viaHttp == viaProxy) // bit-exact, embeddings included
    }
  }

  test("HTTP backend reproduces the proxy exactly through the IFD pipeline") {
    withServer() { url =>
      val alpaca = fixtureDocs.select($"doc_id",
        substring($"text", 1, 20).as("instruction"),
        lit("").as("input"), $"text".as("output"))
      def run(make: () => Scorers.ModelBackend) =
        Scorers.ifdPipeline(alpaca, make)
          .select($"doc_id", $"score_ifd").collect()
          .sortBy(_.getLong(0)).toSeq
      assert(run(() => new HttpBackend(url)) ==
        run(() => new Scorers.ProxyBackend(42L)))
    }
  }

  test("transient endpoint failures are retried, not surfaced") {
    withServer(failFirst = 2) { url =>
      val b = new HttpBackend(url, maxRetries = 3)
      val direct = new Scorers.ProxyBackend(42L)
      assert(b.ppl("hello world") == direct.ppl("hello world"))
    }
  }

  test("a dead endpoint fails loudly after bounded retries") {
    val b = new HttpBackend("http://127.0.0.1:1/score", maxRetries = 1,
      connectTimeoutMs = 200)
    val e = intercept[RuntimeException] { b.ppl("x") }
    assert(e.getMessage.contains("after 2 attempts"), e.getMessage)
  }

  test("MiniJson round-trips hostile strings") {
    val hostile = "a\"b\\c\nd\te\rfgé中h"
    val json = MiniJson.obj("text" -> hostile, "op" -> "ppl")
    assert(MiniJson.extractString(json, "text") == hostile)
    assert(MiniJson.extractString(json, "op") == "ppl")
    assert(MiniJson.extractNumberArray(MiniJson.nums(Seq(1.5, -2.25)), "values")
      .toSeq == Seq(1.5, -2.25))
    assert(MiniJson.extractNumberArray(MiniJson.nums(Nil), "values").isEmpty)
    assert(MiniJson.extractNumber(MiniJson.num(3.75), "value") == 3.75)
  }
}
