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
  * The batched transport is held to the same bar PLUS a request-count
  * assertion: N rows at micro-batch 32 must produce ⌈N/32⌉ requests.
  */
class HttpBackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Fixture inference server: the proxy model behind HTTP. Counts
    * every request it receives (batching evidence). `failFirst`
    * requests fail with `failCode` before normal service resumes. */
  private def withServer(failFirst: Int = 0, failCode: Int = 503)
      (f: (String, java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    // one model per server thread: ProxyBackend's MessageDigest is
    // stateful and NOT thread-safe (same reason the Spark side inits
    // one backend per partition)
    val models = ThreadLocal.withInitial[Scorers.ProxyBackend](
      () => new Scorers.ProxyBackend(seed = 42L))
    val failures = new java.util.concurrent.atomic.AtomicInteger(failFirst)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/score", { exchange =>
      requests.incrementAndGet()
      val body = new String(exchange.getRequestBody.readAllBytes(), MiniJson.UTF8)
      val resp =
        if (failures.getAndDecrement() > 0) { // transient-failure mode
          exchange.sendResponseHeaders(failCode, -1); None
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
          case "batch" =>
            // parallel arrays → BatchItems → the trait's own batch
            // dispatch (the server IS a ModelBackend holder)
            val items = MiniJson.extractStringArray(body, "ops")
              .lazyZip(MiniJson.extractStringArray(body, "as"))
              .lazyZip(MiniJson.extractStringArray(body, "bs"))
              .map(Scorers.BatchItem(_, _, _))
            val results = model.scoreBatch(items)
            MiniJson.rawObj(
              "lens" -> MiniJson.numArr(results.map(_.length.toDouble)),
              "values" -> MiniJson.numArr(results.flatMap(_.toSeq)))
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
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/score", requests)
    finally server.stop(0)
  }

  private def fixtureDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "with \"quotes\" and \\backslashes\\ and\nnewlines\tand unicode é中"),
    (3L, ""),
    (4L, "plain words once more for the scorer")).toDF("doc_id", "text")

  test("HTTP backend reproduces the proxy exactly through withModelScores") {
    withServer() { (url, _) =>
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
    withServer() { (url, _) =>
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

  test("batched transport == per-row == proxy, one request per micro-batch") {
    // 70 rows in ONE partition at micro-batch 32 → exactly ⌈70/32⌉ = 3
    // HTTP requests (each carrying 3 items per row), vs 210 per-row ones
    val docs = spark.range(0, 70)
      .select($"id".as("doc_id"),
        concat(lit("document body number "), $"id").as("text"))
      .coalesce(1)
    val viaProxy = Scorers.withModelScores(docs, "text",
        () => new Scorers.ProxyBackend(42L))
      .select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
      .collect().sortBy(_.getLong(0)).toSeq
    withServer() { (url, requests) =>
      val viaBatch = Scorers.withModelScoresBatched(docs, "text",
          () => new HttpBackend(url), batchSize = 32)
        .select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
        .collect().sortBy(_.getLong(0)).toSeq
      assert(viaBatch == viaProxy) // bit-exact through the batch wire
      assert(requests.get() == 3, s"expected 3 batch requests, saw ${requests.get()}")
    }
  }

  test("token-aware batching: bit-exact, requests match greedy token packing") {
    // Skewed-length fixture, one partition. Whitespace words of one
    // char each -> subwordCount == word count, so the per-row token
    // weights are exactly `lens`. With capTokens=30 / capRows=4 the
    // greedy packing is forced into 5 requests:
    //   [10,10,10] (fills the cap) | [50] (oversized row ships alone)
    //   | [3,3,3,3] (capRows bound) | [100] (alone) | [2]
    val lens = Seq(10, 10, 10, 50, 3, 3, 3, 3, 100, 2)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, ("w " * n).trim) }
      .toDF("doc_id", "text").coalesce(1)
    val viaProxy = Scorers.withModelScores(docs, "text",
        () => new Scorers.ProxyBackend(42L))
      .select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
      .collect().sortBy(_.getLong(0)).toSeq
    withServer() { (url, requests) =>
      val viaTokenBatch = Scorers.withModelScoresTokenBatched(docs, "text",
          () => new HttpBackend(url), capTokens = 30L, capRows = 4)
        .select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
        .collect().sortBy(_.getLong(0)).toSeq
      assert(viaTokenBatch == viaProxy) // bit-exact through the token-packed wire
      assert(requests.get() == 5,
        s"expected 5 token-capped requests, saw ${requests.get()}")
    }
  }

  test("the trait's default scoreBatch delegates per item (proxy == batched proxy)") {
    val docs = fixtureDocs
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"ppl_ins_alone", $"emb_ins_alone", $"score_rw")
        .collect().sortBy(_.getLong(0)).toSeq
    assert(
      rows(Scorers.withModelScoresBatched(docs, "text",
        () => new Scorers.ProxyBackend(42L), batchSize = 2)) ==
      rows(Scorers.withModelScores(docs, "text",
        () => new Scorers.ProxyBackend(42L))))
  }

  test("transient endpoint failures are retried, not surfaced") {
    withServer(failFirst = 2) { (url, _) =>
      val b = new HttpBackend(url, maxRetries = 3)
      val direct = new Scorers.ProxyBackend(42L)
      assert(b.ppl("hello world") == direct.ppl("hello world"))
    }
  }

  test("a permanent 4xx fails immediately — no retry burn") {
    withServer(failFirst = 1000, failCode = 400) { (url, requests) =>
      val b = new HttpBackend(url, maxRetries = 3)
      val e = intercept[RuntimeException] { b.ppl("x") }
      assert(e.getMessage.contains("not retriable"), e.getMessage)
      assert(requests.get() == 1,
        s"a 400 must not be retried; server saw ${requests.get()} requests")
    }
  }

  test("a dead endpoint fails loudly after bounded retries") {
    val b = new HttpBackend("http://127.0.0.1:1/score", maxRetries = 1,
      connectTimeoutMs = 200)
    val e = intercept[RuntimeException] { b.ppl("x") }
    assert(e.getMessage.contains("after 2 attempts"), e.getMessage)
  }

  test("MiniJson round-trips hostile strings") {
    val hostile = "a\"b\\c\nd\te\rfgé中h"
    val json = MiniJson.obj("text" -> hostile, "op" -> "ppl")
    assert(MiniJson.extractString(json, "text") == hostile)
    assert(MiniJson.extractString(json, "op") == "ppl")
    assert(MiniJson.extractNumberArray(MiniJson.nums(Seq(1.5, -2.25)), "values")
      .toSeq == Seq(1.5, -2.25))
    assert(MiniJson.extractNumberArray(MiniJson.nums(Nil), "values").isEmpty)
    assert(MiniJson.extractNumber(MiniJson.num(3.75), "value") == 3.75)
  }

  test("MiniJson string arrays round-trip hostile elements (']' included)") {
    val hostile = Seq("plain", "with ] bracket", "q\"uote", "back\\slash",
      "new\nline", "", "中é")
    val json = MiniJson.rawObj("items" -> MiniJson.strArr(hostile),
      "n" -> MiniJson.numArr(Seq(7)))
    assert(MiniJson.extractStringArray(json, "items") == hostile)
    assert(MiniJson.extractNumberArray(json, "n").toSeq == Seq(7.0))
    assert(MiniJson.extractStringArray(
      MiniJson.rawObj("items" -> MiniJson.strArr(Nil)), "items").isEmpty)
  }

  test("MiniJson fails descriptively on truncated arrays (transport corruption)") {
    // a response cut mid-flight must surface as a protocol error, not
    // a StringIndexOutOfBoundsException
    val e1 = intercept[IllegalArgumentException] {
      MiniJson.extractStringArray("""{"items":["a","b"""", "items")
    }
    assert(e1.getMessage.contains("unterminated string-array 'items'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MiniJson.extractNumberArray("""{"values":[1,2""", "values")
    }
    assert(e2.getMessage.contains("unterminated array 'values'"), e2.getMessage)
  }

  test("MiniJson rejects non-finite numbers (invalid JSON)") {
    intercept[IllegalArgumentException] { MiniJson.num(Double.NaN) }
    intercept[IllegalArgumentException] { MiniJson.nums(Seq(1.0, Double.PositiveInfinity)) }
    intercept[IllegalArgumentException] { MiniJson.numArr(Seq(Double.NegativeInfinity)) }
  }
}
