package graft.operators

/** A real (non-proxy) [[Scorers.ModelBackend]]: scores come from an
  * HTTP inference endpoint — the shape a vLLM/TGI-style model server
  * drops into behind the same trait the deterministic proxy uses.
  * Proves the inference seam the reference's GPU scorers
  * (`score_pipeline_ifd.py:46–58`: one model load, then per-example
  * calls) would occupy: one backend (and one keep-alive HTTP client)
  * per executor PARTITION via `mapPartitions` init, per-row calls to
  * the server, everything downstream pure Catalyst columns.
  *
  * Wire protocol (line-of-JSON over POST, no streaming):
  *   {"op":"ppl","text":T}                       → {"value":N}
  *   {"op":"embed","text":T}                     → {"values":[N,...]}
  *   {"op":"reward","prompt":P,"completion":C}   → {"value":N}
  *   {"op":"token_loss","prompt":P,"completion":C} → {"values":[N,...]}
  *
  * Scale posture: the client is created lazily per deserialized
  * instance (one per partition, like the proxy's MessageDigest), uses
  * keep-alive so a partition's rows share connections, and retries
  * transient failures with a bounded backoff — a slow/flaky endpoint
  * degrades throughput, never correctness. At 1000 executors the
  * endpoint is a horizontally scaled inference service; nothing in
  * the operator changes.
  */
final class HttpBackend(endpoint: String, maxRetries: Int = 2,
                        connectTimeoutMs: Int = 2000,
                        requestTimeoutMs: Int = 30000)
    extends Scorers.ModelBackend {
  import MiniJson._

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs.toLong))
      .build()

  private def post(body: String): String = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body, UTF8))
      .build()
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      var resp: java.net.http.HttpResponse[String] = null
      try resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString(UTF8))
      catch { case e: Exception => last = e } // connect/timeout: transient
      if (resp != null) {
        val code = resp.statusCode()
        if (code == 200) return resp.body()
        last = new RuntimeException(
          s"inference endpoint returned HTTP $code: ${resp.body().take(200)}")
        // Only 5xx and 429 are worth retrying; any other 4xx (bad
        // request, auth) is permanent — retrying would burn maxRetries
        // backoff sleeps PER ROW at billions of rows before the same
        // hard failure.
        if (code < 500 && code != 429)
          throw new RuntimeException(
            s"inference call failed, not retriable: ${last.getMessage}", last)
      }
      attempt += 1
      if (attempt <= maxRetries) Thread.sleep(50L << (attempt - 1))
    }
    throw new RuntimeException(
      s"inference call failed after ${maxRetries + 1} attempts: ${last.getMessage}", last)
  }

  private def call1(op: String, fields: (String, String)*): Double =
    extractNumber(post(obj(("op" -> op) +: fields: _*)), "value")
  private def callN(op: String, fields: (String, String)*): Array[Double] =
    extractNumberArray(post(obj(("op" -> op) +: fields: _*)), "values")

  override def ppl(text: String): Double = call1("ppl", "text" -> text)
  override def embed(text: String): Array[Float] =
    callN("embed", "text" -> text).map(_.toFloat)
  override def reward(prompt: String, completion: String): Double =
    call1("reward", "prompt" -> prompt, "completion" -> completion)
  override def tokenLoss(prompt: String, completion: String): Array[Double] =
    callN("token_loss", "prompt" -> prompt, "completion" -> completion)

  /** The whole micro-batch in ONE request — the transport seam the
    * batched operators ([[Scorers.withModelScoresBatched]]) drive.
    * Request: {"op":"batch","ops":[...],"as":[...],"bs":[...]} (three
    * parallel arrays, one slot per item). Response: {"lens":[...],
    * "values":[...]} — per-item result lengths plus the flat
    * concatenation, which keeps the protocol inside MiniJson's
    * flat-arrays-only surface. */
  override def scoreBatch(items: Seq[Scorers.BatchItem]): Seq[Array[Double]] = {
    if (items.isEmpty) return Nil
    val body = rawObj(
      "op" -> "\"batch\"",
      "ops" -> strArr(items.map(_.op)),
      "as" -> strArr(items.map(_.a)),
      "bs" -> strArr(items.map(_.b)))
    val resp = post(body)
    val lens = extractNumberArray(resp, "lens").map(_.toInt)
    val values = extractNumberArray(resp, "values")
    require(lens.length == items.length,
      s"batch response has ${lens.length} results for ${items.length} items")
    require(lens.sum == values.length,
      s"batch response lens sum to ${lens.sum} but carries ${values.length} values")
    var off = 0
    lens.map { n =>
      val a = java.util.Arrays.copyOfRange(values, off, off + n)
      off += n
      a
    }.toSeq
  }
}

/** Minimal JSON encode/extract for the flat inference protocol above —
  * string/number/number-array values only, no nesting. Shared by the
  * client and the fixture server in the spec so both sides speak the
  * exact same escaping. Not a general JSON library on purpose: the
  * protocol is fixed, and a hand-verified 60-line codec beats an
  * unavailable dependency (offline build). */
object MiniJson {
  val UTF8: java.nio.charset.Charset = java.nio.charset.StandardCharsets.UTF_8

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  /** {"k":"v",...} with every value treated as a string. */
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => "\"" + k + "\":\"" + escape(v) + "\"" }
      .mkString("{", ",", "}")

  /** JSON has no encoding for NaN/±Infinity — emitting them bare (as
    * Scala's toString would) produces output a strict parser on either
    * side rejects. The protocol's choice: scores must be finite; a
    * model that emits a non-finite score is a server-side bug the
    * transport surfaces loudly instead of smuggling through. */
  private def fin(value: Double): Double = {
    require(!value.isNaN && !value.isInfinite,
      s"non-finite $value has no valid JSON encoding (protocol requires finite scores)")
    value
  }

  def num(value: Double): String = s"""{"value":${fin(value)}}"""
  def nums(values: Seq[Double]): String =
    values.map(fin).mkString("{\"values\":[", ",", "]}")

  /** Bare JSON array of numbers (for [[rawObj]] fields). */
  def numArr(values: Seq[Double]): String =
    values.map(fin).mkString("[", ",", "]")

  /** Bare JSON array of strings (for [[rawObj]] fields). */
  def strArr(values: Seq[String]): String =
    values.map(v => "\"" + escape(v) + "\"").mkString("[", ",", "]")

  /** {"k":v,...} where each value is ALREADY-ENCODED JSON (string
    * literal, array, number) — the builder for the batch protocol's
    * mixed-type objects. */
  def rawObj(fields: (String, String)*): String =
    fields.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** Parse the string literal whose opening quote is at `start`;
    * returns (value, index just past the closing quote). Unescapes
    * what [[escape]] emits. */
  private def parseStringAt(json: String, start: Int): (String, Int) = {
    require(json.charAt(start) == '"', s"expected '\"' at $start")
    val b = new StringBuilder
    var i = start + 1
    while (json.charAt(i) != '"') {
      val c = json.charAt(i)
      if (c == '\\') {
        json.charAt(i + 1) match {
          case '"'  => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'u'  =>
            b.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => throw new IllegalArgumentException(s"bad escape \\$other")
        }
      } else { b.append(c); i += 1 }
    }
    (b.toString, i + 1)
  }

  /** Value of a string field, unescaping what [[escape]] emits. */
  def extractString(json: String, key: String): String = {
    val tag = "\"" + key + "\":\""
    val from = json.indexOf(tag)
    require(from >= 0, s"missing string field '$key' in: ${json.take(120)}")
    parseStringAt(json, from + tag.length - 1)._1
  }

  /** Elements of a string-array field (escape-aware: a ']' inside an
    * element cannot end the scan). */
  def extractStringArray(json: String, key: String): Seq[String] = {
    val tag = "\"" + key + "\":["
    val from = json.indexOf(tag)
    require(from >= 0, s"missing string-array field '$key' in: ${json.take(120)}")
    val out = Seq.newBuilder[String]
    var i = from + tag.length
    while (i < json.length && json.charAt(i) != ']') {
      json.charAt(i) match {
        case '"' =>
          val (v, next) = parseStringAt(json, i)
          out += v
          i = next
        case _ => i += 1 // comma / whitespace between elements
      }
    }
    require(i < json.length, s"unterminated string-array '$key'")
    out.result()
  }

  def extractNumber(json: String, key: String): Double = {
    val tag = "\"" + key + "\":"
    val from = json.indexOf(tag)
    require(from >= 0, s"missing number field '$key' in: ${json.take(120)}")
    val start = from + tag.length
    var end = start
    while (end < json.length && "+-.0123456789eENaInfity".indexOf(json.charAt(end)) >= 0)
      end += 1
    json.substring(start, end).toDouble
  }

  def extractNumberArray(json: String, key: String): Array[Double] = {
    val tag = "\"" + key + "\":["
    val from = json.indexOf(tag)
    require(from >= 0, s"missing array field '$key' in: ${json.take(120)}")
    val start = from + tag.length
    val end = json.indexOf(']', start)
    require(end >= 0, s"unterminated array '$key'")
    val body = json.substring(start, end).trim
    if (body.isEmpty) Array.empty[Double]
    else body.split(",").map(_.trim.toDouble)
  }
}
