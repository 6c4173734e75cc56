package graft.ops

/** Production [[NormTransport]]: POSTs each CURIE batch to a node-
  * normalization HTTP endpoint — the reference's EP2 service call
  * (`POST .../get_normalized_nodes` with `{"curies":[...],
  * "conflate":<bool>}`) — and returns the response body verbatim for
  * [[NodeNorm.parseResponses]].
  *
  * Pure-JDK `java.net.http`, no library dependency. The client is
  * `@transient lazy`, so the instance serializes into `mapPartitions`
  * tasks and each executor JVM rebuilds one connection-pooled client
  * on first use.
  *
  * Failure policy, tuned for the batch-granular retry contract of
  * [[NodeNorm.fetchResponses]] (a throwing post marks the WHOLE batch
  * failed and its ids ride to the failure file for replay):
  *  - 2xx → body returned;
  *  - 4xx → fail FAST (the request itself is wrong; retrying the same
  *    bytes cannot help);
  *  - 5xx / connect / IO errors → bounded retries with exponential
  *    backoff (`backoffMs << attempt`), then a summarizing exception.
  *
  * Verified against an in-process loopback server in TransportSpec
  * (the build container has zero egress; the HTTP path, retries and
  * fail-fast behavior are all exercised for real over 127.0.0.1).
  */
final class HttpNormTransport(
    endpoint: String,
    conflate: Boolean = true,
    timeoutMs: Int = 30000,
    maxRetries: Int = 3,
    backoffMs: Int = 500) extends NormTransport {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .build()

  private def esc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  def post(ids: Seq[String]): String = {
    val body = ids.map(i => "\"" + esc(i) + "\"")
      .mkString("{\"curies\":[", ",", s"],\"conflate\":$conflate}")
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        body, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    var last = "no attempt made"
    var attempt = 0
    while (attempt <= maxRetries) {
      if (attempt > 0 && backoffMs > 0)
        Thread.sleep(backoffMs.toLong << (attempt - 1))
      val resp =
        try Some(client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()))
        catch {
          case e: java.io.IOException => last = e.toString; None
        }
      resp.foreach { r =>
        val sc = r.statusCode()
        if (sc / 100 == 2) return r.body()
        else if (sc / 100 == 4)
          throw new java.io.IOException(
            s"norm service rejected batch: HTTP $sc ${r.body().take(200)}")
        else last = s"HTTP $sc ${r.body().take(200)}"
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"norm batch failed after ${maxRetries + 1} attempts: $last")
  }
}
