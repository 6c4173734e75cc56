package graft.ops

/** EP1 source-ACQUISITION seam — the reference's `GetData` step that
  * runs BEFORE any Spark job: probe a source's published version, fetch
  * its artifact over HTTP with bounded retries, and skip the download
  * entirely when the recorded version still matches (the reference's
  * per-source version gate that makes `load_manager` re-runs cheap).
  *
  * Deliberately driver-side and Spark-free: acquisition lands files in
  * shared storage and the Spark pipeline starts at the scan, exactly as
  * the reference separates fetching from parsing. Pure-JDK
  * `java.net.http` like [[HttpNormTransport]]; the same failure policy
  * (2xx ok; 4xx fail FAST — the request itself is wrong; 5xx / IO →
  * exponential backoff then a summarizing exception).
  *
  * Version probe = one HEAD request: `ETag` if the server sends one,
  * else `Last-Modified`, else the sentinel "unversioned" (a source
  * with no version signal re-fetches every run — the reference's
  * always-refresh fallback). The recorded version lives in a
  * `<dest>.version` sidecar so the artifact and its provenance travel
  * together. Verified against an in-process loopback server in
  * TransportSpec (zero-egress container; HTTP, retry, fail-fast and
  * skip-on-match are all exercised for real over 127.0.0.1).
  */
final class SourceFetch(
    timeoutMs: Int = 30000,
    maxRetries: Int = 3,
    backoffMs: Int = 500) extends Serializable {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .build()

  private def send[T](req: java.net.http.HttpRequest,
      handler: java.net.http.HttpResponse.BodyHandler[T],
      what: String): java.net.http.HttpResponse[T] = {
    var last = "no attempt made"
    var attempt = 0
    while (attempt <= maxRetries) {
      if (attempt > 0 && backoffMs > 0)
        Thread.sleep(backoffMs.toLong << (attempt - 1))
      val resp =
        try Some(client.send(req, handler))
        catch { case e: java.io.IOException => last = e.toString; None }
      resp.foreach { r =>
        val sc = r.statusCode()
        if (sc / 100 == 2) return r
        else if (sc / 100 == 4)
          throw new java.io.IOException(s"$what rejected: HTTP $sc")
        else last = s"HTTP $sc"
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"$what failed after ${maxRetries + 1} attempts: $last")
  }

  /** The source's published version: ETag, else Last-Modified, else
    * "unversioned". One HEAD request (retried like a fetch). */
  def probeVersion(url: String): String = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody())
      .build()
    val r = send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding(),
      s"version probe $url")
    r.headers().firstValue("ETag")
      .or(() => r.headers().firstValue("Last-Modified"))
      .orElse("unversioned")
  }

  /** GET the artifact bytes (bounded retry, fail-fast 4xx). */
  def fetch(url: String): Array[Byte] = fetchResponse(url).body()

  /** GET, keeping the full response so the caller can read the version
    * headers of the SAME exchange that produced the body. */
  private def fetchResponse(url: String)
      : java.net.http.HttpResponse[Array[Byte]] = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .GET().build()
    send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray(),
      s"fetch $url")
  }

  /** The version gate: probe; if `<dest>.version` records the same
    * version AND the artifact exists, SKIP (no GET); otherwise fetch,
    * write the artifact, record the version. Returns
    * (version, fetched) — fetched=false is the reference's
    * "source up to date, load skipped" path. */
  def fetchIfChanged(url: String, dest: java.nio.file.Path)
      : (String, Boolean) = {
    val version = probeVersion(url)
    val sidecar = dest.resolveSibling(dest.getFileName.toString + ".version")
    // the sidecar holds every validator of the recorded artifact, one
    // per line (GET's first, probe's second): a server whose HEAD and
    // GET validators persistently differ (weak vs strong ETag,
    // GET-only ETag) must still match the next HEAD probe — matching
    // only the GET validator re-downloads on every refresh
    val recorded: Set[String] =
      if (java.nio.file.Files.exists(sidecar))
        new String(java.nio.file.Files.readAllBytes(sidecar),
          java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.filter(_.nonEmpty).toSet
      else Set.empty
    val upToDate = version != "unversioned" &&
      recorded.contains(version) && java.nio.file.Files.exists(dest)
    if (upToDate) (version, false)
    else {
      // Record the version of the SAME exchange that produced the
      // body: if the source re-publishes between the HEAD probe and
      // the GET, pairing the new bytes with only the stale probed
      // version would wrongly skip the next refresh. The GET's own
      // ETag/Last-Modified wins (first sidecar line, the returned
      // version); the probed validator is recorded beside it so a
      // persistent HEAD≠GET validator split still skips next time.
      val resp = fetchResponse(url)
      val gotVersion = resp.headers().firstValue("ETag")
        .or(() => resp.headers().firstValue("Last-Modified"))
        .orElse(version)
      Option(dest.getParent)
        .foreach(p => java.nio.file.Files.createDirectories(p))
      java.nio.file.Files.write(dest, resp.body())
      val validators = Seq(gotVersion, version)
        .filter(_ != "unversioned").distinct
      java.nio.file.Files.write(sidecar, validators.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (gotVersion, true)
    }
  }
}
