package graft

import graft.ops.{NodeNorm, NormTransport, ScratchCache}
import org.apache.spark.sql.functions._

/** Test services live OUTSIDE the suite class — an inner class would
  * drag the non-serializable scalatest engine into the task closure. */
object TransportSpec {
  /** Echo service: every id normalizes to `C:<id>` and the label
    * records the SIZE of the batch it arrived in — executor-side proof
    * of the batching the driver can assert on. */
  class EchoService extends NormTransport {
    def post(ids: Seq[String]): String =
      ids.map { id =>
        s""""$id":{"id":{"identifier":"C:$id","label":"b${ids.size}"},""" +
          """"equivalent_identifiers":[],"type":["t"]}"""
      }.mkString("{", ",", "}")
  }

  /** EchoService that 500s any batch containing the sentinel id. */
  class BoomService extends NormTransport {
    private val inner = new EchoService
    def post(ids: Seq[String]): String =
      if (ids.contains("BAD")) throw new RuntimeException("service 500")
      else inner.post(ids)
  }

  /** Declines (returns null for) every id ending in '2'. */
  class DeclineService extends NormTransport {
    def post(ids: Seq[String]): String =
      ids.map { id =>
        if (id.endsWith("2")) s""""$id":null"""
        else s""""$id":{"id":{"identifier":"C:$id","label":"x"},""" +
          """"equivalent_identifiers":[],"type":["t"]}"""
      }.mkString("{", ",", "}")
  }
}

/** Batched normalization transport (EP2 shape): batch boundaries,
  * service-declined ids, and the failure-file twin. */
class TransportSpec extends GraftSuite {
  import spark.implicits._
  import TransportSpec._

  test("fetchResponses batches per partition, never above batchSize") {
    val ids = (1 to 20).map(i => s"ID$i").toDF("raw").repartition(1)
    val batches = NodeNorm.fetchResponses(ids, "raw", 7, new EchoService)
    // 20 ids through one partition at batchSize 7 → 7, 7, 6
    assert(batches.select("n_ids").as[Int].collect().sorted.toSeq ==
      Seq(6, 7, 7))
    val parsed = NodeNorm.parseResponses(
      batches.filter(col("err").isNull), "body")
    assert(parsed.count() == 20)
    // every id normalized exactly once; batch sizes visible in labels
    assert(parsed.select("canonical_label").as[String].collect()
      .forall(l => l == "b7" || l == "b6"))
    assert(parsed.select("raw_id").as[String].collect().toSet ==
      (1 to 20).map(i => s"ID$i").toSet)
  }

  test("normalizeBatched: failed batches land in the failure file, " +
      "every id accounted for exactly once") {
    val boom = new BoomService
    val ids = ((1 to 9).map(i => s"ID$i") :+ "BAD").toDF("raw")
      .repartition(1)
    val failDir = java.nio.file.Files
      .createTempDirectory("graft_normfail").toString + "/out"
    // batchSize 4 over a sorted single partition → one batch holds BAD
    val mapping = NodeNorm.normalizeBatched(
      ids.orderBy("raw"), "raw", 4, boom, failDir)
    val ok = mapping.select("raw_id").as[String].collect().toSet
    val failed = spark.read.schema("raw_id STRING, err STRING").json(failDir)
    val failedIds = failed.select("raw_id").as[String].collect().toSet
    assert(failedIds.contains("BAD"))
    assert(failed.select("err").as[String].collect()
      .forall(_ == "service 500"))
    assert((ok & failedIds).isEmpty)
    assert(ok ++ failedIds == (1 to 9).map(i => s"ID$i").toSet + "BAD")
    ScratchCache.releaseAll()
  }

  test("mapping is batch-size invariant: the transport boundary never " +
      "changes semantics") {
    val ids = (1 to 57).map(i => s"ID$i").toDF("raw").repartition(3)
    def mapped(batchSize: Int): Map[String, String] = {
      val failDir = java.nio.file.Files
        .createTempDirectory(s"graft_bsi_$batchSize").toString + "/f"
      val m = NodeNorm.normalizeBatched(
          ids, "raw", batchSize, new EchoService, failDir)
        .select("raw_id", "canonical_id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      ScratchCache.releaseAll()
      m
    }
    val one = mapped(1)      // one POST per id
    val big = mapped(1000)   // one POST per partition
    val mid = mapped(7)      // ragged final chunks
    assert(one.size == 57 && one == big && one == mid)
  }

  test("service-declined ids keep NULL canonical columns") {
    val decline = new DeclineService
    val ids = Seq("A1", "A2", "A3").toDF("raw")
    val failDir = java.nio.file.Files
      .createTempDirectory("graft_normfail2").toString + "/out"
    val m = NodeNorm.normalizeBatched(ids, "raw", 10, decline, failDir)
    val rows = m.collect().map(r =>
      r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows == Map("A1" -> Some("C:A1"), "A2" -> None,
      "A3" -> Some("C:A3")))
    // declined ≠ transport failure: the failure file stays empty
    assert(spark.read.schema("raw_id STRING, err STRING").json(failDir)
      .isEmpty)
    ScratchCache.releaseAll()
  }

  /** Loopback normalization service on 127.0.0.1:ephemeral — answers
    * the reference EP2 contract; ids ending in '3' normalize to null
    * (service-declined). `failFirst` requests return 500 before
    * recovering, to exercise the retry path for real. */
  private def loopbackServer(hits: java.util.concurrent.atomic.AtomicInteger,
      failFirst: Int = 0): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/get_normalized_nodes",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val n = hits.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val resp =
          if (n <= failFirst) "upstream exploded"
          else {
            val list = body.substring(body.indexOf('['), body.indexOf(']'))
            """"([^"]+)"""".r.findAllMatchIn(list).map(_.group(1)).map { id =>
              if (id.endsWith("3")) s""""$id":null"""
              else s""""$id":{"id":{"identifier":"CANON:$id","label":"lbl $id"},""" +
                s""""equivalent_identifiers":[{"identifier":"$id","label":null}],""" +
                s""""type":["biolink:Agent"]}"""
            }.mkString("{", ",", "}")
          }
        val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(if (n <= failFirst) 500 else 200, bytes.length.toLong)
        val os = ex.getResponseBody
        os.write(bytes); os.close()
      })
    server.start()
    server
  }

  test("HTTP transport: real java.net.http POSTs against a loopback service") {
    val hits = new java.util.concurrent.atomic.AtomicInteger
    val server = loopbackServer(hits)
    try {
      val port = server.getAddress.getPort
      val t = new graft.ops.HttpNormTransport(
        s"http://127.0.0.1:$port/get_normalized_nodes", backoffMs = 0)
      val ids = (1 to 10).map(i => s"RAW:$i").toDF("raw")
      val failDir = java.nio.file.Files
        .createTempDirectory("graft_httpfail").toString + "/out"
      val m = NodeNorm.normalizeBatched(ids, "raw", 4, t, failDir)
      val rows = m.collect().map(r =>
        r.getString(0) -> Option(r.getString(1))).toMap
      ScratchCache.releaseAll()
      assert(rows.size == 10)
      assert(rows("RAW:1") == Some("CANON:RAW:1"))
      assert(rows("RAW:3") == None)  // service-declined over real HTTP
      assert(hits.get() == 3) // 10 distinct ids / batchSize 4 = 3 POSTs
      assert(spark.read.schema("raw_id STRING, err STRING").json(failDir)
        .isEmpty) // no transport failures
    } finally server.stop(0)
  }

  test("HTTP transport: 500s retry with backoff, 4xx fails the batch fast") {
    val hits = new java.util.concurrent.atomic.AtomicInteger
    val server = loopbackServer(hits, failFirst = 2)
    try {
      val port = server.getAddress.getPort
      val url = s"http://127.0.0.1:$port/get_normalized_nodes"
      // two 500s then success — inside the retry budget
      val t = new graft.ops.HttpNormTransport(url, maxRetries = 3, backoffMs = 0)
      val body = t.post(Seq("RAW:1"))
      assert(body.contains("CANON:RAW:1") && hits.get() == 3)
      // 404 (wrong path): fail fast, exactly ONE request, batch -> failure file
      val bad = new graft.ops.HttpNormTransport(
        s"http://127.0.0.1:$port/nope", maxRetries = 3, backoffMs = 0)
      val before = hits.get()
      val ids = Seq("B1", "B2").toDF("raw")
      val failDir = java.nio.file.Files
        .createTempDirectory("graft_httpfail4").toString + "/out"
      val m = NodeNorm.normalizeBatched(ids, "raw", 10, bad, failDir)
      assert(m.collect().isEmpty) // nothing normalized
      val failed = spark.read.schema("raw_id STRING, err STRING")
        .json(failDir).collect()
      ScratchCache.releaseAll()
      assert(failed.map(_.getString(0)).sorted.toSeq == Seq("B1", "B2"))
      assert(failed.head.getString(1).contains("404"))
      assert(hits.get() == before) // /nope never reaches the context counter
    } finally server.stop(0)
  }

  test("SourceFetch: version gate skips unchanged artifacts, refetches " +
      "on version change, retries 5xx, fails 4xx fast") {
    val heads = new java.util.concurrent.atomic.AtomicInteger
    val gets = new java.util.concurrent.atomic.AtomicInteger
    val etag = new java.util.concurrent.atomic.AtomicReference("\"v1\"")
    val fail = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        if (fail.getAndDecrement() > 0) {
          ex.sendResponseHeaders(500, -1); ex.close()
        } else {
          ex.getResponseHeaders.set("ETag", etag.get())
          if (ex.getRequestMethod == "HEAD") {
            heads.incrementAndGet()
            ex.sendResponseHeaders(200, -1)
          } else {
            gets.incrementAndGet()
            val body = s"payload-${etag.get()}".getBytes("UTF-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          }
          ex.close()
        }
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      val dest = java.nio.file.Files
        .createTempDirectory("graft_fetch").resolve("data.csv")
      val sf = new graft.ops.SourceFetch(maxRetries = 3, backoffMs = 0)
      // first run: probe + fetch, artifact + version sidecar written
      assert(sf.fetchIfChanged(url, dest) == ("\"v1\"", true))
      assert(new String(java.nio.file.Files.readAllBytes(dest), "UTF-8")
        == "payload-\"v1\"")
      assert(heads.get() == 1 && gets.get() == 1)
      // second run, unchanged version: HEAD only, no GET — the skip path
      assert(sf.fetchIfChanged(url, dest) == ("\"v1\"", false))
      assert(heads.get() == 2 && gets.get() == 1)
      // published version changes: refetch and re-record
      etag.set("\"v2\"")
      assert(sf.fetchIfChanged(url, dest) == ("\"v2\"", true))
      assert(gets.get() == 2)
      assert(new String(java.nio.file.Files.readAllBytes(dest), "UTF-8")
        == "payload-\"v2\"")
      // two 500s then success: inside the retry budget
      fail.set(2)
      assert(sf.probeVersion(url) == "\"v2\"")
      // 404 (wrong path): fail fast with a single request
      val sfBad = new graft.ops.SourceFetch(maxRetries = 3, backoffMs = 0)
      val e = intercept[java.io.IOException] {
        sfBad.fetch(
          s"http://127.0.0.1:${server.getAddress.getPort}/nope")
      }
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("SourceFetch: re-publish between HEAD probe and GET records the " +
      "GET's version, not the stale probe") {
    // HEAD says v1, but by the time the GET lands the source has
    // re-published v2: the sidecar must pair the v2 BYTES with the v2
    // version (same-exchange headers win), or the next run would
    // wrongly skip the refresh
    val headEtag = new java.util.concurrent.atomic.AtomicReference("\"v1\"")
    val getEtag = new java.util.concurrent.atomic.AtomicReference("\"v2\"")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        if (ex.getRequestMethod == "HEAD") {
          ex.getResponseHeaders.set("ETag", headEtag.get())
          ex.sendResponseHeaders(200, -1)
        } else {
          ex.getResponseHeaders.set("ETag", getEtag.get())
          val body = s"payload-${getEtag.get()}".getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      val dest = java.nio.file.Files
        .createTempDirectory("graft_fetch_race").resolve("data.csv")
      val sf = new graft.ops.SourceFetch(maxRetries = 1, backoffMs = 0)
      // probe sees v1, GET delivers v2 bytes + v2 header → record v2
      // first (the same-exchange validator), the probed v1 beside it
      assert(sf.fetchIfChanged(url, dest) == ("\"v2\"", true))
      val sidecar = dest.resolveSibling("data.csv.version")
      assert(new String(java.nio.file.Files.readAllBytes(sidecar),
        "UTF-8").linesIterator.toSeq == Seq("\"v2\"", "\"v1\""))
      // publication settles at v2: next run is a pure skip (no GET)
      headEtag.set("\"v2\"")
      assert(sf.fetchIfChanged(url, dest) == ("\"v2\"", false))
      // a GET with NO version headers falls back to the probed version
      val bare = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      bare.createContext("/b.csv",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          if (ex.getRequestMethod == "HEAD") {
            ex.getResponseHeaders.set("Last-Modified", "lm1")
            ex.sendResponseHeaders(200, -1)
          } else {
            val body = "b".getBytes("UTF-8")
            ex.sendResponseHeaders(200, body.length.toLong)
            ex.getResponseBody.write(body)
          }
          ex.close()
        })
      bare.start()
      try {
        val bUrl = s"http://127.0.0.1:${bare.getAddress.getPort}/b.csv"
        val bDest = dest.resolveSibling("b.csv")
        assert(sf.fetchIfChanged(bUrl, bDest) == ("lm1", true))
      } finally bare.stop(0)
    } finally server.stop(0)
  }

  test("SourceFetch: a server whose HEAD and GET validators persistently " +
      "differ (weak vs strong ETag) still skips on refresh") {
    // HEAD always advertises the weak form, GET the strong form — the
    // r11 sidecar recorded only the GET validator, so every refresh
    // probed W/"x", missed, and re-downloaded; recording BOTH
    // validators makes the second run a pure skip (zero GETs)
    val gets = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/w.csv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        if (ex.getRequestMethod == "HEAD") {
          ex.getResponseHeaders.set("ETag", "W/\"x\"")
          ex.sendResponseHeaders(200, -1)
        } else {
          gets.incrementAndGet()
          ex.getResponseHeaders.set("ETag", "\"x\"")
          val body = "w".getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/w.csv"
      val dest = java.nio.file.Files
        .createTempDirectory("graft_fetch_weak").resolve("w.csv")
      val sf = new graft.ops.SourceFetch(maxRetries = 1, backoffMs = 0)
      assert(sf.fetchIfChanged(url, dest) == ("\"x\"", true))
      assert(gets.get() == 1)
      // refresh: the probed weak validator matches the recorded set
      assert(sf.fetchIfChanged(url, dest) == ("W/\"x\"", false))
      assert(gets.get() == 1, "refresh must not re-download")
    } finally server.stop(0)
  }

  test("EP1 end-to-end: SourceFetch version gate drives loadIfStale — " +
      "unchanged source skips BOTH the download and the rebuild") {
    val heads = new java.util.concurrent.atomic.AtomicInteger
    val gets = new java.util.concurrent.atomic.AtomicInteger
    val etag = new java.util.concurrent.atomic.AtomicReference("\"r1\"")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/genes.tsv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.set("ETag", etag.get())
        if (ex.getRequestMethod == "HEAD") {
          heads.incrementAndGet(); ex.sendResponseHeaders(200, -1)
        } else {
          gets.incrementAndGet()
          // payload varies with the version, like a re-released source
          val body = s"g1\t${etag.get().length}\ng2\t7\n".getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/genes.tsv"
      val work = java.nio.file.Files.createTempDirectory("graft_ep1")
      val landed = work.resolve("genes.tsv")
      val outDir = work.resolve("parsed").toString
      val sfx = new graft.ops.SourceFetch(maxRetries = 2, backoffMs = 0)
      def runOnce(): graft.ops.Incremental.LoadStatus = {
        // the reference's EP1 shape: acquire (version-gated), then
        // parse/land (version-gated again) — both skips independent
        val (version, _) = sfx.fetchIfChanged(url, landed)
        graft.ops.Incremental.loadIfStale(spark, "genes", version, outDir) {
          spark.read.option("sep", "\t")
            .schema("gene STRING, score INT").csv(landed.toString)
        }
      }
      val first = runOnce()
      assert(!first.skipped && first.rows == 2L)
      // unchanged source: HEAD only — no download, no rebuild
      val second = runOnce()
      assert(second.skipped && gets.get() == 1)
      // version bump: refetch AND rebuild, new payload visible
      etag.set("\"r2-longer\"")
      val third = runOnce()
      assert(!third.skipped && gets.get() == 2)
      val scores = spark.read.parquet(third.dataPath)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(scores == Map("g1" -> 11, "g2" -> 7)) // "r2-longer" + quotes
    } finally server.stop(0)
  }

  test("normEquiv: transitive merge through overlapping equivalence " +
      "sets — A~B, B~C share nothing directly yet land in one node") {
    // planted fixture: CUST:1 {EQ:10,EQ:11}, CUST:2 {EQ:11,EQ:12},
    // CUST:3 {EQ:12} — 1 and 3 share NO equivalent id, only the chain;
    // CUST:9 isolated; CUST:5 failed normalization (dropped)
    val parsed = Seq(
      ("CUST:1", "EQ:10", Seq("EQ:10", "EQ:11")),
      ("CUST:2", "EQ:11", Seq("EQ:11", "EQ:12")),
      ("CUST:3", "EQ:12", Seq("EQ:12")),
      ("CUST:9", "EQ:99", Seq("EQ:99")),
      ("CUST:5", null, null)
    ).toDF("raw_id", "canonical_id", "equivalent_ids")
    val out = NodeNorm.normEquivOn(parsed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    ScratchCache.releaseAll()
    assert(out.toSeq == Seq(
      ("NORM:1", 3L, 3L, "CUST:1,CUST:2,CUST:3"),
      ("NORM:9", 1L, 1L, "CUST:9")))
  }

  test("normEquiv end-to-end: EquivNormService chains break at " +
      "failures (k%7) and block boundaries (k%8==7)") {
    val ids = (1 to 20).map(k => s"CUST:$k").toDF("raw_id")
    val failDir = java.nio.file.Files
      .createTempDirectory("graft_equivspec").toString + "/out"
    val parsed = NodeNorm.normalizeBatched(
      ids, "raw_id", 6, new NodeNorm.EquivNormService, failDir)
    val out = NodeNorm.normEquivOn(parsed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ScratchCache.releaseAll()
    // 7 and 14 fail; 15%8==7 has no forward link; 20 links to EQ:21
    assert(out.toSeq == Seq(
      ("NORM:1", 6L, 7L),   // 1..6 + EQ:1..7 (6's set names EQ:7)
      ("NORM:15", 1L, 1L),  // isolated: 14 failed, no forward link
      ("NORM:16", 5L, 6L),  // 16..20 + EQ:16..21
      ("NORM:8", 6L, 7L)))  // 8..13 + EQ:8..14 (14 failed)
  }
}
