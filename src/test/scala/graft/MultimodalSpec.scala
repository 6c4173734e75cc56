package graft

import graft.ops.{DedupSim, Multimodal, ScratchCache}

class MultimodalSpec extends GraftSuite {

  test("media table carries binary payloads with declared types") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getAs[Array[Byte]]("media").nonEmpty))
    assert(rows.map(_.getAs[String]("media_type")).toSet ==
      Set("image/png", "audio/wav", "video/mp4"))
  }

  test("png encode: payload is a real PNG (signature + IHDR)") {
    val b = Multimodal.pngBytes(42L)
    assert(b.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(new String(b.slice(12, 16), "US-ASCII") == "IHDR")
  }

  /** Closed-form expectations for the planted image of doc d. */
  private def planted(d: Long): (Int, Int, Long) = {
    val w = (8 + d % 8).toInt; val h = (8 + d % 5).toInt
    val sum = (0 until w * h).map(i => (d * 31 + i * 7) % 256).sum
    (w, h, sum)
  }

  test("png decode: encode→ImageIO-decode roundtrip recovers exact planted pixels") {
    val dec = new Multimodal.PngDecoder()
    for (d <- Seq(0L, 3L, 42L, 99L, 123456L)) {
      val (w, h, sum) = dec.decode(Multimodal.pngBytes(d))
      assert((w, h, sum) == planted(d), s"doc $d")
    }
    dec.dispose()
  }

  test("wav decode: encode→javax.sound-decode roundtrip recovers exact planted samples") {
    val dec = new Multimodal.WavDecoder()
    for (d <- Seq(1L, 4L, 43L, 100L, 123457L)) {
      val n = 64 + d % 64
      val expSum = (0L until n).map(i => ((d * 131 + i * 17) % 65536) - 32768).sum
      assert(dec.decode(Multimodal.wavBytes(d)) == ((n, expSum)), s"doc $d")
    }
  }

  test("decode aggregate: all three modalities report really-decoded " +
      "quantities matching the closed forms") {
    import org.apache.spark.sql.functions.col
    val byType = Multimodal.decode(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // video (r12 — real container decode): total_bytes = decoded
    // raster bytes = n_frames x 64, checksum = closed-form pixel sums
    val vidDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id").collect().map(_.getLong(0))
    val (expVidBytes, expVidSum) = vidDocs.foldLeft((0L, 0L)) {
      case ((b, s), d) =>
        val n = (4 + d % 5).toInt
        val ps = (0 until n).map { f =>
          val step = if ((f / 3) % 2 == 0) 7 else 1
          (0 until 64).map(i => (d * 31 + f + i * step) % 256).sum
        }.sum
        (b + n * 64L, s + ps)
    }
    assert(byType("video/mp4") == ((expVidBytes, expVidSum)))
    // audio/wav: decoded PCM bytes = 2 × closed-form sample counts
    val wavDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1)
      .select("doc_id").collect().map(_.getLong(0))
    val expWav = wavDocs.map(d => (64 + d % 64) * 2).sum
    assert(byType("audio/wav")._1 == expWav)
    // image/png: decoded raster bytes + pixel sums match the closed form
    val imgDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    val (expBytes, expSum) = imgDocs.foldLeft((0L, 0L)) { case ((b, s), d) =>
      val (w, h, ps) = planted(d); (b + w.toLong * h, s + ps)
    }
    assert(byType("image/png") == ((expBytes, expSum)))
  }

  test("feature histogram: bins sum to total payload bytes") {
    import org.apache.spark.sql.functions.{col, sum}
    val rows = Multimodal.features(spark, sf)
    assert(rows.count() == 3 * 16) // 3 media types x 16 bins, even empty
    val histTotal = rows.agg(sum(col("n"))).first().getLong(0)
    val byteTotal = Multimodal.meta(spark, sf)
      .agg(sum(col("total_bytes"))).first().getLong(0)
    assert(histTotal == byteTotal)
  }

  test("audio windows: decoded 16-frame windows match the closed form") {
    import org.apache.spark.sql.functions.col
    // doc 1 (audio: 1 % 3 == 1): n = 64 + 1 = 65 samples -> windows of
    // 16,16,16,16 and a 1-frame tail; recompute energy/peak directly
    // from the sample formula and compare against the decoded path
    val rows = Multimodal.audioWindows(spark, sf)
      .filter(col("doc_id") === 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def smp(i: Int): Long = ((1L * 131 + i * 17) % 65536) - 32768
    val expected = (0 until 65).map(i => (i / 16, smp(i)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (w, ss) =>
        (w.toLong, ss.size.toLong,
          ss.map(t => t._2 * t._2).sum, ss.map(t => math.abs(t._2)).max)
      }
    assert(rows.toSeq.sortBy(_._1) == expected)
    assert(rows.map(_._2).sum == 65L)
  }

  test("phash: planted identical + noisy-twin images pair up with " +
      "hand-computed Hamming distances") {
    import spark.implicits._
    // doc 0 and doc 3840 render IDENTICAL images (3840·31 ≡ 0 mod 256,
    // same dims mod 8/mod 5); both are %30==0 so both get one-pixel
    // bumped twins. doc 6 is an unrelated image. Hand computation for
    // base pattern 7i mod 256 (w=h=8, so the 8×8 sample grid IS the
    // pixel grid): mean=112; the bump lifts pixel0 0→128 and the mean
    // to 114; no other value lands in (112,114], so exactly ONE bit
    // flips → Hamming(base, twin)=1.
    val docs = Seq(0L, 3840L, 6L).toDF("doc_id")
    val out = Multimodal.phashOn(spark, docs, thr = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(out.toSeq == Seq(
      (0L, 3840L, 0L), (0L, 10000000L, 1L), (0L, 10003840L, 1L),
      (3840L, 10000000L, 1L), (3840L, 10003840L, 1L),
      (10000000L, 10003840L, 0L)))
  }

  test("phash cluster: the planted 4-clique collapses to one survivor") {
    import spark.implicits._
    // images {0, 3840, twin(0)=10000000, twin(3840)=10003840} pair up
    // pairwise (the phash fixture above) -> one CC cluster, min id 0
    // survives; image 6 stays unclustered
    val docs = Seq(0L, 3840L, 6L).toDF("doc_id")
    val out = Multimodal.phashClusterOn(spark, docs, thr = 6).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_images") == 5L)
    assert(r.getAs[Long]("n_in_dup_clusters") == 4L)
    assert(r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Long]("n_removed") == 3L)
    assert(r.getAs[Long]("n_kept") == 2L)
  }

  test("phash incremental admission: equals the from-scratch banded " +
      "Hamming dedup, idempotent re-ingest, plan reads the band index") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // history: docs 0 and 3840 render identical images; 6/21/42 differ.
    // batch planting: 0,3840 verbatim (+1e6) and bumped (+2e6);
    // 0,21,42 stride-13 new images twice (+3e6/+4e6)
    val histIds = Seq(0L, 3840L, 6L, 21L, 42L)
    val dec = new Multimodal.PngDecoder()
    val hist = histIds.flatMap(b =>
      Multimodal.phashBandRows(dec, b, Multimodal.pngBytes(b)))
    val batchRows = histIds.flatMap { base =>
      val a = if (base % 12 == 0)
        Seq((base + 1000000L, Multimodal.pngBytes(base))) else Seq()
      val b = if (base % 30 == 0)
        Seq((base + 2000000L, Multimodal.pngBytes(base, bumpFirst = true)))
        else Seq()
      val c = if (base % 21 == 0)
        Seq((base + 3000000L, Multimodal.pngBytesNew(base)),
          (base + 4000000L, Multimodal.pngBytesNew(base))) else Seq()
      a ++ b ++ c
    }
    val batch = batchRows.flatMap { case (id, bytes) =>
      Multimodal.phashBandRows(dec, id, bytes) }
    dec.dispose()
    // FROM-SCRATCH TWIN: candidate = any shared 16-bit band (the LSH
    // recall contract), dup = candidate with full Hamming <= 6;
    // precedence dup_index > dup_batch (smaller img_id) > kept
    val bandMap = (hist ++ batch).groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toArray }
    def pairDup(a: Long, b: Long): Boolean =
      (0 until 4).exists(k => bandMap(a)(k) == bandMap(b)(k)) &&
        (0 until 4).map(k =>
          java.lang.Long.bitCount(bandMap(a)(k) ^ bandMap(b)(k))).sum <= 6
    val batchIds = batchRows.map(_._1).sorted
    val expected = batchIds.map { id =>
      val withHist = histIds.exists(h => pairDup(id, h))
      val withSmaller = batchIds.exists(o => o < id && pairDup(o, id))
      id -> (if (withHist) "dup_index"
        else if (withSmaller) "dup_batch" else "kept")
    }
    val got = Multimodal.phashIncrAdmit(
        batch.toDF("img_id", "band", "bv"),
        hist.toDF("img_id", "band", "bv"), thr = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    ScratchCache.releaseAll()
    assert(got == expected, s"got $got\nexpected $expected")
    // every decision branch is exercised by the fixture
    assert(got.map(_._2).toSet == Set("dup_index", "dup_batch", "kept"))
    // idempotent re-ingest: index grown with the kept images makes the
    // whole batch dup_index
    val keptIds = got.filter(_._2 == "kept").map(_._1).toSet
    val again = Multimodal.phashIncrAdmit(
        batch.toDF("img_id", "band", "bv"),
        (hist ++ batch.filter(r => keptIds(r._1)))
          .toDF("img_id", "band", "bv"), thr = 6)
      .collect().map(_.getString(1)).toSet
    ScratchCache.releaseAll()
    assert(again == Set("dup_index"), again.toString)
    // and the REAL key's admission plan reads the bucketed band index,
    // never re-decodes history
    val d = sf
    Multimodal.phashIncr(spark, d).collect() // builds the index
    ScratchCache.releaseAll()
    val idxT = DedupSim.indexPrefix("graft_phash_idx", d) +
      DedupSim.datasetFingerprint(spark, s"$d/documents.parquet")
    val plan = Multimodal.phashIncrAdmit(
        Multimodal.phashIncrBatchBands(spark, Tables.documents(spark, d)),
        spark.table(idxT), thr = 6)
      .queryExecution.executedPlan.toString
    ScratchCache.releaseAll()
    assert(plan.contains("graft_phash_idx"),
      "admission plan must scan the standing band index table")
  }

  test("audio fingerprint: real-decode fingerprints equal the closed " +
      "form and planted noisy twins land in duplicate groups") {
    import spark.implicits._
    // independent reference: closed-form samples (never decoded),
    // 8-frame window energies, delta-sign bits
    def refFp(base: Long, bump: Boolean): (Long, Long) = {
      val n = (64 + base % 64).toInt
      val samples = (0 until n).map { i =>
        val b = if (bump && i == 0) 17 else 0
        ((base * 131 + i * 17 + b) % 65536) - 32768
      }
      val en = samples.grouped(8).map(w => w.map(s => s * s).sum).toArray
      var fp = 0L
      for (w <- 0 until en.length - 1 if en(w + 1) > en(w))
        fp |= 1L << w
      (n.toLong, fp)
    }
    // audio ids 1, 31, 61 (all %30==1 -> twinned) and 4 (untwinned)
    val docs = Seq(1L, 31L, 61L, 4L).toDF("doc_id")
    val clips = Seq(1L, 31L, 61L, 4L).map(b => b -> refFp(b, bump = false)) ++
      Seq(1L, 31L, 61L).map(b => (b + 10000000L) -> refFp(b, bump = true))
    val expected = clips.groupBy(_._2).collect {
      case ((n, fp), xs) if xs.length >= 2 => (n, fp, xs.length.toLong)
    }.toSeq.sorted
    val got = Multimodal.audioFingerprintOn(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expected, s"got=$got expected=$expected")
    // the robustness claim: the energy-sign fingerprint absorbed the
    // sample-0 bump for all three twins -> three groups of two
    assert(got.length == 3 && got.forall(_._3 == 2L))
  }

  test("video scenes: real PNG container decode lands on the " +
      "closed-form histogram arithmetic (oracle twin)") {
    import spark.implicits._
    // ids cover every n_frames in 4..8 (doc_id%5 = 0..4), so both the
    // 1-boundary (n<=6) and 2-boundary (n=7,8) shot layouts occur
    val ids = Seq(2L, 5L, 8L, 11L, 14L)
    val docs = ids.map(id => (id, "unused", s"s${id % 2}"))
      .toDF("doc_id", "text", "source")
    // independent replay of the closed-form pixel function — histogram
    // -> L1 -> cuts, NO codec (exactly what the DuckDB oracle does)
    def expectedCuts(docId: Long): (Long, Long) = {
      val n = (4 + docId % 5).toInt
      val hists = (0 until n).map { f =>
        val step = if ((f / 3) % 2 == 0) 7 else 1
        val h = new Array[Int](16)
        (0 until 64).foreach { i =>
          h((((docId * 31 + f + i * step) % 256) >> 4).toInt) += 1
        }
        h
      }
      val cuts = (0 until n - 1).count { f =>
        (0 until 16).map(b => math.abs(hists(f)(b) - hists(f + 1)(b))).sum > 24
      }
      (n.toLong, cuts.toLong)
    }
    val exp = ids.filter(_ % 3 == 2).map(id => (id, expectedCuts(id)))
    val expBySrc = exp.groupBy { case (id, _) => s"s${id % 2}" }
      .map { case (src, rows) =>
        src -> ((rows.size.toLong, rows.map(_._2._1).sum,
          rows.map(_._2._2).sum, rows.map(_._2._2).max))
      }
    val out = Multimodal.videoScenesOn(spark, docs, thr = 24).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_videos"),
        r.getAs[Long]("total_frames"), r.getAs[Long]("total_cuts"),
        r.getAs[Long]("max_cuts")))).toMap
    assert(out == expBySrc, s"got $out expected $expBySrc")
    // shot boundaries must actually register: every video here has
    // >= 4 frames so >= 1 step-change boundary -> >= 1 cut each
    assert(exp.forall(_._2._2 >= 1L), exp.toString)
    // and the container parse is real: frame slices are each a
    // standalone decodable PNG with the declared 8x8 geometry
    val frames = Multimodal.splitPngFrames(Multimodal.videoBytes(14L))
    assert(frames.length == 8) // 4 + 14%5
    val dec = new Multimodal.PngDecoder()
    frames.foreach { fb =>
      val img = dec.decodeImage(fb)
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
  }

  test("png container parse rejects truncated / corrupt payloads with " +
      "the named diagnostic, never an index error") {
    val good = Multimodal.videoBytes(14L)
    // truncated mid-chunk: the walk must fail the bounds require, not AIOOBE
    val trunc = java.util.Arrays.copyOfRange(good, 0, good.length - 6)
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.splitPngFrames(trunc)
    }
    assert(e1.getMessage.contains("not a PNG frame"))
    // corrupt length field: 0xFFFFFFFF is negative as be32 -> must not
    // walk backward into an infinite loop
    val corrupt = good.clone()
    corrupt(8) = 0xff.toByte; corrupt(9) = 0xff.toByte
    corrupt(10) = 0xff.toByte; corrupt(11) = 0xff.toByte
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.splitPngFrames(corrupt)
    }
    assert(e2.getMessage.contains("not a PNG frame"))
  }

  test("frame sampling keeps every 4th frame only") {
    import org.apache.spark.sql.functions.sum
    val sampled = Multimodal.frameSample(spark, sf)
      .agg(sum("n_sampled_frames")).first().getLong(0)
    // every doc has ceil(nb/64) frames; sampled = ceil(frames/4) per doc
    val expected = Multimodal.mediaTable(spark, sf)
      .selectExpr("cast(ceil(ceil(length(media) / 64.0) / 4.0) as long) as k")
      .agg(sum("k")).first().getLong(0)
    assert(sampled == expected)
  }
}
