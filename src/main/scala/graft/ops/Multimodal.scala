package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column surface (north star: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as batched partition-level transforms).
  *
  * The testdata has no real media files, so payloads are synthesized —
  * but every decode is REAL (r12: zero stub decodes left): image/png
  * rows carry a REAL PNG — deterministic grayscale pixels derived from
  * doc_id, encoded with the pure-JVM javax.imageio codec — and
  * q_mm_decode REALLY decodes it (PNG signature/IHDR parse, IDAT
  * inflate, filter reconstruction → pixels) through a
  * once-per-partition ImageReader. audio/wav rows carry a REAL
  * RIFF/WAVE PCM file (hand-written canonical header + closed-form
  * 16-bit samples) really decoded through the pure-JVM
  * javax.sound.sampled codec. video rows carry a REAL
  * concatenated-PNG frame container ([[videoBytes]]) parsed by chunk
  * structure and frame-decoded through the same PNG codec. The binary
  * column type, the metadata struct schema, the mapPartitions batching
  * shape (one decoder init per partition, the Scala analogue of a
  * Pandas-UDF batch), frame slicing and sampling on binary columns are
  * the same plumbing a production codec (ffmpeg et al.) drops into.
  *
  * q_mm_meta/q_mm_features/q_mm_frame_sample keep the text-derived
  * payload for ALL rows: their wire outputs aggregate ENCODED byte
  * lengths/histograms, and a compressed PNG's byte stream is
  * deflate-implementation-dependent — not recomputable by the DuckDB
  * oracle. The decode key avoids that by reporting DECODED quantities
  * (pixel counts and pixel sums), which are codec-independent.
  *
  * Scale notes: binary payloads ride the same columnar parquet path as
  * any column (with `maxPartitionBytes` keeping splits bounded); decode
  * is embarrassingly parallel per partition with zero shuffle; metadata
  * extraction pushes column pruning down so a metadata-only query never
  * reads the payload bytes if stored as a separate column/file.
  */
object Multimodal {

  /** The typed media row produced by [[decodePartition]]. */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    magic: String, checksum: Long)

  /** Documents with a synthetic binary `media` column + declared type.
    * (Deterministic stand-in for read-binary-files ingestion.) */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        col("source"))

  /** Deterministic tiny grayscale PNG for a doc: w = 8 + doc_id%8,
    * h = 8 + doc_id%5, row-major pixel i = (doc_id*31 + i*7) mod 256.
    * Encoded with javax.imageio's pure-JVM PNG writer (no native
    * codec). The pixel function is closed-form so the DuckDB oracle can
    * recompute decoded sums without ever seeing the compressed bytes. */
  private[graft] def pngBytes(docId: Long): Array[Byte] =
    pngBytes(docId, bumpFirst = false)

  /** As [[pngBytes]], optionally with pixel 0 bumped by +128 mod 256 —
    * the deterministic "noisy twin" [[phash]] plants to exercise
    * near-duplicate (not byte-identical) image pairs. */
  private[graft] def pngBytes(docId: Long, bumpFirst: Boolean): Array[Byte] = {
    val w = (8 + docId % 8).toInt
    val h = (8 + docId % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bump = if (bumpFirst && i == 0) 128 else 0
        raster.setSample(x, y, 0,
          (((docId * 31 + i * 7) % 256 + bump) % 256).toInt)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL per-partition PNG decoder: one javax.imageio ImageReader
    * instance reused across the partition's rows (the once-per-
    * partition init every codec needs). Returns (width, height,
    * sum-of-gray-samples) from the actually-decoded raster — signature
    * parse, IDAT inflate and filter reconstruction all really run. */
  private[graft] final class PngDecoder {
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    /** The fully decoded image (signature parse, IDAT inflate, filter
      * reconstruction) — the raster consumers like [[phash]] sample. */
    def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(in, true, true)
        reader.read(0)
      } finally in.close()
    }

    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val img = decodeImage(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum)
    }
    def dispose(): Unit = reader.dispose()
  }

  /** Deterministic tiny RIFF/WAVE PCM file for a doc: mono 16-bit LE at
    * 8 kHz, n = 64 + doc_id%64 samples, sample i = ((doc_id·131 + i·17)
    * mod 65536) − 32768. The canonical 44-byte PCM header is written by
    * hand (bit-stable); the sample function is closed-form INTEGER so
    * the DuckDB oracle recomputes decoded sums without parsing RIFF. */
  private[graft] def wavBytes(docId: Long): Array[Byte] =
    wavBytes(docId, bumpFirst = false)

  /** As [[wavBytes]], optionally with sample 0 bumped by +17 inside
    * the mod — the deterministic "noisy twin" [[audioFingerprint]]
    * plants to exercise near-identical (not byte-identical) clips. */
  private[graft] def wavBytes(docId: Long, bumpFirst: Boolean): Array[Byte] = {
    val n = (64 + docId % 64).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000).putInt(8000 * 2) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val bump = if (bumpFirst && i == 0) 17 else 0
      bb.putShort(
        (((docId * 131 + i * 17 + bump) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL per-partition WAV decoder via the pure-JVM
    * javax.sound.sampled codec: RIFF/fmt chunk parsing and PCM frame
    * extraction actually run (AudioSystem needs no audio device to READ
    * a stream — headless-safe). Returns (n_frames, sum of signed 16-bit
    * samples) from the decoded frames. */
  private[graft] final class WavDecoder {
    /** The decoded signed 16-bit sample stream (RIFF parse + PCM frame
      * extraction through javax.sound — the real codec path). */
    def decodeSamples(bytes: Array[Byte]): Array[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected WAV format $fmt")
        val pcm = in.readAllBytes()
        val out = new Array[Int](pcm.length / 2)
        var i = 0
        while (i + 1 < pcm.length) {
          out(i / 2) = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toInt
          i += 2
        }
        out
      } finally in.close()
    }

    def decode(bytes: Array[Byte]): (Long, Long) = {
      val s = decodeSamples(bytes)
      var sum = 0L
      var i = 0
      while (i < s.length) { sum += s(i); i += 1 }
      (s.length.toLong, sum)
    }
  }

  /** q_mm_decode — partition-batched decode: mapPartitions with one
    * decoder init per partition, aggregated per media type. ALL THREE
    * modalities are REALLY decoded (r12 — the video stub is gone):
    * image/png through [[PngDecoder]] (n_bytes = decoded raster bytes
    * w·h at 8-bit gray, checksum = sum of decoded pixels), audio/wav
    * through [[WavDecoder]] (RIFF parse + PCM extraction), video
    * through the concatenated-PNG container parse + per-frame decode
    * ([[splitPngFrames]]/[[videoBytes]] — n_bytes = total decoded
    * raster bytes across frames, checksum = sum of decoded frame
    * pixels). The ingestion step swaps in the real encoded payloads;
    * every path is deterministic and codec-independent on the wire, so
    * the whole aggregate IS oracle-checked (the oracle recomputes all
    * three checksums from the closed-form pixel/sample functions). */
  def decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Par.spread(mediaTable(s, d), col("doc_id"))
      .select(col("doc_id"), col("media_type"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // ingestion stand-in (no media files in the container): every
        // row gets its real encoded payload; one encoder context per
        // partition
        rows.map { case (id, mt) =>
          if (mt == "image/png") (id, mt, pngBytes(id))
          else if (mt == "audio/wav") (id, mt, wavBytes(id))
          else (id, mt, videoBytes(id))
        }
      }
    val decoded = src.mapPartitions { rows =>
      val png = new PngDecoder() // one decoder init per partition
      val wav = new WavDecoder()
      rows.map { case (id, mt, bytes) =>
        val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
        if (mt == "image/png") {
          val (w, h, pixSum) = png.decode(bytes)
          MediaMeta(id, mt, w.toLong * h, magic, pixSum)
        } else if (mt == "audio/wav") {
          val (nFrames, sampleSum) = wav.decode(bytes)
          MediaMeta(id, mt, nFrames * 2, magic, sampleSum)
        } else {
          var rasterBytes = 0L
          var pixSum = 0L
          splitPngFrames(bytes).foreach { fb =>
            val (w, h, s) = png.decode(fb)
            rasterBytes += w.toLong * h
            pixSum += s
          }
          MediaMeta(id, mt, rasterBytes, magic, pixSum)
        }
      }
    }
    decoded.toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum")).as("total_checksum"))
      .orderBy(col("media_type"))
  }

  /** q_mm_audio_window — WINDOWED feature extraction over the REALLY
    * decoded audio stream: each audio/wav payload is decoded through
    * the javax.sound codec ([[WavDecoder.decodeSamples]] — RIFF parse
    * + PCM frame extraction actually run), the signed 16-bit sample
    * stream is split into 16-frame windows, and each window reports
    * frame count, ENERGY (Σ s² — the integer-exact form of windowed
    * RMS) and PEAK (max |s|) — the silence-trim / loudness-normalize
    * primitives an audio training-data pipeline runs per clip. All
    * features are integer-exact, and the synthetic samples are
    * closed-form, so DuckDB recomputes every window without parsing
    * RIFF — the decode path is verified against arithmetic it never
    * executes.
    *
    * Scale shape: decode is partition-local (one codec context per
    * partition, zero shuffle); windowing is a row-local flatMap on the
    * decoded array, so the only shuffle is the final detail-row sort.
    * A real corpus swaps wavBytes for the stored payload column;
    * nothing else changes. */
  def audioWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = mediaTable(s, d)
      .filter(col("media_type") === "audio/wav")
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      val wav = new WavDecoder() // one codec context per partition
      it.flatMap { id =>
        val samples = wav.decodeSamples(wavBytes(id))
        samples.grouped(16).zipWithIndex.map { case (w, wi) =>
          var energy = 0L
          var peak = 0L
          var j = 0
          while (j < w.length) {
            val v = w(j).toLong
            energy += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            j += 1
          }
          (id, wi.toLong, w.length.toLong, energy, peak)
        }
      }
    }.toDF("doc_id", "win", "n_frames", "energy", "peak")
      .orderBy(col("doc_id"), col("win"))
  }

  /** q_mm_meta — metadata-only query: typed metadata (length, declared
    * type) without decoding. Column pruning means the payload column
    * never leaves the scan in a real split-column layout. */
  def meta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("source"), col("media_type"),
        length(col("media")).cast("long").as("n_bytes"))
      .groupBy(col("source"), col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("source"), col("media_type"))

  /** q_mm_features — batched feature extraction: binary payload → a
    * fixed-length numeric vector per item, the plumbing every
    * embedding/feature model needs (one extractor init per partition,
    * batch in, vectors out). ===== STUB ===== the "model" is a 16-bin
    * byte histogram — deterministic and oracle-checkable; a real
    * deployment swaps `featureStub` for a codec+model call with the
    * identical batching shape. Output explodes the vector to
    * (media_type, bin, n) rows so the wire format stays
    * comparator-friendly (no array columns). */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def featureStub(bytes: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
      hist
    }
    val src = mediaTable(s, d)
      .select(col("media_type"), col("media"))
      .as[(String, Array[Byte])]
    val feats = src.mapPartitions { rows =>
      // one extractor/model init per partition would go here
      rows.map { case (mt, bytes) => (mt, featureStub(bytes)) }
    }
    feats.toDF("media_type", "hist")
      .select(col("media_type"), posexplode(col("hist")))
      .groupBy(col("media_type"), col("pos").as("bin"))
      .agg(sum(col("col")).as("n"))
      .orderBy(col("media_type"), col("bin"))
  }

  /** q_mm_frame_sample — frame sampling plumbing: treat the binary as
    * fixed-64-byte frames, keep every 4th frame, count sampled frames
    * and bytes per media type. substr on binary columns — the real
    * video case swaps the fixed stride for codec frame boundaries. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frameSize = 64
    val stride = 4
    mediaTable(s, d)
      .withColumn("n_frames",
        ceil(length(col("media")).cast("double") / frameSize).cast("long"))
      .filter(col("n_frames") > 0) // sequence(0,-1) would run backwards
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1)))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame",
        expr(s"substring(media, cast(frame_idx * $frameSize + 1 as int), $frameSize)"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_sampled_frames"),
        sum(length(col("frame"))).cast("long").as("sampled_bytes"))
      .orderBy(col("media_type"))
  }

  /** q_mm_phash — perceptual-hash IMAGE dedup, the first cross-modal
    * member of the §2.9 dedup family: every image/png payload is REALLY
    * decoded (PNG signature parse, IDAT inflate, filter reconstruction
    * through [[PngDecoder]]), 8×8 nearest-sampled into an average-hash
    * (bit = sample > integer mean — the classic aHash), and pairs
    * within Hamming ≤ thr are found by the SAME banded-LSH shape as
    * [[DedupSim]]'s SimHash: the 64 bits split into four 16-bit bands,
    * candidates = images sharing ANY band value (pigeonhole: distance
    * ≤ 3 is guaranteed a shared band; larger distances are LSH-
    * recalled), then an exact popcount(XOR) verify. Near-duplicate
    * pairs are PLANTED: every doc_id%30==0 image gets a one-pixel-
    * bumped twin at id+10,000,000 — near-identical but not
    * byte-identical, exactly what byte-level exact dedup cannot catch.
    *
    * Oracle discipline: the synthetic pixel function is closed-form,
    * so DuckDB recomputes sample grid → mean → bits → bands → band
    * join → Hamming from pure arithmetic — the REAL codec path is
    * verified against arithmetic the oracle never decodes (same
    * pattern as q_mm_decode/q_mm_audio_window).
    *
    * Scale shape: decode + hashing are partition-local (one codec
    * context per partition, zero shuffle; only 4 band rows per image
    * ever shuffle — payload bytes never do). The band self-join is the
    * banded candidate join (never all-pairs); the verify joins carry
    * (id, band, value) longs only. At 100 TB of images the hash table
    * is ~fifty bytes a row — the standard phash-dedup decomposition. */
  def phash(s: SparkSession, d: String): DataFrame =
    phashOn(s, Tables.documents(s, d), thr = 6)

  /** Core of q_mm_phash over any documents-shaped frame: returns the
    * (a, b, hamming) near-duplicate image pair ledger.
    *
    * Candidate generation runs on DISTINCT 64-bit signatures, not
    * images (r16, the measured gsf1 scale fix): a synthetic/crawled
    * corpus is dense in byte-different images with IDENTICAL aHashes
    * (measured ~1,458 images on one signature at gen-sf1), so the
    * image-level banded join enumerated ~1M candidate pairs per hot
    * (band, bv) bucket — quadratic in the identical-signature group
    * size. Collapsing first means the banded join, Hamming verify and
    * LSH recall all run once per DISTINCT signature (rep = min
    * img_id), shrinking join volume by ~|group|² per hot signature;
    * the ledger is then EXPANDED back through group membership —
    * within-group pairs at Hamming 0 (via the same [[DedupSim
    * .bucketPairs]] block grid, so a hot group's own C(n,2) output
    * never lands on one reducer) and cross-group pairs carrying the
    * rep pair's exact distance (a signature determines the hash, so
    * every member pair inherits it). The pair SET and distances are
    * identical to the image-level join — two images share a band iff
    * their signatures do — so the ledger and the DuckDB oracle are
    * byte-identical. */
  def phashOn(s: SparkSession, docsDf: DataFrame, thr: Int): DataFrame = {
    import s.implicits._
    val baseIds = docsDf.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
    val sigRows = baseIds.mapPartitions { it =>
      val png = new PngDecoder() // one codec context per partition
      it.flatMap { base =>
        val variants =
          if (base % 30 == 0) Seq((base, false), (base + 10000000L, true))
          else Seq((base, false))
        variants.map { case (imgId, bumped) =>
          (imgId, phashSig(png, pngBytes(base, bumped)))
        }
      }
    }.toDF("img_id", "sig")
    val sigs = ScratchCache.cache(sigRows)
    val verified = phashSigPairs(s, sigs, thr)
    // EXPAND back to the image-pair ledger. Within-group: every pair
    // of images sharing a signature is a Hamming-0 duplicate; the
    // block grid spreads a hot group's pair grid across min(16,
    // ⌈n/64⌉)² reducers (output-volume work only — the quadratic is
    // the ledger contract itself, not join overhead). Cross-group:
    // members of verified signature pairs inherit the rep distance.
    // dedup=false: each image emits exactly ONE (band, sig) bucket row
    // and the grid meets every pair on one key, so the pair stream has
    // no duplicates to drop — skipping distinct() saves a shuffle of
    // the op's largest stream (the within-group ledger expansion)
    val within = DedupSim.bucketPairs(
        sigs.select(lit(0).as("band"), col("sig").as("bh"),
          col("img_id").as("doc_id")), cap = 64, dedup = false)
      .select(col("a"), col("b"), lit(0L).as("hamming"))
    val cross = sigs.select(col("img_id").as("u"), col("sig").as("sa"))
      .join(verified, "sa")
      .join(sigs.select(col("img_id").as("v"), col("sig").as("sb")), "sb")
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"), col("hamming"))
    within.unionByName(cross).orderBy(col("a"), col("b"))
  }

  /** Verified near-duplicate SIGNATURE pairs (sa, sb, hamming ≤ thr,
    * sa ≠ sb): the distinct-signature core shared by [[phashOn]] and
    * [[phashClusterOn]]. One representative (min img_id) per distinct
    * signature enters the banded candidate join — the four 16-bit
    * bands are recovered by shifting the signature, so recall is
    * EXACTLY the image-level LSH's (pigeonhole ≤ 3 guaranteed; larger
    * distances recalled iff a band collides, a property of the
    * signatures alone) — then the full 64-bit popcount verifies each
    * rep pair once. */
  private def phashSigPairs(s: SparkSession, sigs: DataFrame,
      thr: Int): DataFrame = {
    val groups = sigs.groupBy(col("sig"))
      .agg(min(col("img_id")).as("rep"))
    val repBands = groups
      .select(col("rep").as("doc_id"), col("sig"),
        explode(expr("sequence(0, 3)")).as("band"))
      .select(col("band"),
        expr("shiftright(sig, band * 16) & 65535").as("bh"),
        col("doc_id"))
    val gA = groups.select(col("rep").as("a"), col("sig").as("sa"))
    val gB = groups.select(col("rep").as("b"), col("sig").as("sb"))
    DedupSim.bucketPairs(repBands, cap = 64)
      .join(gA, "a").join(gB, "b")
      .withColumn("hamming", expr("cast(bit_count(sa ^ sb) as bigint)"))
      .filter(col("hamming") <= thr)
      .select(col("sa"), col("sb"), col("hamming"))
  }

  /** A second deterministic PNG family for [[phashIncr]]'s
    * genuinely-new batch images: same dims as [[pngBytes]] but pixel
    * stride 13 (i·13 instead of i·7) — closed-form for the oracle,
    * visually unrelated to every stride-7 corpus image (the stride-7
    * family repeats with base mod 1280, so at sf ≥ 0.01 EVERY stride-7
    * image already exists in history — a "new" image must leave the
    * family). */
  private[graft] def pngBytesNew(docId: Long): Array[Byte] = {
    val w = (8 + docId % 8).toInt
    val h = (8 + docId % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId * 31 + i * 13) % 256).toInt)
        i += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode one image into its full 64-bit aHash signature (the four
    * 16-bit bands packed little-endian: band k at bits [16k, 16k+16)).
    * [[phashOn]]'s distinct-signature collapse keys on this. */
  private[graft] def phashSig(png: PngDecoder,
      bytes: Array[Byte]): Long = {
    val bv = phashBands(png, bytes)
    (bv(3) << 48) | (bv(2) << 32) | (bv(1) << 16) | bv(0)
  }

  /** Decode one image and emit its four 16-bit aHash band rows —
    * the grid/mean/bit pipeline factored for reuse by the
    * standing-index build and the batch admission. */
  private[graft] def phashBandRows(png: PngDecoder, imgId: Long,
      bytes: Array[Byte]): Seq[(Long, Int, Long)] = {
    val bv = phashBands(png, bytes)
    (0 until 4).map(k => (imgId, k, bv(k)))
  }

  /** The aHash core: decode, 8×8 nearest-sample, threshold on the
    * integer mean, split into four 16-bit band values. */
  private def phashBands(png: PngDecoder,
      bytes: Array[Byte]): Array[Long] = {
    val img = png.decodeImage(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val sampled = new Array[Int](64)
    var idx = 0
    var sum = 0
    while (idx < 64) {
      val cx = idx % 8
      val cy = idx / 8
      sampled(idx) = raster.getSample(cx * w / 8, cy * h / 8, 0)
      sum += sampled(idx)
      idx += 1
    }
    val mean = sum / 64
    val bv = new Array[Long](4)
    idx = 0
    while (idx < 64) {
      if (sampled(idx) > mean) bv(idx / 16) |= 1L << (idx % 16)
      idx += 1
    }
    bv
  }

  /** q_mm_phash_incr — STANDING-INDEX incremental IMAGE admission
    * (r15): the MULTIMODAL member of the incremental-admission family
    * (exact [[DedupSim.dedupIncr]] / near [[DedupSim.dedupIncrNear]] /
    * semantic [[DedupSim.dedupIncrSemantic]] / image THIS) — the daily
    * contract of an image-ingest pipeline: newly crawled images are
    * admitted against the corpus-so-far WITHOUT re-decoding a single
    * history byte. The standing index is the corpus's four 16-bit
    * aHash band rows (img_id, band, bv) — ~50 bytes/image, built ONCE
    * from really-decoded pixels ([[PngDecoder]]) and persisted
    * `bucketBy(8, bv)` (the dedupIncrNear write discipline), freshness
    * probed by [[DedupSim.datasetFingerprint]]'s filesystem LIST with
    * stale-fingerprint tables dropped on rebuild. Admitting a batch:
    * decode + hash the BATCH ONLY (partition-local), probe band
    * collisions against the index, verify FULL 64-bit Hamming ≤ 6 on
    * the four band rows (pigeonhole: distance ≤ 3 is recall-guaranteed
    * a shared band), plus within-batch pairs under the same rule.
    * Wire: the per-image ADMISSION LEDGER (img_id, decision) with
    * decision ∈ kept / dup_index (precedence) / dup_batch
    * (smaller-img_id batch partner).
    *
    * The batch is PLANTED deterministically: base images ≡0 (mod 12)
    * re-enter VERBATIM (+1e6 → Hamming 0, dup_index); ≡0 (mod 30)
    * re-enter one-pixel-BUMPED (+2e6 — the q_mm_phash noisy twin,
    * small Hamming, dup_index: the near-dup byte-level dedup cannot
    * see); ≡0 (mod 21) enter as a genuinely NEW stride-13 image
    * ([[pngBytesNew]]) TWICE (+3e6 kept, +4e6 dup_batch).
    *
    * FULLY ORACLE-CHECKED (unlike the near/semantic members): the
    * pixel functions are closed-form, so DuckDB replays grid → mean →
    * bits → bands → collisions → Hamming → precedence for history,
    * batch and ledger from pure integer arithmetic — the real codec
    * path must land on identical decisions.
    *
    * Scale shape: history pixels are decoded exactly once EVER (index
    * build); admission = one batch-sized decode (partition-local, zero
    * payload shuffle — only (id, band, bv) longs move) + one join
    * against the pre-bucketed band index + two bounded Hamming
    * verifies; N batches cost N batch-sized probes, zero history
    * re-decodes. */
  def phashIncr(s: SparkSession, d: String): DataFrame = {
    val pfx = DedupSim.indexPrefix("graft_phash_idx", d)
    val idxT = pfx + DedupSim.datasetFingerprint(s, s"$d/documents.parquet")
    if (!s.catalog.tableExists(idxT)) {
      Tables.refresh(s, d, "documents") // see dedupIncr (ADVICE r15)
      DedupSim.dropStaleIndexes(s, pfx, idxT)
      import s.implicits._
      val baseIds = Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id")).as[Long]
      baseIds.mapPartitions { it =>
        val png = new PngDecoder() // one codec context per partition
        it.flatMap(base => phashBandRows(png, base, pngBytes(base)))
      }.toDF("img_id", "band", "bv")
        .write.mode("overwrite")
        .bucketBy(8, "bv").sortBy("bv")
        .option("path", java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), idxT).toString)
        .format("parquet").saveAsTable(idxT)
    }
    phashIncrAdmit(phashIncrBatchBands(s, Tables.documents(s, d)),
      s.table(idxT), thr = 6)
  }

  /** The planted incoming batch's band rows over any documents-shaped
    * frame: verbatim re-entries (base ≡0 mod 12, +1e6), bumped twins
    * (≡0 mod 30, +2e6), and a twice-submitted stride-13 new image
    * (≡0 mod 21, +3e6/+4e6). Decodes REAL bytes per variant. */
  private[graft] def phashIncrBatchBands(s: SparkSession,
      docsDf: DataFrame): DataFrame = {
    import s.implicits._
    val specs = docsDf.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .flatMap { base =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        if (base % 12 == 0) out += ((base + 1000000L, base, 0))
        if (base % 30 == 0) out += ((base + 2000000L, base, 1))
        if (base % 21 == 0) {
          out += ((base + 3000000L, base, 2))
          out += ((base + 4000000L, base, 2))
        }
        out.toSeq
      }
    specs.mapPartitions { it =>
      val png = new PngDecoder()
      it.flatMap { case (imgId, base, variant) =>
        val bytes = variant match {
          case 0 => pngBytes(base)
          case 1 => pngBytes(base, bumpFirst = true)
          case _ => pngBytesNew(base)
        }
        phashBandRows(png, imgId, bytes)
      }
    }.toDF("img_id", "band", "bv")
  }

  /** Admit a batch's band rows against the standing band index: band
    * collisions → full-Hamming ≤ thr verify, index side read ONLY from
    * the pre-bucketed table; within-batch pairs under the same rule.
    * Returns the (img_id, decision) ledger. */
  private[graft] def phashIncrAdmit(batchBands: DataFrame,
      idx: DataFrame, thr: Int): DataFrame = {
    val bb = ScratchCache.cache(batchBands)
    val candIdx = bb.as("x").join(idx.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv"))
      .select(col("x.img_id").as("a"), col("y.img_id").as("b"))
      .distinct()
    val dupIdx = candIdx
      .join(bb.as("ba"), col("a") === col("ba.img_id"))
      .join(idx.as("hb"), col("b") === col("hb.img_id") &&
        col("ba.band") === col("hb.band"))
      .groupBy(col("a"), col("b"))
      .agg(sum(expr("bit_count(ba.bv ^ hb.bv)")).as("hamming"))
      .filter(col("hamming") <= thr)
      .select(col("a").as("img_id")).distinct()
      .withColumn("in_idx", lit(1))
    // within-batch candidates ride the same hot-bucket block grid as
    // [[phashOn]] (identical candidate set, skew-spread reducers)
    val candB = DedupSim.bucketPairs(
      bb.select(col("band"), col("bv").as("bh"),
        col("img_id").as("doc_id")), cap = 64)
      .select(col("a"), col("b"))
    val dupB = candB
      .join(bb.as("ba"), col("a") === col("ba.img_id"))
      .join(bb.as("b2"), col("b") === col("b2.img_id") &&
        col("ba.band") === col("b2.band"))
      .groupBy(col("a"), col("b"))
      .agg(sum(expr("bit_count(ba.bv ^ b2.bv)")).as("hamming"))
      .filter(col("hamming") <= thr)
      .select(col("b").as("img_id")).distinct()
      .withColumn("in_batch", lit(1))
    bb.select(col("img_id")).distinct()
      .join(dupIdx, Seq("img_id"), "left")
      .join(dupB, Seq("img_id"), "left")
      .select(col("img_id"),
        when(col("in_idx").isNotNull, "dup_index")
          .when(col("in_batch").isNotNull, "dup_batch")
          .otherwise("kept").as("decision"))
      .orderBy(col("img_id"))
  }

  /** q_mm_audio_fp — AUDIO fingerprint dedup, the third modality in
    * the dedup family (text: simhash/minhash; image: [[phash]]): every
    * audio/wav payload is REALLY decoded (RIFF parse + PCM frame
    * extraction through [[WavDecoder]]), its signed 16-bit stream is
    * split into 8-frame windows, and the fingerprint is the classic
    * energy-delta-sign bit string (bit w = 1 iff E_{w+1} > E_w, E =
    * Σ s² per window) — the Shazam-family shape: robust to small
    * amplitude perturbation because only the SIGN of the inter-window
    * energy delta is kept. Clips sharing (n_samples, fingerprint) are
    * duplicate groups; the wire lists every group of ≥ 2 with its
    * size. Near-identical twins are PLANTED: every base%30==1 clip
    * gets a sample-0-bumped copy at id+10,000,000 — not
    * byte-identical, but the energy-sign fingerprint absorbs the
    * bump, so exact byte-level dedup misses it and this catches it.
    *
    * Oracle discipline: the synthetic sample function is closed-form
    * integer, so DuckDB recomputes windows → energies → delta signs →
    * packed fingerprint without parsing RIFF (the q_mm_decode
    * pattern): the real codec path must land on identical arithmetic.
    *
    * Scale shape: decode + fingerprint are partition-local (one codec
    * context per partition; only (id, n, fp) longs shuffle — payload
    * bytes never); the group-by is one hash agg on a (length,
    * fingerprint) key. Pure exact-key dedup — no candidate explosion
    * possible. */
  def audioFingerprint(s: SparkSession, d: String): DataFrame =
    audioFingerprintOn(s, Tables.documents(s, d))

  /** Core of q_mm_audio_fp: (n_samples, fp, n_items) duplicate groups
    * of size ≥ 2. */
  def audioFingerprintOn(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import s.implicits._
    val baseIds = docsDf.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
    val fps = baseIds.mapPartitions { it =>
      val wav = new WavDecoder() // one codec context per partition
      it.flatMap { base =>
        val variants =
          if (base % 30 == 1) Seq((base, false), (base + 10000000L, true))
          else Seq((base, false))
        variants.map { case (clipId, bumped) =>
          val samples = wav.decodeSamples(wavBytes(base, bumped))
          val energies = samples.grouped(8).map { w =>
            var e = 0L
            var j = 0
            while (j < w.length) { e += w(j).toLong * w(j); j += 1 }
            e
          }.toArray
          var fp = 0L
          var w = 0
          while (w < energies.length - 1) {
            if (energies(w + 1) > energies(w)) fp |= 1L << w
            w += 1
          }
          (clipId, samples.length.toLong, fp)
        }
      }
    }.toDF("clip_id", "n_samples", "fp")
    fps.groupBy(col("n_samples"), col("fp"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") >= 2)
      .orderBy(col("n_samples"), col("fp"))
  }

  /** Deterministic "video": a container of n = 4 + doc_id%5 REAL
    * concatenated PNG frames (the MJPEG-style frame-per-image
    * container), 8×8 grayscale, frame f pixel i =
    * (doc_id·31 + f + i·step) mod 256 with step = 7 for even shots
    * and 1 for odd shots (shot = f / 3). The step change at each
    * 3-frame shot boundary reshapes the pixel DISTRIBUTION (step 7
    * spreads values near-uniformly over 0..255; step 1 concentrates
    * them in a 64-wide band ≈ 4 bins), which is what a histogram-based
    * cut detector keys on; the +f term gives within-shot frames a
    * small drift so intra-shot distances are nonzero but far below the
    * boundary jump. Closed-form so the DuckDB oracle replays the
    * decoded pixels without a codec. */
  private[graft] def videoBytes(docId: Long): Array[Byte] = {
    val n = (4 + docId % 5).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      val step = if ((f / 3) % 2 == 0) 7 else 1
      var i = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          raster.setSample(x, y, 0, ((docId * 31 + f + i * step) % 256).toInt)
          i += 1; x += 1
        }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "png", bos)
      f += 1
    }
    bos.toByteArray
  }

  /** REAL container parse: walk the concatenated-PNG stream by chunk
    * structure (8-byte signature, then length-typed chunks to IEND) —
    * no signature scanning, so IDAT bytes can never false-positive a
    * frame boundary. Returns one byte slice per frame. */
  private[graft] def splitPngFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def be32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 8 <= bytes.length &&
        (0 until 8).forall(k => bytes(pos + k) == sig(k)),
        s"not a PNG frame at offset $pos")
      var p = pos + 8
      var done = false
      while (!done) {
        require(p + 8 <= bytes.length, s"not a PNG frame at offset $pos")
        val len = be32(p)
        require(len >= 0 && p + 12 + len <= bytes.length,
          s"not a PNG frame at offset $pos")
        val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
          bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
        p += 12 + len // length + type + data + crc
        if (isEnd) done = true
      }
      out += java.util.Arrays.copyOfRange(bytes, pos, p)
      pos = p
    }
    out.toArray
  }

  /** q_mm_video_scene — SCENE-CUT detection over the video frame
    * stream, the shot-boundary pass a video training pipeline runs to
    * split clips before sampling: each video payload is a REAL
    * concatenated-PNG frame container ([[videoBytes]]), parsed by
    * chunk structure ([[splitPngFrames]]) and each frame REALLY
    * decoded (signature parse, IDAT inflate, filter reconstruction —
    * the [[PngDecoder]] path [[phash]] uses; r12, replacing the r11
    * fixed-64-byte stub framing). Each decoded frame reduces to a
    * 16-bin pixel histogram and a CUT is declared wherever the L1
    * distance between consecutive frame histograms exceeds 24 —
    * recalibrated on real decoded pixels (swept over 1000 doc ids):
    * intra-shot drift measures L1 = 8 exactly and shot-boundary
    * distribution jumps ≥ 82, so 24 separates them with wide margin
    * on both sides (a real deployment learns this threshold). Wire:
    * per-source (videos, frames, cuts, max cuts per clip).
    *
    * Oracle discipline: the frame pixel function is closed-form, so
    * DuckDB recomputes histogram → L1 → cuts from pure arithmetic —
    * the real container-parse + codec path is verified against
    * arithmetic the oracle never decodes (the q_mm_phash pattern).
    *
    * Scale shape: container parse + decode + histograms + distances
    * are row-local (one codec context per partition, zero shuffle);
    * only (source, n_frames, n_cuts) triples reach the one per-source
    * hash agg. */
  def videoScenes(s: SparkSession, d: String): DataFrame =
    videoScenesOn(s, Par.spread(Tables.documents(s, d), col("doc_id")), thr = 24)

  /** Core of q_mm_video_scene. */
  def videoScenesOn(s: SparkSession, docsDf: DataFrame,
      thr: Int): DataFrame = {
    import s.implicits._
    val vids = docsDf.filter(col("doc_id") % 3 === 2)
      .select(col("source"), col("doc_id")).as[(String, Long)]
    val per = vids.mapPartitions { it =>
      val png = new PngDecoder() // one codec context per partition
      it.map { case (src, docId) =>
        val frames = splitPngFrames(videoBytes(docId))
        val hists = frames.map { fb =>
          val img = png.decodeImage(fb)
          val raster = img.getRaster
          val hist = new Array[Int](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              hist(raster.getSample(x, y, 0) >> 4) += 1
              x += 1
            }
            y += 1
          }
          hist
        }
        var cuts = 0
        var f = 0
        while (f < hists.length - 1) {
          var l1 = 0
          var bin = 0
          while (bin < 16) {
            l1 += math.abs(hists(f)(bin) - hists(f + 1)(bin))
            bin += 1
          }
          if (l1 > thr) cuts += 1
          f += 1
        }
        (src, hists.length.toLong, cuts.toLong)
      }
    }
    per.toDF("source", "n_frames", "n_cuts")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_videos"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("n_cuts")).as("total_cuts"),
        max(col("n_cuts")).as("max_cuts"))
      .orderBy(col("source"))
  }

  /** q_mm_phash_cluster — the SCALE answer to [[phash]]'s pair ledger:
    * a duplicate CLASS of n images has C(n,2) pairs (quadratic — see
    * SCALE.md r11), but an actual image-dedup run wants CLUSTERS and
    * survivors, which are linear in the class size. Same composition
    * as q_dedup_cluster: the phash near-dup pairs become connected
    * components ([[GraphOps.ccLabels]] — transitive closure matters:
    * A~B, B~C is one cluster even when A and C's Hamming exceeds the
    * threshold), each cluster keeps its minimum img_id as survivor,
    * and the wire is the one-row collapse ledger (images, images in
    * dup clusters, clusters, removed, kept).
    *
    * Scale shape: CC runs on the PAIR graph (≪ corpus); the final
    * classification joins the image universe against the label table
    * once. The quadratic pair stream lives only INSIDE the shuffle
    * feeding CC — it never lands on the wire. */
  def phashCluster(s: SparkSession, d: String): DataFrame =
    phashClusterOn(s, Tables.documents(s, d), thr = 6)

  /** Core of q_mm_phash_cluster. CC runs on the SIGNATURE graph (r16):
    * nodes are the distinct-signature representatives, edges the
    * verified rep pairs from [[phashSigPairs]] — the quadratic
    * image-pair stream never exists, not even inside the shuffle
    * feeding CC. Labels map back through membership: every member of
    * a signature group is Hamming-0-connected to its rep, so the
    * group inherits the rep's component (or forms its own cluster,
    * labelled by the rep, when it has ≥ 2 members and no cross-group
    * edge). ccLabels labels a component by its minimum node; the
    * minimum rep IS the minimum img_id of the whole expanded
    * component (each rep is its group's min), so the labels — and the
    * collapse ledger — equal the image-level CC's exactly. */
  def phashClusterOn(s: SparkSession, docsDf: DataFrame,
      thr: Int): DataFrame = {
    import s.implicits._
    val baseIds = docsDf.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
    val sigRows = baseIds.mapPartitions { it =>
      val png = new PngDecoder()
      it.flatMap { base =>
        val variants =
          if (base % 30 == 0) Seq((base, false), (base + 10000000L, true))
          else Seq((base, false))
        variants.map { case (imgId, bumped) =>
          (imgId, phashSig(png, pngBytes(base, bumped)))
        }
      }
    }.toDF("img_id", "sig")
    val sigs = ScratchCache.cache(sigRows)
    val repEdges = ScratchCache.cache(phashSigPairs(s, sigs, thr)
      .select(col("sa"), col("sb")))
    val reps = sigs.groupBy(col("sig"))
      .agg(min(col("img_id")).as("rep"), count(lit(1)).as("n"))
    val repComp = GraphOps.ccLabels(
      repEdges.join(reps.select(col("sig").as("sa"),
          col("rep").as("a")), "sa")
        .join(reps.select(col("sig").as("sb"), col("rep").as("b")), "sb")
        .select(col("a"), col("b")))
      .withColumnRenamed("node", "rep")
    val grpLab = reps.join(repComp, Seq("rep"), "left")
      .select(col("sig"),
        when(col("comp").isNotNull, col("comp"))
          .when(col("n") >= 2, col("rep")).as("comp"))
    sigs.join(grpLab, Seq("sig"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("comp").isNotNull.cast("long")).as("n_in_dup_clusters"),
        countDistinct(col("comp")).as("n_clusters"),
        sum((col("comp").isNotNull && col("comp") =!= col("img_id"))
          .cast("long")).as("n_removed"))
      .select(col("n_images"), col("n_in_dup_clusters"),
        col("n_clusters"), col("n_removed"),
        (col("n_images") - col("n_removed")).as("n_kept"))
  }
}
