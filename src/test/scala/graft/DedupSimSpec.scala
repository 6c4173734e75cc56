package graft

import graft.ops._

class DedupSimSpec extends GraftSuite {
  import spark.implicits._

  test("incremental dedup: admission against the standing index equals " +
      "the from-scratch dedup, and the admission plan never rescans " +
      "history") {
    import org.apache.spark.sql.functions._
    val hist = Seq(
      (1L, "a", "alpha beta"), (2L, "a", "gamma delta"),
      (3L, "b", "epsilon zeta"), (4L, "b", "eta theta"))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (11L, "a", "gamma delta"),   // dup_index (hist 2)
      (12L, "a", "new text one"),  // kept
      (13L, "b", "new text two"),  // kept, then duplicated in-batch:
      (14L, "b", "new text two"),  // dup_batch (13 first)
      (15L, "b", "epsilon zeta"))  // dup_index (hist 3)
      .toDF("doc_id", "source", "text")
    val index = hist.select(md5(col("text")).as("sig")).distinct()
    val admitted = DedupSim.dedupIncrAdmit(batch, index)
    val got = admitted.collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq(11L -> "dup_index", 12L -> "kept", 13L -> "kept",
      14L -> "dup_batch", 15L -> "dup_index"))
    // from-scratch equivalence: global first-wins dedup over
    // history ∪ batch (history ids ordered before batch ids),
    // restricted to the batch — kept there ⟺ kept incrementally
    val scratch = hist.unionByName(batch)
      .withColumn("sig", md5(col("text")))
      .withColumn("first_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sig"))))
      .filter(col("doc_id") >= 11L)
      .select(col("doc_id"),
        (col("doc_id") === col("first_id")).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (id, dec) =>
      assert(scratch(id) == (dec == "kept"),
        s"doc $id: incremental=$dec, from-scratch keep=${scratch(id)}")
    }
    // the admission ledger grows the index: admitting the SAME batch
    // against index ∪ kept-sigs must re-classify every kept doc as
    // dup_index (idempotent re-ingest)
    val keptSigs = batch.join(admitted.filter(col("decision") === "kept")
        .select(col("doc_id")), "doc_id")
      .select(md5(col("text")).as("sig"))
    val again = DedupSim.dedupIncrAdmit(batch,
        index.unionByName(keptSigs).distinct())
      .collect().map(r => r.getString(2)).toSet
    assert(again == Set("dup_index"))
    // and the REAL key's admission plan reads the bucketed index table,
    // never the documents parquet, on the history side
    val d = sf
    DedupSim.dedupIncr(spark, d).collect() // builds the index table
    // the index name carries the O(metadata) file-manifest fingerprint
    // so a regenerated corpus can never silently reuse a stale index
    val idxT = DedupSim.indexPrefix("graft_dedup_idx", d) +
      DedupSim.datasetFingerprint(spark, s"$d/documents.parquet")
    val plan = DedupSim.dedupIncrAdmit(
      DedupSim.dedupIncrBatch(Tables.documents(spark, d)),
      spark.table(idxT))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_dedup_idx"),
      "admission plan must scan the standing index table")
  }

  test("incremental near-dup: admission against the standing signature " +
      "index equals the from-scratch near-dup, never rescans history") {
    import org.apache.spark.sql.functions._
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val t2 = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
      "nineteen twenty"
    val t3 = "red orange yellow green blue indigo violet crimson teal " +
      "magenta cyan olive maroon navy coral amber jade ruby pearl onyx"
    val tNew = "quick brown foxes jump over lazy dogs while curious cats " +
      "watch from tall fences near quiet gardens every single morning"
    val tOther = "rivers flow through ancient valleys carrying stories " +
      "of mountains past glaciers carved long before any roads existed"
    val hist = Seq((1L, "a", t1), (2L, "a", t2), (3L, "b", t3))
      .toDF("doc_id", "source", "text")
    val batch = Seq(
      (11L, "a", t1),                   // verbatim        -> dup_index
      (12L, "a", t2 + " extraword"),    // J = 16/17 >= .8 -> dup_index
      (13L, "b", tNew),                 // new             -> kept
      (14L, "b", tNew),                 // dup of 13       -> dup_batch
      (15L, "b", tOther))               // new             -> kept
      .toDF("doc_id", "source", "text")
    val perH = DedupSim.nearSignatures(hist.select(col("doc_id"), col("text")))
    val bands = DedupSim.nearBands(perH)
    val sigs = perH.select(col("doc_id"), col("hs"))
    val admitted = DedupSim.dedupIncrNearAdmit(batch, bands, sigs)
    val got = admitted.collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    ScratchCache.releaseAll()
    assert(got == Seq(11L -> "dup_index", 12L -> "dup_index",
      13L -> "kept", 14L -> "dup_batch", 15L -> "kept"), got.toString)
    // from-scratch equivalence: near-dup pairs over history ∪ batch,
    // restricted to the batch with the same precedence rule
    val pairs = DedupSim.dedupNearOn(
        hist.unionByName(batch).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ScratchCache.releaseAll()
    val histIds = Set(1L, 2L, 3L)
    got.foreach { case (id, dec) =>
      val withHist = pairs.exists { case (a, b) =>
        (a == id && histIds(b)) || (b == id && histIds(a)) }
      val withSmallerBatch = pairs.exists { case (a, b) =>
        b == id && !histIds(a) }
      val want = if (withHist) "dup_index"
        else if (withSmallerBatch) "dup_batch" else "kept"
      assert(dec == want, s"doc $id: incremental=$dec, from-scratch=$want")
    }
    // re-ingest against index ∪ kept-doc signatures: everything that
    // was kept (or batch-dup of a kept doc) is now an index dup
    val keptIds = got.filter(_._2 == "kept").map(_._1)
    val perB = DedupSim.nearSignatures(
      batch.filter(col("doc_id").isin(keptIds: _*))
        .select(col("doc_id"), col("text")))
    val again = DedupSim.dedupIncrNearAdmit(batch,
        bands.unionByName(DedupSim.nearBands(perB)),
        sigs.unionByName(perB.select(col("doc_id"), col("hs"))))
      .collect().map(_.getString(2)).toSet
    ScratchCache.releaseAll()
    assert(again == Set("dup_index"), again.toString)
    // and the REAL key's admission plan reads the two bucketed index
    // tables, never the documents parquet, on the history side
    val d = sf
    DedupSim.dedupIncrNear(spark, d).collect() // builds the index
    ScratchCache.releaseAll()
    val fp = DedupSim.datasetFingerprint(spark, s"$d/documents.parquet")
    val plan = DedupSim.dedupIncrNearAdmit(
        DedupSim.dedupIncrNearBatch(Tables.documents(spark, d)),
        spark.table(DedupSim.indexPrefix("graft_neardup_bands", d) + fp),
        spark.table(DedupSim.indexPrefix("graft_neardup_sigs", d) + fp))
      .queryExecution.executedPlan.toString
    ScratchCache.releaseAll()
    assert(plan.contains("graft_neardup_bands"),
      "admission plan must scan the standing band table")
    assert(plan.contains("graft_neardup_sigs"),
      "admission plan must scan the standing signature table")
  }

  test("incremental semantic dedup: admission against the standing IVF " +
      "index equals the from-scratch within-list dedup under the same " +
      "frozen quantizer, never rescans history") {
    import org.apache.spark.sql.functions._
    graft.plans.GraftExtensions.registerFunctions(spark)
    // two well-separated directions so the k=2 quantizer splits cleanly
    def vec(dir: Int, eps: Double): Seq[Double] =
      if (dir == 0) Seq(1.0 + eps, 0.01, 0.0, 0.0)
      else Seq(0.0, 0.01, 1.0 + eps, 0.0)
    val hist = Seq(
      (1L, 0L, vec(0, 0.0)), (2L, 0L, vec(0, 0.5)),
      (3L, 1L, vec(1, 0.0)), (4L, 1L, vec(1, 0.5)))
      .toDF("vec_id", "label", "embedding")
    val batch = Seq(
      (11L, 0L, vec(0, 0.0)),              // verbatim hist 1 -> dup_index
      (12L, 1L, vec(1, 0.001)),            // near twin of 3  -> dup_index
      (13L, 0L, Seq(0.7, 0.0, 0.0, 0.7)),  // new direction   -> kept
      (14L, 0L, Seq(0.7, 0.0, 0.0, 0.7)),  // dup of 13       -> dup_batch
      (15L, 1L, Seq(0.0, 0.7, 0.0, -0.7))) // new direction   -> kept
      .toDF("vec_id", "label", "embedding")
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    // k = 2 equal-width kd quantizer: the widest dim over hist is
    // dim 0 (range 1.5, dim-2 tie broken to the lower dim), cut at
    // 0.75 — direction-0 vectors land in bucket 1, the rest bucket 0.
    // Persist the artifact pair like the real key does (the lazy
    // build frames reference round checkpoints that releaseAll frees)
    val art = java.nio.file.Files
      .createTempDirectory("graft_semkdq").toString
    val (histAsg, splitsB) = DedupSim.kdQuantizeWithSplits(
      prep(hist).select(col("vec_id"), col("v")), k = 2)
    splitsB.write.mode("overwrite").parquet(s"$art/splits")
    histAsg.join(prep(hist).select(col("vec_id"), col("label")), "vec_id")
      .write.mode("overwrite").parquet(s"$art/lists")
    ScratchCache.releaseAll()
    val splits = spark.read.parquet(s"$art/splits")
    val lists = spark.read.parquet(s"$art/lists")
    // a history vector walked through the frozen tables re-assigns to
    // exactly the list the build gave it
    val rebuilt = DedupSim.kdqAssign(
        prep(hist).select(col("vec_id"), col("v")), splits)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ScratchCache.releaseAll()
    val built = lists.select(col("vec_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rebuilt == built, s"rebuilt=$rebuilt built=$built")
    val got = DedupSim.dedupIncrSemanticAdmit(batch, splits, lists, 0.999)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    ScratchCache.releaseAll()
    assert(got == Seq(11L -> "dup_index", 12L -> "dup_index",
      13L -> "kept", 14L -> "dup_batch", 15L -> "kept"), got.toString)
    // FROM-SCRATCH EQUIVALENCE under the same frozen quantizer: assign
    // history ∪ batch, enumerate within-list cosine ≥ τ pairs, restrict
    // to the batch with the same precedence rule
    val allAsg = DedupSim.kdqAssign(
      prep(hist.unionByName(batch)), splits)
    val pairs = allAsg.as("x").join(allAsg.as("y"),
        col("x.list_id") === col("y.list_id") &&
        col("x.vec_id") < col("y.vec_id"))
      .filter(expr("cosine_sim(x.v, y.v)") >= 0.999)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ScratchCache.releaseAll()
    val histIds = Set(1L, 2L, 3L, 4L)
    got.foreach { case (id, dec) =>
      val withHist = pairs.exists { case (a, b) =>
        (a == id && histIds(b)) || (b == id && histIds(a)) }
      val withSmallerBatch = pairs.exists { case (a, b) =>
        b == id && !histIds(a) }
      val want = if (withHist) "dup_index"
        else if (withSmallerBatch) "dup_batch" else "kept"
      assert(dec == want, s"vec $id: incremental=$dec, from-scratch=$want")
    }
    // idempotent re-ingest: admitting the same batch against
    // index ∪ kept-batch-vectors re-classifies everything as dup_index
    val keptIds = got.filter(_._2 == "kept").map(_._1)
    val keptAsg = DedupSim.kdqAssign(
      prep(batch.filter(col("vec_id").isin(keptIds: _*))), splits)
    val again = DedupSim.dedupIncrSemanticAdmit(batch, splits,
        lists.unionByName(keptAsg), 0.999)
      .collect().map(_.getString(2)).toSet
    ScratchCache.releaseAll()
    assert(again == Set("dup_index"), again.toString)
    // and the REAL key's admission plan reads the persisted index
    // artifact, never the embeddings parquet, on the history side
    val d = sf
    DedupSim.dedupIncrSemantic(spark, d).collect() // builds the index
    ScratchCache.releaseAll()
    val name = DedupSim.indexPrefix("graft_semdedup_idx", d) +
      DedupSim.datasetFingerprint(spark, s"$d/embeddings.parquet")
    val dir = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), name).toString
    val plan = DedupSim.dedupIncrSemanticAdmit(
        DedupSim.dedupIncrSemanticBatch(Tables.embeddings(spark, d)),
        spark.read.parquet(s"$dir/splits"),
        spark.read.parquet(s"$dir/lists"), 0.999)
      .queryExecution.executedPlan.toString
    ScratchCache.releaseAll()
    assert(plan.contains("graft_semdedup_idx"),
      "admission plan must scan the standing IVF index artifact")
  }

  test("incremental semantic admission: the history list scan is " +
      "partition-pruned to the batch's touched lists") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions._
    graft.plans.GraftExtensions.registerFunctions(spark)
    def vec(dir: Int, eps: Double): Seq[Double] =
      if (dir == 0) Seq(1.0 + eps, 0.01, 0.0, 0.0)
      else Seq(0.0, 0.01, 1.0 + eps, 0.0)
    val hist = Seq(
      (1L, 0L, vec(0, 0.0)), (2L, 0L, vec(0, 0.5)),
      (3L, 1L, vec(1, 0.0)), (4L, 1L, vec(1, 0.5)))
      .toDF("vec_id", "label", "embedding")
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sem_prune").toString
    val (histAsg, splitsB) = DedupSim.kdQuantizeWithSplits(
      prep(hist).select(col("vec_id"), col("v")), k = 2)
    splitsB.write.mode("overwrite").parquet(s"$tmp/splits")
    histAsg.join(prep(hist).select(col("vec_id"), col("label")), "vec_id")
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$tmp/lists")
    ScratchCache.releaseAll()
    // a batch living entirely in direction-0 touches ONE of the two
    // inverted lists — the scan must list/read only that directory
    val batch = Seq((21L, 0L, vec(0, 0.002)), (22L, 0L, vec(0, 0.3)))
      .toDF("vec_id", "label", "embedding")
    val out = DedupSim.dedupIncrSemanticAdmit(batch,
      spark.read.parquet(s"$tmp/splits"),
      spark.read.parquet(s"$tmp/lists"), 0.999)
    assert(out.collect().map(_.getString(2)).toSeq ==
      Seq("dup_index", "dup_index"))
    val scans = out.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("lists"))
      => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the lists")
    assert(scans.head.partitionFilters.exists(_.toString.contains("list_id")),
      s"no list_id partition filter in: ${scans.head.partitionFilters}")
    assert(scans.head.selectedPartitions.partitionCount == 1,
      "expected 1 pruned list directory, scanned " +
        s"${scans.head.selectedPartitions.partitionCount}")
    ScratchCache.releaseAll()
  }

  test("kdqAssign clamps batch buckets at BOTH range edges: a value " +
      "below the frozen list's history min stays in its parent's " +
      "bucket space") {
    import org.apache.spark.sql.functions._
    // Hand-crafted two-round frozen quantizer (kdqAssign accepts any
    // splits frame): round 1 cuts dim 0 over [0,1] with fanout 2;
    // round 2 cuts dim 1 — child list 1's history range is [5,6].
    val splits = Seq(
      (1, 0L, 0, 0.0, 1.0, 2L),
      (2, 0L, 1, 0.0, 1.0, 2L),
      (2, 1L, 1, 5.0, 6.0, 2L))
      .toDF("round", "list_id", "sdim", "mn", "mx", "fanout")
    // batch vector (0.9, 4.0): round 1 -> half 1, parent list 1;
    // round 2 on list 1: sv 4.0 sits BELOW the frozen mn 5.0 —
    // floor((4-5)/1*2) = -2. Unclamped that yields list 1*2-2 = 0,
    // ESCAPING into parent 0's bucket space; the clamp pins it to
    // bucket 0 -> list 2, the low edge of its own parent's range.
    // A twin at mn exactly (0.9, 5.0) also takes bucket 0 -> same
    // list, so low-edge near-dups of history stay co-located.
    val batch = Seq(
      (100L, Seq(0.9, 4.0)), (101L, Seq(0.9, 5.0)),
      (102L, Seq(0.9, 7.5)),                  // above mx: clamps to f-1
      (103L, Seq(0.1, 0.5)))                  // parent 0 mid-range
      .toDF("vec_id", "v")
    val got = DedupSim.kdqAssign(batch, splits)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ScratchCache.releaseAll()
    assert(got(100L) == 2L, s"below-min must clamp to bucket 0: $got")
    assert(got(101L) == 2L, s"at-min twin must share the list: $got")
    assert(got(102L) == 3L, s"above-max must clamp to f-1: $got")
    assert(got(103L) == 1L, s"parent-0 mid-range: $got")
    assert(got.values.forall(l => l >= 0L && l < 4L),
      s"every list must sit inside [0, 4): $got")
  }

  test("dataset fingerprint: zero Spark jobs, detects same-shape edits, " +
      "and stale fingerprint-named indexes are dropped on rebuild") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp").toString
    val p = s"$tmp/documents.parquet"
    Seq((1L, "a", "alpha"), (2L, "a", "beta"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(p)
    // the freshness probe is a filesystem LIST — no Spark job may run
    spark.sparkContext.setJobGroup("fp_probe", "fingerprint probe")
    val fp1 = DedupSim.datasetFingerprint(spark, p)
    val fp1again = DedupSim.datasetFingerprint(spark, p)
    val probeJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup("fp_probe")
    spark.sparkContext.clearJobGroup()
    assert(probeJobs.isEmpty,
      s"fingerprint probe launched Spark jobs: ${probeJobs.toSeq}")
    assert(fp1 == fp1again, "fingerprint must be deterministic")
    // the ADVICE r14 scenario: edited text, SAME row count and max id —
    // the old (count, max) probe missed this; the manifest hash must not
    Seq((1L, "a", "alpha EDITED"), (2L, "a", "beta"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(p)
    val fp2 = DedupSim.datasetFingerprint(spark, p)
    assert(fp1 != fp2,
      "regenerated corpus with unchanged (count, max id) must change " +
        "the fingerprint")
    // stale fingerprint-named tables are dropped (catalog + files) when
    // a rebuild happens under a new fingerprint
    val pfx = "graft_test_stale_idx_"
    val stale = pfx + fp1
    val keep = pfx + fp2
    val stalePath = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), stale).toString
    Seq(Tuple1("x")).toDF("sig").write.mode("overwrite")
      .option("path", stalePath).format("parquet").saveAsTable(stale)
    DedupSim.dropStaleIndexes(spark, pfx, keep)
    assert(!spark.catalog.tableExists(stale),
      "stale index table must be dropped from the catalog")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(stalePath)),
      "stale index files must be deleted")
  }

  test("near-dup finds planted exact duplicates (recall on dups = 1)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact dup of 1
      (3L, base + " extra"),                       // near dup of 1/2
      (4L, "completely different words about database systems and storage engines here")
    ).toDF("doc_id", "text")
    val pairs = DedupSim.dedupNearOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("knn graph: per-query top-3 with rounded-cosine ranking and id tiebreak") {
    // queries are vec_id % 50 == 0 -> ids 0 and 50
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f)),   // cos 1.0 with q0
      (2L, Array(1f, 1f, 0f)),   // cos 0.707107 with both axes
      (3L, Array(0f, 1f, 0f)),
      (50L, Array(0f, 3f, 0f))). // second query, y axis
      toDF("vec_id", "embedding")
    val out = DedupSim.knnGraphOn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1.0, 1L), (0L, 2L, 0.707107, 2L),
      // cos-0 tie between 3 and 50 -> nb_id ascending
      (0L, 3L, 0.0, 3L),
      (50L, 3L, 1.0, 1L), (50L, 2L, 0.707107, 2L), (50L, 0L, 0.0, 3L)))
  }

  test("near-dup jaccard of exact duplicates is 1.0") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val j = DedupSim.dedupNearOn(docs).collect().head.getAs[Double]("jaccard")
    assert(j == 1.0)
  }

  test("cosine top-k: identical vector has similarity 1, ordering correct") {
    val rows = DedupSim.simCosineTopK(spark, sf).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getAs[Double]("cos"))
    assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("centroid norms are positive and dims complete") {
    val rows = DedupSim.simCentroid(spark, sf).collect()
    assert(rows.length == 64 * rows.map(_.getAs[Int]("label")).distinct.length)
    assert(rows.forall(_.getAs[Double]("cnorm") >= 0.0))
  }

  test("near-dup precision = 1 vs independent brute-force Jaccard at sf0.001") {
    // recompute shingle-set Jaccard in plain Scala for every reported
    // pair — completely independent of the Spark pipeline
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").sliding(5)
          .map(_.mkString(" ")).toSet)
      .toMap
    val pairs = DedupSim.dedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    pairs.foreach { case (a, b, j) =>
      val (sa, sb) = (docs(a), docs(b))
      val trueJ = (sa & sb).size.toDouble / (sa | sb).size
      assert(trueJ >= 0.8, s"pair ($a,$b) reported j=$j but true j=$trueJ")
      assert(math.abs(trueJ - j) < 1e-6)
    }
  }

  test("hot-bucket blocking: bucketPairs equals the plain self-join") {
    // 3 buckets: one hot (120 members -> blocked S>1), two cold
    val rows = (0 until 120).map(i => (0, 7L, i.toLong)) ++
      (0 until 10).map(i => (1, 8L, (200 + i).toLong)) ++
      Seq((2, 9L, 500L))
    val buckets = rows.toDF("band", "bh", "doc_id")
    val blocked = DedupSim.bucketPairs(buckets, cap = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = rows.groupBy(r => (r._1, r._2)).values.flatMap { g =>
      for (u <- g; v <- g if u._3 < v._3) yield (u._3, v._3)
    }.toSet
    assert(blocked == expected)
    assert(expected.size == 120 * 119 / 2 + 10 * 9 / 2)
  }

  test("near-dup recall survives a planted 200-doc boilerplate cluster") {
    // 200 identical docs: every band bucket is hot; the blocked join
    // must still surface all C(200,2) pairs at jaccard 1.0, and the
    // distinct docs must not pair with them
    val boiler = (0 until 200).map(i =>
      (1000L + i, "this exact boilerplate legal disclaimer text appears on every single page"))
    val normal = (0 until 10).map(i =>
      (i.toLong, s"unique document number $i talking about alpha$i beta$i gamma$i delta$i"))
    val docs = (boiler ++ normal).toDF("doc_id", "text")
    val pairs = DedupSim.dedupNearOn(docs).collect()
    val bp = pairs.filter(r => r.getLong(0) >= 1000L && r.getLong(1) >= 1000L)
    assert(bp.length == 200 * 199 / 2)
    assert(bp.forall(_.getAs[Double]("jaccard") == 1.0))
    assert(pairs.length == bp.length, "distinct docs must not pair")
  }

  test("ngram jaccard: exact dups score 1.0, disjoint docs don't pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // J = 1.0
      (3L, base + " lambda"),                       // high overlap
      (4L, "totally different text about storage engines and columnar formats")
    ).toDF("doc_id", "text")
    val out = DedupSim.dedupNgramOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out.contains((1L, 3L)) && out.contains((2L, 3L)))
    assert(!out.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard prefix filter matches unfiltered brute force") {
    // independent brute force in plain Scala over the sf corpus
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").sliding(5)
          .filter(_.length == 5).map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty).toSeq
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if math.rint(j * 1e6) / 1e6 >= 0.5
    } yield (a, b)).toSet
    val got = DedupSim.dedupNgram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("containment: planted quote pairs directionally, jaccard misses it") {
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve")
    val quote = "lambda mu nu xi omicron pi rho sigma" // 8 words ⊂ long
    val docs = Seq(
      (1L, long),
      (2L, quote),
      (3L, "unrelated text about storage engines and columnar formats today")
    ).toDF("doc_id", "text")
    val out = DedupSim.dedupContainOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment"))
      .toMap
    assert(out((2L, 1L)) == 1.0)        // the quote IS contained in long
    assert(!out.contains((1L, 2L)))     // the long doc is not in the quote
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // jaccard at its own 0.5 threshold cannot see this pair
    val j = DedupSim.dedupNgramOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)) && !j.contains((2L, 1L)))
  }

  test("containment prefix filter matches unfiltered brute force") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").sliding(5)
          .filter(_.length == 5).map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty).toSeq
    val expected = (for {
      (a, sa) <- docs; (b, sb) <- docs if a != b
      inter = (sa & sb).size
      c = inter.toDouble / sa.size
      if math.rint(c * 1e6) / 1e6 >= 0.8
    } yield (a, b)).toSet
    val got = DedupSim.dedupContain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("simhash: exact duplicates have hamming distance 0") {
    val t = "spark hash join sort merge filter scan window group agg"
    val docs = Seq((1L, t), (2L, t),
      (3L, "totally different vocabulary about graphs nodes edges merge")).toDF("doc_id", "text")
    val pairs = DedupSim.dedupSimhashOn(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"dup pair missing/nonzero: $pairs")
  }

  test("embcos sizing reads parquet metadata; construction runs no job") {
    // Warm the table reader first: spark.read.parquet runs a one-time
    // footer/schema-inference job at first access, which belongs to
    // table setup, not query construction. Doubles as the
    // footer-vs-real row count check.
    assert(DedupSim.parquetRowCount(spark, s"$sf/embeddings.parquet")
      .contains(Tables.embeddings(spark, sf).count()))
    // query CONSTRUCTION must not run any Spark job (the sizing
    // count() it replaced was one): watch the job-start stream around
    // the builder call.
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Thread.sleep(500) // drain queued events from the warm-up count
      jobs = 0
      val df = DedupSim.dedupEmbCos(spark, sf)
      Thread.sleep(500) // listener bus is async; let any event drain
      assert(jobs == 0, s"query construction ran $jobs job(s)")
      // guard against a vacuous listener: acting on the frame MUST
      // register jobs through the same counter
      assert(df.limit(1).count() == 1)
      var waited = 0
      while (jobs == 0 && waited < 5000) { Thread.sleep(100); waited += 100 }
      assert(jobs > 0, "listener never observed the execution jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      ScratchCache.releaseAll()
    }
  }

  test("embcos plan shape: no nested-loop pair enumeration anywhere") {
    // the projection-band rewrite must keep every join an equi join —
    // a BNLJ/cartesian sneaking into the grid or verify joins would be
    // the 100 TB scale-killer the banding exists to prevent
    val plan = DedupSim.dedupEmbCos(spark, sf)
      .queryExecution.executedPlan.toString
    ScratchCache.releaseAll()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("embcos top-50 ≡ brute force on STRONGLY clustered vectors " +
      "(pruning active)") {
    // The oracle checks exactness on the weak-clustered synthetic set,
    // where few list pairs get pruned. Tight planted clusters are the
    // opposite regime — most cross-list pairs are eliminated by the
    // angular bound — so a too-aggressive bound would silently drop
    // top-50 pairs HERE and nowhere else. Brute force is the judge.
    import graft.ops.{DedupSim, ScratchCache}
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val got = DedupSim.dedupEmbCosOn(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    ScratchCache.releaseAll()
    // plain-Scala brute force, replicating cosine_sim's accumulation
    // order (elementwise dot/na/nb, float→double per element) and
    // Spark Round's HALF_UP on doubles
    val dv = vecs.map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      i <- dv.indices; j <- (i + 1) until dv.size
    } yield (dv(i)._1, dv(j)._1,
      BigDecimal(cos(dv(i)._2, dv(j)._2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    assert(got == expected)
  }

  test("semantic dedup: k=1 equals brute-force all-pairs dedup exactly; " +
      "k>1 pairs are a subset (no false positives)") {
    import spark.implicits._
    import graft.ops.{DedupSim, ScratchCache}
    // ids avoid %25==0 so no auto-planted twins disturb the fixture;
    // group {1,2,3} identical (one cluster, survivor 1), {4,5}
    // identical, 6/7 unrelated (max cross cosine 0.354 < tau)
    val dim = 8
    def unit(d: Int): Seq[Float] = (0 until dim).map(i => if (i == d) 1f else 0f)
    val rows: Seq[(Long, String, Seq[Float])] = Seq(
      (1L, "x", unit(0)), (2L, "x", unit(0)), (3L, "x", unit(0)),
      (4L, "y", unit(1)), (5L, "y", unit(1)),
      (6L, "z", unit(2)), (7L, "z", (0 until dim).map(_ => 0.5f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out1 = DedupSim.dedupSemanticOn(df, tau = 0.99, kOverride = Some(1))
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_in_dup_clusters"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept")))).toMap
    ScratchCache.releaseAll()
    // k=1 -> one list -> within-list = ALL pairs = brute force, so the
    // ledger is exactly the hand-computed brute-force collapse
    assert(out1 == Map(
      "x" -> ((3L, 3L, 1L, 2L, 1L)),
      "y" -> ((2L, 2L, 1L, 1L, 1L)),
      "z" -> ((2L, 0L, 0L, 0L, 2L))))
    // at k=4 the quantizer may split pairs (SemDeDup's trade) but can
    // never invent one: found pairs must be a subset of brute force
    val vecs = df.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(x as double))").as("v"))
    val assigned = DedupSim.kdQuantize(vecs, 4)
    val found = DedupSim.semanticPairs(assigned, 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ScratchCache.releaseAll()
    val brute = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    assert(found.subsetOf(brute), s"false positives: ${found -- brute}")
  }

  test("semantic dedup: the planted %25 twins collapse into exactly " +
      "one cluster each on the real corpus") {
    import graft.ops.{DedupSim, ScratchCache}
    val out = DedupSim.dedupSemantic(spark, sf).collect()
    ScratchCache.releaseAll()
    val sums = out.map(r => (r.getAs[Long]("n_vecs"),
      r.getAs[Long]("n_in_dup_clusters"), r.getAs[Long]("n_clusters"),
      r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept")))
      .foldLeft((0L, 0L, 0L, 0L, 0L)) { case ((a, b, c, d, e), r) =>
        (a + r._1, b + r._2, c + r._3, d + r._4, e + r._5) }
    // 500 corpus vectors + 20 twins; a found twin pairs ONLY with its
    // base (cosine ~0.9999998 > 0.999; unrelated max ~0.51), so every
    // cluster is exactly a {base, twin} pair with the base (lower id)
    // surviving — structure is exact even though recall is the
    // SemDeDup trade (a twin whose dim-0 value straddles a quantizer
    // cut lands in a different list and is missed BY DESIGN; measured
    // 18/20 here, and the cuts are approx-median sketches so the
    // exact count may shift with partitioning):
    val (nVecs, inDup, clusters, removed, kept) = sums
    assert(nVecs == 520L)
    assert(inDup == 2 * clusters, sums.toString)  // pairs, never larger
    assert(removed == clusters, sums.toString)    // one survivor each
    assert(kept == nVecs - removed)
    assert(clusters >= 14L && clusters <= 20L, sums.toString) // recall >= 0.7
  }

  test("exact dedup: distinct counts never exceed doc counts") {
    val rows = DedupSim.dedupExact(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dups") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_distinct"))
    }
  }

  test("embedding dim stats: exact moments per dimension on a planted frame") {
    val df = Seq(
      (1L, Array(1.0f, -1.0f)),
      (2L, Array(3.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = DedupSim.embDimStatsOn(df).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean"),
          r.getAs[Double]("variance"), r.getAs[Double]("v_min"),
          r.getAs[Double]("v_max")))).toMap
    // dim 1: {1,3} -> mean 2, var (1+9)/2 - 4 = 1; dim 2: {-1,1}
    assert(out(1L) == ((2L, 2.0, 1.0, 1.0, 3.0)))
    assert(out(2L) == ((2L, 0.0, 1.0, -1.0, 1.0)))
    assert(out.size == 2)
  }

  test("emb gram: one-pass aggregator state == brute-force pair sums") {
    val dim = 64
    // mixed-sign fractions, no representable .5 ties at the 3rd place
    val vecs = (0 until 5).map { v =>
      (v.toLong,
        Array.tabulate(dim)(i => (((v * 31 + i * 7) % 13) - 6) / 3.0f))
    }
    val q = vecs.map { case (_, a) =>
      a.map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val n = vecs.length
    def sI(i: Int) = q.map(_(i)).sum
    def sIJ(i: Int, j: Int) = q.map(a => a(i) * a(j)).sum
    val got = DedupSim.embGramOn(spark, vecs.toDF("vec_id", "embedding"))
      .collect()
    assert(got.length == dim * (dim + 1) / 2)
    val gm = got.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
      ((r.getAs[Long]("s_ij"), r.getAs[Double]("cov")))).toMap
    for (i <- 0 until dim; j <- i until dim) {
      val (sij, cov) = gm((i.toLong, j.toLong))
      assert(sij == sIJ(i, j), s"pair ($i,$j)")
      val exp = BigDecimal(
        (sij.toDouble - sI(i).toDouble * sI(j).toDouble / n) / (n - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cov == exp, s"cov ($i,$j)")
    }
  }

  test("emb pca: planted dominant direction recovered, labels separate " +
      "on PC1, output repartition-invariant") {
    val dim = 64
    // coordinate 0 carries ±2 by label; all other coordinates ±0.02
    // deterministic jitter -> PC1 must be ~e0 with var_share ~1
    val vecs = (0 until 20).map { v =>
      val label = if (v % 2 == 0) "a" else "b"
      val arr = Array.tabulate(dim) { i =>
        if (i == 0) (if (v % 2 == 0) 2.0f else -2.0f)
        else (((v * 31 + i * 7) % 13) - 6) / 300.0f
      }
      (label, arr)
    }
    val df = vecs.toDF("label", "embedding")
    val out = DedupSim.embPcaOn(spark, df).collect()
    ScratchCache.releaseAll()
    val byLabel = out.map(r => r.getString(0) ->
      ((r.getAs[Long]("n_vecs"), r.getAs[Double]("proj_mean"),
        r.getAs[Double]("pc1_var_share")))).toMap
    assert(byLabel("a")._1 == 10L && byLabel("b")._1 == 10L)
    // centered projections: label a at ~ +2, b at ~ -2 (sign fixed by
    // the largest-|loading| convention -> +e0)
    assert(math.abs(byLabel("a")._2 - 2.0) < 0.05, byLabel.toString)
    assert(math.abs(byLabel("b")._2 + 2.0) < 0.05, byLabel.toString)
    assert(byLabel("a")._3 > 0.95) // PC1 eats ~all the variance
    // exact determinism under physical repartitioning
    val out2 = DedupSim.embPcaOn(spark, df.repartition(7)).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).sorted.toSeq ==
      out2.map(_.toString).sorted.toSeq)
  }

  test("emb pca: a single-vector label emits NULL proj_sd instead of " +
      "an ANSI divide-by-zero") {
    val dim = 64
    val vecs = (0 until 9).map { v =>
      val label = if (v == 0) "solo" else "bulk"
      val arr = Array.tabulate(dim) { i =>
        if (i == 0) (if (v % 2 == 0) 2.0f else -2.0f)
        else (((v * 31 + i * 7) % 13) - 6) / 300.0f
      }
      (label, arr)
    }
    val out = DedupSim.embPcaOn(spark, vecs.toDF("label", "embedding"))
      .collect()
    ScratchCache.releaseAll()
    val byLabel = out.map(r => r.getString(0) -> r).toMap
    assert(byLabel("solo").getAs[Long]("n_vecs") == 1L)
    assert(byLabel("solo").isNullAt(byLabel("solo").fieldIndex("proj_sd")))
    assert(!byLabel("bulk").isNullAt(byLabel("bulk").fieldIndex("proj_sd")))
  }

  test("emb kmeans: planted separated clusters recovered pure, " +
      "inertia jitter-bounded, repartition-invariant") {
    val dim = 64
    // Plant 3 tight clusters 20 apart. Seeds are the k smallest
    // md5(vec_id) ids, so compute the md5 order HERE and put the
    // first three ids in DISTINCT clusters — each cluster then owns
    // exactly one seed and 2-round Lloyd must recover the planting.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Int): String =
      md.digest(i.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val ids = (0 until 30).toVector
    val byH = ids.sortBy(i => (h(i), i))
    val anchor = byH.take(3).zipWithIndex.toMap // id -> cluster
    val rest = ids.filterNot(anchor.contains)
    val clusterOf: Map[Int, Int] =
      anchor ++ rest.zipWithIndex.map { case (id, ix) =>
        // keep counts balanced at 10 per cluster
        id -> (ix % 3)
      }
    val centers = Array(
      Array.tabulate(dim)(i => if (i == 0) 20.0f else 0.0f),
      Array.tabulate(dim)(i => if (i == 1) 20.0f else 0.0f),
      Array.tabulate(dim)(i => if (i == 2) 20.0f else 0.0f))
    val vecs = ids.map { id =>
      val c = clusterOf(id)
      val arr = centers(c).clone()
      // deterministic jitter ≤ 0.06 per coordinate
      (0 until dim).foreach { i =>
        arr(i) = arr(i) + (((id * 31 + i * 7) % 13) - 6) / 100.0f
      }
      (id.toLong, c, arr)
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = DedupSim.embKmeansOn(df, k = 3).collect()
    ScratchCache.releaseAll()
    assert(out.length == 3, out.mkString("; "))
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 10L, r.toString)
      assert(r.getAs[Long]("n_top") == 10L, r.toString) // pure cluster
      // inertia ≤ 30 rows × 64 dims × (jitter 0.06 + mean shift)²
      assert(r.getAs[Double]("inertia") < 10.0, r.toString)
    }
    // the 3 majority labels are the 3 planted clusters
    assert(out.map(_.getAs[Int]("top_label")).toSet == Set(0, 1, 2))
    val out2 = DedupSim.embKmeansOn(df.repartition(7), k = 3).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).sorted.toSeq ==
      out2.map(_.toString).sorted.toSeq)
  }

  test("pq: ledger cells partition every vector in every subspace, " +
      "beat the single-centroid SSE, and are repartition-invariant") {
    val rnd = new scala.util.Random(11)
    val n = 60
    val vecs = (0 until n).map { i =>
      (i.toLong, 0, Seq.fill(64)((rnd.nextGaussian() * 2).toFloat))
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = DedupSim.embPqOn(df, m = 4, k = 4).collect()
    ScratchCache.releaseAll()
    val bySub = out.groupBy(_.getAs[Long]("sub"))
    assert(bySub.keySet == Set(0L, 1L, 2L, 3L))
    bySub.foreach { case (sub, rows) =>
      // every vector coded exactly once per subspace; ≤ k cells
      assert(rows.map(_.getAs[Long]("n_vecs")).sum == n.toLong, s"sub $sub")
      assert(rows.length <= 4 && rows.nonEmpty, s"sub $sub")
      rows.foreach(r => assert(r.getAs[Double]("recon_err") >= 0.0))
    }
    // Lloyd quality: per-subspace total reconstruction error must beat
    // quantizing everything to the single subspace MEAN (k=1 SSE) —
    // computed here in plain Scala on the same slices
    val dv = vecs.map(_._3.map(_.toDouble).toArray)
    (0 until 4).foreach { sub =>
      val slices = dv.map(_.slice(sub * 16, sub * 16 + 16))
      val mean = (0 until 16).map(d => slices.map(_(d)).sum / n).toArray
      val sse1 = slices.map(s => s.zip(mean)
        .map { case (x, c) => (x - c) * (x - c) }.sum).sum
      val ssePq = bySub(sub.toLong).map(_.getAs[Double]("recon_err")).sum
      assert(ssePq <= sse1 + 1e-6, s"sub $sub: pq $ssePq vs k=1 $sse1")
    }
    val out2 = DedupSim.embPqOn(df.repartition(7), m = 4, k = 4).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("pq sampled training: above trainMax the codebooks are trained " +
      "on exactly the md5-prefix sample, encode still covers all") {
    import org.apache.spark.sql.functions.{col, md5}
    val rnd = new scala.util.Random(11)
    val n = 60
    val vecs = (0 until n).map { i =>
      (i.toLong, 0, Seq.fill(64)((rnd.nextGaussian() * 2).toFloat))
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    // sampled codebooks == full training on the md5-prefix subset
    val (cbSampled, codesAll) =
      try {
        spark.conf.set("spark.graft.ann.trainMax", "16")
        val (_, cb, codes) = DedupSim.embPqModel(df, m = 4, k = 4)
        val r = (cb.collect().map(_.toString).sorted.toSeq,
          codes.collect())
        ScratchCache.releaseAll()
        r
      } finally spark.conf.unset("spark.graft.ann.trainMax")
    val subsetIds = df
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(16)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(subsetIds.size == 16)
    val (_, cbFull, _) = DedupSim.embPqModel(
      df.filter(col("vec_id").isin(subsetIds.toSeq: _*)), m = 4, k = 4)
    val cbFullRows = cbFull.collect().map(_.toString).sorted.toSeq
    ScratchCache.releaseAll()
    assert(cbSampled == cbFullRows,
      "sampled codebook training != full training on the md5 subset")
    // the ENCODE pass still covers every vector in every subspace
    assert(codesAll.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("sub"))).toSet.size == n * 4)
  }

  test("coreset: the far outlier is certainly selected with unit " +
      "Horvitz-Thompson weight, and selection is partition-invariant") {
    val rnd = new scala.util.Random(5)
    // 80 tight points around 0 + one far outlier owning nearly all of
    // Σd²: m·q(outlier) ≈ 20·0.5 » 1, so its TRUE inclusion
    // probability is 1 and the Horvitz–Thompson weight must be
    // 1/min(1, m·q) = 1 exactly — NOT 1/(m·q) < 1, which would bias
    // Σw low on precisely the extreme-d² points the coreset exists to
    // capture. Tight points have m·q « 1 and carry weights > 1.
    val vecs = (0 until 80).map { i =>
      (i.toLong, 0, Seq.fill(64)((rnd.nextGaussian() * 0.1).toFloat))
    } :+ ((99L, 1, Seq.fill(64)(50.0f)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = DedupSim.sampleCoresetOn(df, m = 20).collect()
    ScratchCache.releaseAll()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("vec_id")).contains(99L),
      "outlier must be selected")
    out.foreach(r => assert(r.getAs[Double]("w") > 0.0))
    val wOut = out.find(_.getAs[Long]("vec_id") == 99L).get
      .getAs[Double]("w")
    assert(wOut == 1.0, s"certainly-included outlier weight $wOut must " +
      "be exactly 1 (inclusion probability is min(1, m*q) = 1)")
    out.filter(_.getAs[Long]("vec_id") != 99L).foreach(r =>
      assert(r.getAs[Double]("w") > 1.0,
        s"tight point ${r.getAs[Long]("vec_id")} has m*q < 1 so w > 1"))
    val out2 = DedupSim.sampleCoresetOn(df.repartition(7), m = 20)
      .collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("outliers: the planted far vector tops the ledger with a large " +
      "z-score, inliers stay near zero, partition-invariant") {
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 60).map { i =>
      (i.toLong, 0, Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat))
    } :+ ((99L, 1, Seq.fill(64)(40.0f)))
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = DedupSim.embOutliersOn(df).collect()
    ScratchCache.releaseAll()
    assert(out.length == 20)
    assert(out.head.getAs[Long]("vec_id") == 99L, "outlier must rank first")
    assert(out.head.getAs[Double]("z") > 5.0)
    // ledger is sorted by exact d2 descending
    val d2s = out.map(_.getAs[Double]("d2"))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b })
    val out2 = DedupSim.embOutliersOn(df.repartition(7)).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("kcenter: greedy farthest-point covers every planted cluster " +
      "exactly once, radius decreases, selection is partition-invariant") {
    val rnd = new scala.util.Random(11)
    // 8 tight clusters at far-apart corners: k=8 greedy k-center must
    // select exactly one point per cluster (any second pick from a
    // covered cluster is dominated by any point of an uncovered one)
    val vecs = for (c <- 0 until 8; i <- 0 until 10) yield {
      val base = Array.fill(64)(0.0f)
      base(c * 8) = 200.0f * (1 + c % 3)
      base((c * 8 + 4) % 64) += (if (c % 2 == 0) 150.0f else -150.0f)
      ((c * 10 + i).toLong, c,
        base.toSeq.map(_ + (rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = DedupSim.sampleKcenterOn(df, k = 8).collect()
    ScratchCache.releaseAll()
    assert(out.length == 8)
    assert(out.map(_.getAs[Int]("label")).distinct.length == 8,
      "one center per planted cluster")
    assert(out.head.getAs[Long]("sel_round") == 1L &&
      out.head.isNullAt(out.head.fieldIndex("d2_sel")))
    val radii = out.tail.map(_.getAs[Double]("d2_sel"))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"coverage radius must decrease: ${radii.toSeq}")
    val out2 = DedupSim.sampleKcenterOn(df.repartition(7), k = 8).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("pq adc: lookup-table search recalls the brute-force top-10 on " +
      "clustered vectors") {
    // 6 tight 64-dim clusters of 15: the query's true top-10 all sit
    // in its own cluster, and PQ codes separate clusters cleanly, so
    // ADC (which never touches the full vectors at query time) must
    // recover most of them. Bound mirrors the IVF recall floor (≥3).
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(6)(Array.fill(64)(rnd.nextGaussian() * 8))
    val vecs = (0 until 90).map { i =>
      val c = centers(i % 6)
      (i.toLong, 0,
        c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val adc = DedupSim.embPqAdcTopK(df, m = 4, k = 8, queryVecId = 0L,
        topK = 10).collect().map(_.getAs[Long]("vec_id")).toSet
    ScratchCache.releaseAll()
    val q = vecs(0)._3.map(_.toDouble).toArray
    val exact = vecs.drop(1).map { case (id, _, v) =>
      val d = v.map(_.toDouble).zip(q)
        .map { case (x, y) => (x - y) * (x - y) }.sum
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    assert(adc.size == 10)
    assert((adc & exact).size >= 3, s"recall ${(adc & exact).size}/10")
  }
}
