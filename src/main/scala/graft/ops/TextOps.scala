package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis surface (SURVEY.md §2.9, north-star additions): token
  * statistics over the documents table. All counts are integers and all
  * floats are rounded post-exact-arithmetic, so every query here is
  * oracle-checked.
  */
object TextOps {
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
  def fingerprint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        posexplode(split(lower(col("text")), " ")))
      .select(col("doc_id"), col("source"), col("pos"), col("col").as("t0"),
        lead(col("col"), 1).over(w).as("t1"),
        lead(col("col"), 2).over(w).as("t2"),
        lead(col("col"), 3).over(w).as("t3"),
        lead(col("col"), 4).over(w).as("t4"))
      .filter(col("t4").isNotNull)
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", col("t0"), col("t1"), col("t2"),
          col("t3"), col("t4"))).as("h"))
      .groupBy(col("doc_id"), col("source"))
      .agg(min(col("h")).as("fp"))
      .orderBy(col("doc_id"))
  }

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
}
