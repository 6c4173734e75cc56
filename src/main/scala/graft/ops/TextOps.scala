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

  /** q_text_tfidf — tf × ln(N/df), top-5 terms for doc_id < 10. The
    * ranking orders by the ROUNDED score (ties broken by term) so a
    * 1-ulp ln() divergence between engines cannot flip ranks. */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = tokens(s, d)
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nd = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
    val scored = tf.filter(col("doc_id") < 10)
      .join(df, "term")
      .crossJoin(broadcast(nd))
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
