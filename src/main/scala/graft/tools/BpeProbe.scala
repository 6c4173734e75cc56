package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe (r16 verdict ask #5): decompose q_text_bpe_pairs' cost —
  * corpus chars, total adjacent-pair OCCURRENCES (the map-side row
  * count, expected linear in corpus) vs DISTINCT pair keys (the
  * reduce-side keyspace, expected ~alphabet²-bounded) — to adjudicate
  * whether the 10× wall growth is the healthy linear scan or a
  * keyspace blow-up needing a min-frequency gate.
  * Usage: runMain graft.tools.BpeProbe <sfDir> [sfDir...] */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val pairs = Tables.documents(spark, d)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
          .as("pair"))
      val row = pairs.agg(count(lit(1)).as("occurrences"),
        countDistinct(col("pair")).as("distinct_pairs")).head()
      val chars = Tables.documents(spark, d)
        .agg(sum(length(col("text")))).head().getLong(0)
      println(s"$d chars=$chars pairOccurrences=${row.getLong(0)} " +
        s"distinctPairs=${row.getLong(1)}")
      graft.ops.ScratchCache.releaseAll()
    }
    spark.stop()
  }
}
