package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.ops.{DedupSim, ScratchCache}

/** Dev probe (r17 verdict ask #5): the exact-Jaccard dedup family's
  * stage volumes per scale — distinct gram rows, prefix-index rows,
  * candidate pairs, verified pairs — so the prefix-filter bound is a
  * measured count, not a plan-reading claim. One line per (scale, op).
  * Usage: runMain graft.tools.DedupProbe <sfDir> [<sfDir> ...]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { d =>
      val docs = Tables.documents(spark, d)
      val nDocs = docs.count()
      Seq(
        ("ngram", () => DedupSim.ngramStages(docs),
          () => DedupSim.dedupNgramOn(docs)),
        ("contain", () => DedupSim.containStages(docs),
          () => DedupSim.dedupContainOn(docs))
      ).foreach { case (op, stages, full) =>
        val st = stages()
        val g = st.grams.count()
        val p = st.prefix.count()
        val c = st.cands.count()
        val v = full().count()
        ScratchCache.releaseAll()
        println(f"$d%-28s $op%-8s docs=$nDocs%7d grams=$g%9d " +
          f"prefix=$p%9d cands=$c%9d verified=$v%7d " +
          f"candsPerDoc=${c.toDouble / nDocs}%8.2f")
      }
    }
    spark.stop()
  }
}
