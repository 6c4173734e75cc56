package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DedupSim, ScratchCache}

/** Dev probe: decompose q_dedup_embcos' candidate volume at a given
  * sfDir — same-list seed pair count and surviving projection-band
  * cross pair count — to target the pruning work where the time
  * actually goes. Usage: runMain graft.tools.EmbCosProbe <sfDir> */
object EmbCosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val parts = DedupSim.embCosParts(emb, Some(n))
    val k = parts.assigned.select(col("list_id")).distinct().count()
    val samePairs = parts.same.count()
    val crossPairs = parts.crossCand.count()
    println(s"N=$n k=$k samePairs=$samePairs crossBandPairs=$crossPairs")
    ScratchCache.releaseAll()
    spark.stop()
  }
}
