package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DedupSim, ScratchCache}

/** Dev probe: wall-time the kdQuantize chain alone (assignment count)
  * vs the same+cross candidate phases, to locate q_dedup_embcos'
  * serial floor. Usage: runMain graft.tools.KdqProbe <sfDir> <reps> */
object KdqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
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
    val k = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      DedupSim.kdQuantize(vecs, k).count()
      val t1 = System.nanoTime()
      ScratchCache.releaseAll()
      val parts = DedupSim.embCosParts(emb, Some(n))
      parts.same.count()
      val t2 = System.nanoTime()
      val nCross = parts.crossCand.count()
      val t3 = System.nanoTime()
      ScratchCache.releaseAll()
      println(f"rep$r kdq=${(t1 - t0) / 1e9}%.2fs same(cum)=${(t2 - t1) / 1e9}%.2fs cross=${(t3 - t2) / 1e9}%.2fs nCross=$nCross")
    }
    spark.stop()
  }
}
