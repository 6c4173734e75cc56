package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: the Verify-shaped cost of the four community keys with
  * the co-purchase EdgeMemo on vs off — the measured-win gate for
  * landing the shared edge build (VERDICT r15 #6).
  * Usage: runMain graft.tools.MemoProbe <sfDir> <reps> */
object MemoProbe {
  private val keys = Seq("q_graph_label_prop", "q_graph_modularity",
    "q_graph_louvain", "q_graph_louvain2")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up pass (codegen/tables), memo cleared after
    keys.foreach { k =>
      SparkEntry.queries(k)(spark, sfDir).count()
      graft.ops.ScratchCache.releaseAll()
    }
    graft.ops.EdgeMemo.clear()
    Seq(true, false).foreach { memo =>
      spark.conf.set("spark.graft.edges.memo", memo.toString)
      val ts = (1 to reps).map { _ =>
        graft.ops.EdgeMemo.clear()
        val t0 = System.nanoTime()
        keys.foreach { k =>
          SparkEntry.queries(k)(spark, sfDir).count()
          graft.ops.ScratchCache.releaseAll() // the Verify cadence
        }
        graft.ops.EdgeMemo.clear()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"memo=$memo 4-key pass min=${ts.min}%.2fs " +
        f"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
