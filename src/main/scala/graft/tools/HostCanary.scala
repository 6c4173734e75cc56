package graft.tools

/** Dev probe: a FIXED pure-JVM workload (no Spark, no IO) timed
  * single-threaded and at 32 threads, so a bench window's host speed
  * is a recorded number instead of an inference from binary A/Bs.
  * Run it immediately before/after each bench window; if the canary
  * moves, the window moved — adjudication done. The workload is a
  * xorshift-mix loop sized ~2s on a healthy host; results print as
  * Mops/s (higher = faster host).
  * Usage: runMain graft.tools.HostCanary [reps]
  */
object HostCanary {
  private def mixLoop(n: Long, seed: Long): Long = {
    var x = seed; var i = 0L
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val perThread = 400000000L // ~1-2 s single-thread on a healthy core
    // warm-up
    mixLoop(perThread / 4, 42L)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val s1 = mixLoop(perThread, 42L + r)
      val single = perThread.toDouble / (System.nanoTime() - t0) * 1e3
      val threads = 32
      val t1 = System.nanoTime()
      val pool = (0 until threads).map { t =>
        val th = new Thread(() => { mixLoop(perThread, 1000L * t + r); () })
        th.start(); th
      }
      pool.foreach(_.join())
      val multi =
        perThread.toDouble * threads / (System.nanoTime() - t1) * 1e3
      println(f"rep$r single=${single}%8.1f Mops/s  " +
        f"x32=${multi}%8.1f Mops/s  (checksum ${s1 & 0xff})")
    }
  }
}
