package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe: run one named query N times against a sf dir.
  * Usage: runMain graft.Probe <name> <sfDir> [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (GramPostings) must never land in the repo cwd
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_DRAIN=1 replicates the Bench protocol: caches are
    // drained between reps, so every rep re-pays persist/checkpoint builds
    // (what the round driver measures). Without it, reps 2+ are the
    // steady-state number a long-lived session would see.
    val drain = sys.env.get("SPARK_GRAFT_PROBE_DRAIN").contains("1")
    // comma-separated names time a set (explain printed only for a single)
    val names = name.split(',').toSeq
    if (names.size == 1) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"[probe] $n rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows" +
          (if (drain) " (drained)" else ""))
        if (drain) graft.util.QueryCaches.drain()
      }
      println(f"[probe] calib: ${Bench.calibrateOnce(spark)}%.3f s")
    }
    spark.stop()
  }
}
