package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state query timer — the dev companion to [[graft.Bench]] for
  * chasing scale regressions: `Probe <sfDir> <reps> <name> [name...]`
  * builds the same session Bench does, runs each named query once untimed
  * (JIT + code-cache warm), then `reps` timed passes with the shared
  * caches drained between passes, and prints per-query samples + median.
  * Bench's per-round numbers at a new scale factor mix cold JIT, cold
  * page cache and phase noise into single samples; regressions should be
  * confirmed here (3+ reps, medians) before being chased.
  *
  * A single query name also prints its `explain("formatted")` plan before
  * timing (the plan-audit mode). `SPARK_GRAFT_PROBE_NODRAIN=1` skips the
  * between-rep cache drain: reps then measure the steady state a
  * long-lived composed session would see (shared relations stay primed)
  * instead of the drained per-query Bench protocol.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || args(1).toIntOption.forall(_ < 1)) {
      System.err.println("usage: Probe <sfDir> <reps>=1 <name> [name...]")
      sys.exit(64)
    }
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val drain = !sys.env.get("SPARK_GRAFT_PROBE_NODRAIN").contains("1")
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
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, sfDir).count()
              finally if (drain) graft.util.QueryCaches.drain()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // Upper median for odd reps; mean of the two middle samples for even.
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    if (names.size == 1)
      graft.SparkEntry.queries(names.head)(spark, sfDir).explain("formatted")
    names.foreach { n =>
      once(n) // warmup
      val rs = (1 to reps).map(_ => once(n))
      val ts = rs.map(_._1)
      println(f"[probe] $n%-28s median=${median(ts)}%8.3f s  rows=${rs.head._2}  samples=${
        ts.map(t => f"$t%.3f").mkString(", ")}" + (if (drain) "" else " (nodrain)"))
    }
    graft.Bench.calibrateOnce(spark) // probe JIT warm
    val calib = median((1 to 3).map(_ => graft.Bench.calibrateOnce(spark)))
    println(f"[probe] calib: $calib%.3f s")
    spark.stop()
  }
}
