package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state single-query timer — the dev companion to [[graft.Bench]]
  * for chasing scale regressions: `Probe <sfDir> <reps> <name> [name...]`
  * builds the same session Bench does, runs each named query once untimed
  * (JIT + code-cache warm), then `reps` timed passes with the shared
  * caches drained between passes, and prints per-query samples + median.
  * Bench's per-round numbers at a new scale factor mix cold JIT, cold
  * page cache and phase noise into single samples; regressions should be
  * confirmed here (3+ reps, medians) before being chased.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, sfDir).count()
              finally graft.util.QueryCaches.drain()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    names.foreach { n =>
      once(n) // warmup
      val rs = (1 to reps).map(_ => once(n))
      val ts = rs.map(_._1)
      val med = ts.sorted.apply(reps / 2)
      println(f"[probe] $n%-28s median=$med%8.3f s  rows=${rs.head._2}  samples=${
        ts.map(t => f"$t%.3f").mkString(", ")}")
    }
    spark.stop()
  }
}
