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
    // Headless substitute for the Spark UI's Jobs/Stages pages: count the
    // jobs, stages, and tasks each run schedules and sum executor task
    // time. jobs×fixed-scheduling-cost dominating wall-clock identifies
    // an action-heavy driver loop; task time ≈ wall×cores identifies
    // genuine compute.
    val counters = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val stages = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val timeline = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var lastEnd = 0L
      val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(j.jobId, j.time)
        val desc = j.stageInfos.map(s =>
          s"${s.stageId}:${s.name.takeWhile(_ != '\n').take(40)}(${s.numTasks}t)")
          .mkString(" ")
        names.put(j.jobId, desc.take(180))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.remove(j.jobId)).getOrElse(j.time)
        val gap = if (lastEnd == 0) 0 else t0 - lastEnd
        lastEnd = j.time
        timeline.add(f"job ${j.jobId}%4d  run=${(j.time - t0) / 1e3}%6.2fs  gapBefore=${gap / 1e3}%6.2fs  ${
          Option(names.remove(j.jobId)).getOrElse("")}")
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m != null)
          timeline.add(f"stage ${i.stageId}%4d  ${i.numTasks}%4dt  exec=${
            m.executorRunTime / 1e3}%7.2fs  in=${m.inputMetrics.recordsRead}%9d  shR=${
            m.shuffleReadMetrics.recordsRead}%9d  shW=${
            m.shuffleWriteMetrics.recordsWritten}%9d  out=${m.outputMetrics.recordsWritten}%7d")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
      def snap(): (Long, Long, Long, Long) =
        (jobs.get, stages.get, tasks.get, taskMs.get)
    }
    spark.sparkContext.addSparkListener(counters)
    def once(name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, sfDir).count()
              finally if (drain) graft.util.QueryCaches.drain()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def onceCounted(name: String): (Double, Long) = {
      val before = counters.snap()
      counters.timeline.clear()
      counters.lastEnd = 0L
      val r = once(name)
      // listener bus is async; give it a beat to drain before snapping
      Thread.sleep(200)
      val after = counters.snap()
      println(f"[probe]   $name: jobs=${after._1 - before._1} stages=${
        after._2 - before._2} tasks=${after._3 - before._3} taskTime=${
        (after._4 - before._4) / 1e3}%.1f s")
      if (sys.env.get("SPARK_GRAFT_PROBE_TIMELINE").contains("1")) {
        val it = counters.timeline.iterator()
        while (it.hasNext) println(s"[probe]     ${it.next()}")
      }
      r
    }
    // Upper median for odd reps; mean of the two middle samples for even.
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    if (names.size == 1)
      graft.SparkEntry.queries(names.head)(spark, sfDir).explain("formatted")
    val counted = sys.env.get("SPARK_GRAFT_PROBE_COUNT").contains("1")
    names.foreach { n =>
      once(n) // warmup
      val rs = (1 to reps).map(_ => if (counted) onceCounted(n) else once(n))
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
