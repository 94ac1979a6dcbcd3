package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for named declared queries to
  * files — the r13 plan evidence (`plans/r13/<query>_<tag>.txt`). Usage:
  * `PlanDump <sfDir> <outDir> <tag> <name> [name...]`. Queries whose
  * builders run driver loops execute those loops while the DataFrame is
  * constructed; the dumped plan is the final assembled plan the caller's
  * action runs, which is exactly what the evidence needs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, outDir, tag, rest @ _*) = args.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    rest.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      graft.util.QueryCaches.drain()
      println(s"[plandump] wrote ${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
