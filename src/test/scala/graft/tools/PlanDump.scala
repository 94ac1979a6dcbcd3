package graft.tools

import graft.{SparkEntry, SparkTestSession}

/** Debug aid: `sbt "Test/runMain graft.tools.PlanDump q23_groupby_agg"`
  * prints the executed-plan text the PlanSpec regexes run against.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
