package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only decomposition timer: times named sub-relations of composed
  * pipelines one at a time (drained between), so a slow composed query can
  * be attributed to the stage that owns the time. Not part of the driver
  * contract; never run by the bench.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    // ad-hoc conf experiments: SPARK_GRAFT_SCRATCH_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_SCRATCH_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[scratch] conf $k=$v")
    })

    def time(name: String)(df: => DataFrame): Unit = {
      // warm
      df.write.format("noop").mode("overwrite").save()
      graft.util.QueryCaches.drain()
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.util.QueryCaches.drain()
      println(f"[scratch] $name%-28s $t%8.3f s")
    }

    import org.apache.spark.sql.functions._
    import graft.source.Tables
    val topkL = udaf(new graft.functions.TopKByScore(20))
    def sets = graft.ops.TextDedup.shingleSetsFor(
      Tables.spread(Tables.documents(spark, sfDir)))
    def post = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    def qp = graft.ops.TextDedup.shingleSetsFor(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 5))
      .select(col("doc_id").as("query_id"), explode(col("sh")).as("g"))
    def joined = post.join(broadcast(qp), Seq("g"))
      .filter(col("doc_id") =!= col("query_id"))
    def shared = joined.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("shared"))
    def topped = shared.groupBy("query_id")
      .agg(topkL(col("shared").cast("double"), col("doc_id")).as("tk"))

    def q(name: String) = time(name)(graft.SparkEntry.queries(name)(spark, sfDir))
    sys.env.get("SPARK_GRAFT_SCRATCH_Q").foreach(_.split(",").foreach(q))
    spark.stop()
  }
}
