package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Dev-only: stage-by-stage timing of the q43 PPJoin pipeline at a given
  * SF, to attribute its bench cost before optimizing the wrong stage.
  * Usage: `sbt "Test/runMain graft.tools.Q43Breakdown /root/testdata/sf0.1"`
  */
object Q43Breakdown {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q43] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"--- pass $rep ---")
      val t = 0.1
      val blocked = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / 100).cast("long").as("lb"),
          expr("transform(array_distinct(CASE WHEN size(split(text,' ')) < 2 " +
            "THEN array() ELSE transform(sequence(1, size(split(text,' '))-1), " +
            "i -> concat(element_at(split(text,' '), i), ' ', " +
            "element_at(split(text,' '), i+1))) END), " +
            "s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint))").as("sh"))
        .persist()
      time("1 blocked shingle arrays")(blocked.count())
      // variant: md5 once per WORD, bigram hash = arithmetic combine of
      // adjacent word hashes (h1 % 2^39 * 8388593 + h2 < 2^63: no overflow
      // in either engine) — halves the bytes md5 must digest.
      val blockedB = Tables.spread(Tables.documents(spark, dir))
        .withColumn("wh", expr("transform(split(text, ' '), " +
          "w -> cast(conv(substring(md5(w),1,15),16,10) AS bigint))"))
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / 100).cast("long").as("lb"),
          expr("array_distinct(CASE WHEN size(wh) < 2 THEN array() ELSE " +
            "transform(sequence(1, size(wh)-1), " +
            "i -> element_at(wh, i) % 549755813888 * 8388593 " +
            "+ element_at(wh, i+1)) END)").as("sh"))
        .persist()
      time("1b blocked via word-hash combine")(blockedB.count())
      blockedB.unpersist()
      val tok = blocked.select(col("doc_id"), col("lang"), col("lb"),
        size(col("sh")).as("n"), explode(col("sh")).as("shingle")).persist()
      time("2 token explode")(tok.count())
      val dfreq = tok.groupBy("shingle").agg(count(lit(1)).as("df")).persist()
      time("3 dfreq groupBy")(dfreq.count())
      val prefix = tok.join(dfreq, "shingle")
        .groupBy(col("doc_id"), col("lang"), col("lb"), col("n"))
        .agg(collect_list(struct(col("df"), col("shingle"))).as("ds"))
        .select(col("doc_id"), col("lang"), col("lb"),
          explode(expr(s"slice(array_sort(ds), 1, CAST(n - ceil(n * $t) + 1 AS INT))")).as("p"))
        .select(col("doc_id"), col("lang"), col("lb"), col("p.shingle").as("shingle"))
        .persist()
      time("4 prefix agg")(prefix.count())
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().persist()
      time("5 candidate self-join+distinct")(cand.count())
      val inter = size(array_intersect(col("sha"), col("shb")))
      val verified = cand
        .join(blocked.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(blocked.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(inter.cast("double") /
            (size(col("sha")) + size(col("shb")) - inter), 4).as("jaccard"))
        .filter(col("jaccard") >= t).persist()
      time("6 verify")(verified.count())
      time("7 final sort")(verified.orderBy("doc_a", "doc_b").count())
      Seq(blocked, tok, dfreq, prefix, cand, verified).foreach(_.unpersist())
    }
    spark.stop()
  }
}
