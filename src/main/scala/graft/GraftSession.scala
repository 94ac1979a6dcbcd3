package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory for the graft engine.
  *
  * Tuned for the test rig (single JVM, `local[32]`) but every setting is the
  * one we would ship to a 1000-executor cluster too: AQE re-plans shuffles at
  * runtime (skew joins, coalescing), shuffle partitions sized to the
  * parallelism at hand rather than the 200 default, UTC everywhere.
  */
object GraftSession {
  /** r13 note — `InferFiltersFromGenerate` was excluded session-wide for
    * one batch and then RE-ENABLED. The rule copies an explode's
    * generator expression into an inferred `size(e) > 0` filter; filter
    * pushdown can carry that copy through projections below (re-inlining
    * `words = split(text)` into every element access — O(len²)/row,
    * interpreted) and park it under the spread exchange in a 1-task scan
    * stage — measured 6.9 s → 0.34 s on the lexical postings build with
    * the rule off. But the same inferred filters are load-bearing
    * elsewhere: q43's prefix-join pipeline ran ~2× slower AT sf1 without
    * them (66 s → 105 s whole-suite, 95 s → 163 s A/B). The durable fix
    * is structural: persist the array-producing relation before exploding
    * it when the array expression is expensive (the cache is a pushdown
    * barrier), as [[graft.ops.Retrieval.lexicalTop]] and q299 now do.
    */
  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
