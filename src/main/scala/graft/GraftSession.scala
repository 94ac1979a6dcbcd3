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
  /** Optimizer rules every graft session excludes (r13 measurement,
    * guide §1.2 step 1 / §7.2): `InferFiltersFromGenerate` copies the
    * GENERATOR EXPRESSION of an explode into an inferred
    * `size(e) > 0 AND isnotnull(e)` filter. Filter pushdown then carries
    * that copy through the projections below — inlining each projected
    * column into every reference, so a `words = split(text)` feeding a
    * k-shingle transform re-splits the text once per element access
    * (O(len²) per row), interpreted (higher-order functions have no
    * codegen) — and parks it BELOW the spread exchange, i.e. in the
    * 1-task scan stage of a single-file table. Measured on the lexical
    * postings build at sf0.1: explode 6.9 s → 0.34 s with the rule off.
    * The inferred filter is redundant for semantics (explode of an empty
    * or null array emits no rows), so excluding it cannot change any
    * result; the same recompute-per-row blowup applies at any scale.
    */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
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
