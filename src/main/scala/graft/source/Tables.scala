package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test data (TESTDATA.md). Column
  * pruning and predicate pushdown into these scans is left to Catalyst —
  * callers select/filter declaratively and `.explain` shows `PushedFilters`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-robin repartition to the session's shuffle parallelism.
    *
    * The test tables are single parquet files with one row group, so a scan
    * is ONE task no matter how many cores exist; any compute-heavy map stage
    * (per-row md5s, JSON parse, cosine loops) downstream would run serially.
    * Spreading first costs one cheap shuffle of the narrow input and buys
    * full parallelism — the same call a real cluster needs whenever file
    * count < cores (common after compaction). Harmless where the input is
    * already wide: Catalyst still prunes columns through the exchange.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet`'s `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (which Spark's reader rejects; read
    * nanos as long and rebuild with integer `div`, not `/`: epoch-nanos
    * ≈ 1.7e18 exceeds the 2^53 double mantissa), then TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ). Normalize every
    * variant to a session-tz TimestampType column holding the same µs
    * instant; the session tz is pinned to UTC ([[graft.GraftSession]])
    * so the NTZ→TZ cast is value-preserving and `epoch_us`-compatible
    * with the DuckDB oracle, which reads the same file natively.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
