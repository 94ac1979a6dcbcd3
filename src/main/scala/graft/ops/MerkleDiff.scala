package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.parity.ParityData

/** Merkle-style bucketed reconciliation — the 100 TB refinement of the
  * reference's full-table diff (`/root/reference/src/main.rs:159-175`).
  *
  * The reference reconciles by walking EVERY source resource against EVERY
  * target row each night. At 100 TB that is a full-corpus full-outer join
  * per sync even when almost nothing changed. The anti-entropy pattern used
  * by replicated stores (Cassandra repair, DynamoDB): both sides first
  * aggregate a per-bucket fingerprint — O(rows) map-side work that shuffles
  * only `n_buckets` rows — compare fingerprints, and run the expensive
  * row-level diff ONLY over buckets whose fingerprints disagree. A nightly
  * sync where 0.1% of buckets are dirty then joins 0.1% of the data.
  *
  * The fingerprint must be order-insensitive (rows arrive in any partition
  * order), so it is a SUM of per-row digests — each digest an md5-derived
  * 32-bit integer over `resource_id:version_id`, summed into a long (no
  * overflow below ~2^31 rows per bucket). A version bump, insert, or delete
  * each perturbs the bucket sum; collisions need a pair of edits whose
  * digest deltas cancel within one bucket (~2^-32 per edit pair).
  *
  * Both the bucket id and the row digest come from `md5` hex — computed
  * identically by Spark and DuckDB, so the oracle runs the same algorithm.
  */
object MerkleDiff {

  private type Q = (SparkSession, String) => DataFrame

  /** Number of fingerprint buckets. Test-scale 32 keeps the oracle output
    * readable; a 100 TB deployment sizes this so a bucket's row-level
    * re-diff fits one executor's shuffle budget (e.g. 2^20 buckets).
    */
  val NumBuckets = 32

  private def bucketOf(id: Column): Column =
    (conv(substring(md5(id), 1, 2), 16, 10).cast("long") % NumBuckets)
      .as("bucket")

  /** Per-bucket fingerprint of a (resource_id, version_id) snapshot:
    * row count + order-insensitive digest sum. Entirely map-side until the
    * final `n_buckets`-row aggregate.
    */
  private[ops] def fingerprint(snapshot: DataFrame): DataFrame =
    snapshot.select(
      bucketOf(col("resource_id")),
      conv(substring(md5(concat_ws(":", col("resource_id"), col("version_id"))), 3, 8), 16, 10)
        .cast("long").as("rh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("rh").as("digest"))

  /** q105 — compare source and target fingerprints; emit every bucket with
    * both row counts and whether it is clean. The dirty buckets are the
    * only ones the row-level diff (q05) must visit.
    */
  private val q105: Q = (s, dir) => {
    val src = fingerprint(ParityData.source(s, dir))
      .select(col("bucket"), col("n").as("src_n"), col("digest").as("src_digest"))
    val tgt = fingerprint(ParityData.target(s, dir)
      .select("resource_id", "version_id"))
      .select(col("bucket"), col("n").as("tgt_n"), col("digest").as("tgt_digest"))
    src.join(tgt, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("src_n"), lit(0L)).as("src_n"),
        coalesce(col("tgt_n"), lit(0L)).as("tgt_n"),
        (coalesce(col("src_n"), lit(0L)) === coalesce(col("tgt_n"), lit(0L)) &&
          coalesce(col("src_digest"), lit(0L)) === coalesce(col("tgt_digest"), lit(0L)))
          .as("clean"))
      .orderBy("bucket")
  }

  private val q105Sql =
    s"""WITH ${ParityData.srcSql},
       |${ParityData.tgtSql},
       |sfp AS (
       |  SELECT ('0x'||substr(md5(resource_id),1,2))::BIGINT % $NumBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS src_n,
       |    CAST(sum(('0x'||substr(md5(resource_id || ':' || CAST(version_id AS VARCHAR)),3,8))::BIGINT) AS BIGINT) AS src_digest
       |  FROM src GROUP BY 1),
       |tfp AS (
       |  SELECT ('0x'||substr(md5(resource_id),1,2))::BIGINT % $NumBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS tgt_n,
       |    CAST(sum(('0x'||substr(md5(resource_id || ':' || CAST(version_id AS VARCHAR)),3,8))::BIGINT) AS BIGINT) AS tgt_digest
       |  FROM tgt GROUP BY 1)
       |SELECT coalesce(sfp.bucket, tfp.bucket) AS bucket,
       |  coalesce(src_n, 0) AS src_n,
       |  coalesce(tgt_n, 0) AS tgt_n,
       |  (coalesce(src_n, 0) = coalesce(tgt_n, 0)
       |    AND coalesce(src_digest, 0) = coalesce(tgt_digest, 0)) AS clean
       |FROM sfp FULL OUTER JOIN tfp ON sfp.bucket = tfp.bucket
       |ORDER BY bucket""".stripMargin

  val all: Map[String, Q] = Map("q105_bucket_diff" -> q105)

  val oracle: Map[String, String] = Map("q105_bucket_diff" -> q105Sql)
}
