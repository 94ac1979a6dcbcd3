package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Multimodal-column plumbing (LLM-pipeline north star): media as opaque
  * `binary` columns + typed metadata, with the decode / feature-extract
  * step as a per-partition batch operator.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`: metadata derived from
  * the payload digest). Everything around it is the real scale design:
  *  - payloads travel as `BinaryType` columns (Tungsten keeps them
  *    off-heap; Parquet stores them as BYTE_ARRAY with page compression);
  *  - decode runs via `mapPartitions` so any native library would be
  *    initialized once per partition, not per row (the Scala analogue of
  *    `mapInPandas` batches);
  *  - partitioning is explicit: repartition by a key hash before decode so
  *    a 100 TB media table spreads evenly and no partition exceeds
  *    executor memory with decoded buffers.
  */
object Multimodal {

  private type Q = (SparkSession, String) => DataFrame

  /** Typed metadata row produced by the (stubbed) decoder. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, digest: String,
                       width: Int, height: Int, format: String)

  /** STUB decode: real systems would decode image bytes here (JPEG/PNG →
    * dims, pixels); this container has no codecs, so dims/format are
    * derived deterministically from the md5 digest. The operator shape —
    * binary in, typed struct out, batch-per-partition — is the real thing.
    */
  def decodeStub(payloads: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // One digest instance per partition — stands in for per-partition
      // codec/library initialization (the expensive part in real decoders).
      val md = MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        val w = Integer.parseInt(hex.substring(0, 4), 16) % 1024
        val h = Integer.parseInt(hex.substring(4, 8), 16) % 1024
        // Hex-VALUE parity ('a'=10 → even), not ASCII-char parity — must
        // agree with q50's `conv(substring(md5, 9, 1), 16, 10) % 2`.
        val fmt = if (Integer.parseInt(hex.substring(8, 9), 16) % 2 == 0) "jpeg" else "png"
        MediaMeta(id, bytes.length.toLong, hex, w, h, fmt)
      }
    }
  }

  /** q50 — the SQL-expressible face of the pipeline: documents.text bytes
    * as the opaque payload, metadata extracted per row. Matches
    * [[decodeStub]] bit-for-bit (same md5-derived fields), so the oracle
    * also validates the stub's arithmetic.
    */
  private val q50: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(col("doc_id")) // explicit spread before "decode"
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("int") % 1024).as("width"),
        (conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("int") % 1024).as("height"),
        when(expr("conv(substring(md5(payload), 9, 1), 16, 10) % 2 = 0"), "jpeg")
          .otherwise("png").as("format"))
      .orderBy("doc_id")

  private val q50Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1024 AS width,
      |  CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 1024 AS height,
      |  CASE WHEN CAST(('0x' || substr(md5(text), 9, 1)) AS INTEGER) % 2 = 0
      |       THEN 'jpeg' ELSE 'png' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q58 — frame sampling over binary payloads: the video/audio analogue
    * of q50's image decode. Each payload is sliced into fixed 64-byte
    * "frames", the first 4 sampled per document (a real pipeline samples
    * keyframes; the sampling DATAFLOW — generator over byte slices,
    * per-frame digest, deterministic frame index — is what's under test).
    * `substring` on BinaryType slices bytes inside codegen; the explode is
    * a Generator, so the whole op pipelines in one stage over the scan.
    */
  private val q58: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(col("doc_id")) // explicit spread before frame extraction
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 3), f -> substring(payload, f*64 + 1, 64))")))
      .filter(length(col("col")) > 0) // drop empty tail frames
      .select(col("doc_id"), col("pos").as("frame_idx"),
        length(col("col")).as("frame_len"), md5(col("col")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  private val q58Sql =
    """SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |  CAST(length(substr(text, f*64 + 1, 64)) AS INTEGER) AS frame_len,
      |  md5(substr(text, f*64 + 1, 64)) AS frame_md5
      |FROM documents, unnest(generate_series(0, 3)) AS t(f)
      |WHERE length(substr(text, f*64 + 1, 64)) > 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  val all: Map[String, Q] = Map(
    "q50_multimodal_meta" -> q50,
    "q58_frame_sample" -> q58)
  val oracle: Map[String, String] = Map(
    "q50_multimodal_meta" -> q50Sql,
    "q58_frame_sample" -> q58Sql)
}
