package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.source.Tables

/** Corpus-level LLM-pipeline analytics: TF-IDF term weighting, gap-based
  * sessionization (the window-function twin of q33's `session_window`),
  * keep-best duplicate resolution, and int8 scalar quantization of
  * embeddings — the operators a pre-training data pipeline runs between
  * raw ingest and dedup/filtering.
  *
  * Determinism rules (cross-engine hash-match): all money/size reductions
  * on exact integers; float derivations either bit-identical (same IEEE
  * op sequence on both engines) or integer-quantized BEFORE any
  * accumulation whose order differs between engines.
  */
object Corpus {

  private type Q = (SparkSession, String) => DataFrame

  /** q70 — TF-IDF: per-(doc, term) frequency, per-term document frequency,
    * and the smoothed idf product. Two aggregations + one equi-join on
    * `term`: tf is persisted because both the df aggregate and the final
    * join consume it (one scan, not two). The term join is deliberately
    * NOT broadcast-hinted — natural-language vocabulary is unbounded at
    * 100 TB, so the shuffle-on-term hash join (AQE may still broadcast a
    * small vocab at runtime) is the plan that survives scale-up; only the
    * 1-row corpus count is broadcast.
    */
  private val q70: Q = (s, dir) => {
    val docs = Tables.spread(Tables.documents(s, dir))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    val dfRel = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.filter(col("tf") >= 3)
      .join(dfRel, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df_docs"),
        round(col("tf").cast("double") *
          log((col("n_docs") + 1).cast("double") / (col("df_docs") + 1)), 4)
          .as("tfidf"))
      .orderBy("doc_id", "term")
  }

  private val q70Sql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
      |           FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
      |  CAST(df.df_docs AS BIGINT) AS df_docs,
      |  round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df_docs + 1)), 4)
      |    AS tfidf
      |FROM tf JOIN df USING (term), n
      |WHERE tf.tf >= 3
      |ORDER BY doc_id, term""".stripMargin

  /** q71 — gap sessionization, gaps-and-islands form: lag to flag session
    * breaks (>= 45 min), running sum to number sessions, then a grouped
    * aggregate. One shuffle on `user_id`; the two windows and the final
    * aggregate all reuse that clustering. This is the batch-analytics
    * formulation; q33 is the same semantics through the
    * streaming-compatible `session_window` operator. All outputs exact
    * integers (event counts, cents, epoch-µs spans).
    */
  private val q71: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 45L * 60 * 1000000
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_s",
        when(lag("us", 1).over(w).isNull ||
          col("us") - lag("us", 1).over(w) >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"),
        (max("us") - min("us")).as("duration_us"))
      .orderBy("user_id", "sid")
  }

  private val q71Sql =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(floor(value*100) AS BIGINT) AS cents,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 45 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
      |        ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |      FROM o)
      |SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  /** q72 — keep-best duplicate resolution: for each exact-duplicate group
    * (md5 digest), keep the doc with the most characters, ties to the
    * lowest doc_id — `max_by` over a (n_chars, -doc_id) struct. One
    * partial+final aggregate carrying one struct per group per partition;
    * the window alternative (row_number over digest) would sort every
    * group's rows. This is the selection step that follows q40's exact
    * dedup: q40 finds the groups, q72 decides which row survives.
    */
  private val q72: Q = (s, dir) =>
    Tables.spread(Tables.documents(s, dir))
      .withColumn("digest", md5(col("text")))
      .groupBy("digest")
      .agg(
        max_by(col("doc_id"),
          struct(col("n_chars"), (col("doc_id") * -1).as("nk"))).as("keep_doc"),
        count(lit(1)).as("n_dups"),
        max("n_chars").as("best_chars"))
      .orderBy("digest")

  private val q72Sql =
    """WITH d AS (SELECT md5(text) AS digest, doc_id, n_chars FROM documents),
      |c AS (SELECT digest, CAST(count(*) AS BIGINT) AS n_dups,
      |             max(n_chars) AS best_chars
      |      FROM d GROUP BY 1)
      |SELECT c.digest, CAST(min(d.doc_id) AS BIGINT) AS keep_doc, c.n_dups,
      |       c.best_chars
      |FROM d JOIN c ON d.digest = c.digest AND d.n_chars = c.best_chars
      |GROUP BY c.digest, c.n_dups, c.best_chars
      |ORDER BY c.digest""".stripMargin

  /** q74 — int8 scalar quantization error audit: per vector, min/max →
    * 255-step scale → round-trip each element → absolute reconstruction
    * error, integer-quantized to 1e-7 units PER ELEMENT (before any
    * cross-row accumulation, so engine-dependent summation order cannot
    * perturb the result), then summed per label. Entirely map-side until
    * the tiny per-label aggregate — the audit pass that decides whether
    * int8 storage (4× smaller scans at 100 TB) is acceptable for an
    * embedding corpus.
    */
  private val q74: Q = (s, dir) =>
    Tables.spread(Tables.embeddings(s, dir))
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("hi", array_max(col("v")))
      .withColumn("scale", (col("hi") - col("lo")) / 255)
      .withColumn("err_units", expr(
        """aggregate(v, CAST(0 AS BIGINT), (acc, x) ->
          |  acc + CAST(round(abs(x - (lo + round((x - lo) / scale) * scale))
          |             * 1e7) AS BIGINT))""".stripMargin))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum("err_units").as("sum_err_units"))
      .orderBy("label")

  private val q74Sql =
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
      |b AS (SELECT label, v, list_min(v) AS lo, list_max(v) AS hi FROM e),
      |c AS (SELECT label, CAST(list_sum(list_transform(v, x ->
      |    CAST(round(abs(x - (lo + round((x - lo) / ((hi - lo) / 255))
      |               * ((hi - lo) / 255))) * 1e7) AS BIGINT)))
      |  AS BIGINT) AS err_units
      |  FROM b)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(err_units) AS BIGINT) AS sum_err_units
      |FROM c GROUP BY label ORDER BY label""".stripMargin

  val all: Map[String, Q] = Map(
    "q70_tfidf" -> q70,
    "q71_sessionize_gap" -> q71,
    "q72_dedup_keep_best" -> q72,
    "q74_embed_quantize" -> q74
  )

  val oracle: Map[String, String] = Map(
    "q70_tfidf" -> q70Sql,
    "q71_sessionize_gap" -> q71Sql,
    "q72_dedup_keep_best" -> q72Sql,
    "q74_embed_quantize" -> q74Sql
  )
}
