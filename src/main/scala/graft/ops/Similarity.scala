package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Similarity search over the embedding column (LLM-pipeline north star).
  *
  * Cross-engine determinism: both Spark's `aggregate(zip_with(a,b,*),0D,+)`
  * and DuckDB's `list_dot_product` reduce left-to-right in double precision,
  * so after casting the float32 inputs to double the cosine values are
  * bit-identical — rounding to 6 decimals is belt-and-braces, not a fudge.
  *
  * Scale story per query:
  *  - q44 near-dup: label-blocked pair join (equi-join on the block key);
  *    at 100 TB the block key becomes an LSH bucket so block sizes stay
  *    bounded.
  *  - q45 brute-force top-k: the query set is broadcast, candidate scoring
  *    is map-side over the big table, and the per-query top-k is a
  *    TakeOrdered-style aggregation — the full similarity matrix is never
  *    materialized.
  *  - q46 LSH ANN: sign-bit bucketing (axis-aligned random hyperplanes)
  *    turns the cross join into an equi-join on the bucket id — the scale
  *    path when the query set is itself large.
  */
object Similarity {

  private type Q = (SparkSession, String) => DataFrame

  /** Double-cast vector column (float32 → float64 before any arithmetic,
    * matching the oracle's `embedding::DOUBLE[]`).
    */
  private val vd = "transform(embedding, x -> cast(x AS double))"

  /** The engine's native codegen'd expression (registered by
    * [[graft.plans.GraftExtensions]]); semantically identical to the
    * higher-order-function formulation
    * `aggregate(zip_with(a,b,(x,y)->x*y),0D,+) / (|a||b|)` but compiles to
    * one primitive loop (no per-element lambda dispatch).
    */
  private def cosExpr(a: String, b: String): String = s"cosine_sim($a, $b)"

  private val duckCos =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  /** q44 — embedding-cosine near-duplicates within label blocks. */
  private val q44: Q = (s, dir) => {
    val e = Tables.spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("label"), expr(vd).as("v"))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(expr(cosExpr("a.v", "b.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.35)
      .orderBy("vec_a", "vec_b")
  }

  private val q44Sql =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_a, vec_b, cos_sim FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         round($duckCos, 6) AS cos_sim
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) t
       |WHERE cos_sim >= 0.35
       |ORDER BY vec_a, vec_b""".stripMargin

  /** q45 — brute-force cosine top-k: 5 broadcast query vectors scored
    * against every row map-side; the per-query top-10 is a bounded
    * [[graft.functions.TopKByScore]] aggregation (partial+final), NOT a
    * ranking window — a window would shuffle every scored row to one
    * reducer per query, while the aggregator's map-side partials cap the
    * exchange at k rows per partition per query.
    */
  private val q45: Q = (s, dir) => {
    val topk = udaf(new graft.functions.TopKByScore(10))
    val e = Tables.spread(Tables.embeddings(s, dir)).select(col("vec_id"), expr(vd).as("v"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(expr(cosExpr("qv", "v")), 6).as("cos_sim"))
      .groupBy("query_id")
      .agg(topk(col("cos_sim"), col("vec_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.score").as("cos_sim"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val q45Sql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         round(list_dot_product(q.qv, e.v)
       |           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
       |           AS cos_sim
       |  FROM q JOIN e ON e.vec_id <> q.query_id)
       |SELECT query_id, vec_id, cos_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** q46 — LSH-bucketed ANN: bucket = sign bits of the first 4 dimensions
    * (16 buckets); candidates share the query's bucket; top-5 per query.
    * The cross join of q45 becomes an equi-join on `bucket`.
    */
  private val q46: Q = (s, dir) => {
    val topk = udaf(new graft.functions.TopKByScore(5))
    val bucketExpr =
      """array_join(transform(sequence(1,4), i ->
        |  IF(element_at(embedding, i) > 0, '1', '0')), '')""".stripMargin
    val e = Tables.spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), expr(vd).as("v"), expr(bucketExpr).as("bucket"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    e.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
        round(expr(cosExpr("qv", "v")), 6).as("cos_sim"))
      .groupBy("query_id")
      // bucket is group-constant (candidates share the query's bucket)
      .agg(topk(col("cos_sim"), col("vec_id")).as("tk"), max("bucket").as("bucket"))
      .select(col("query_id"), col("bucket"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("vec_id"), col("bucket"),
        col("col.score").as("cos_sim"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val q46Sql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |  list_aggregate(list_transform(generate_series(1,4), i ->
       |    CASE WHEN embedding[i] > 0 THEN '1' ELSE '0' END), 'string_agg', '')
       |    AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.bucket,
       |         round(list_dot_product(q.qv, e.v)
       |           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
       |           AS cos_sim
       |  FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id)
       |SELECT query_id, vec_id, bucket, cos_sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** q51 — per-label centroid via the typed [[graft.functions.VectorCentroid]]
    * `Aggregator` (partial+final aggregation: shuffle carries one
    * (sums, count) per label per map task, not the vectors).
    *
    * Output is exploded to one `(label, dim, mean)` row per dimension: the
    * verification harness compares sorted scalar columns, and an
    * `array<double>` column is unsortable on the oracle side. Numerically
    * this is the same centroid — just in long form.
    */
  private val q51: Q = (s, dir) => {
    val centroid = udaf(graft.functions.VectorCentroid)
    Tables.embeddings(s, dir)
      .groupBy("label")
      .agg(centroid(col("embedding")).as("raw"))
      .select(col("label"), posexplode(col("raw")))
      .select(col("label"), (col("pos") + 1).as("dim"), round(col("col"), 6).as("mean"))
      .orderBy("label", "dim")
  }

  private val q51Sql =
    """SELECT label, CAST(i AS INTEGER) AS dim, round(avg(embedding[i]::DOUBLE), 6) AS mean
      |FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
      |GROUP BY label, i ORDER BY label, dim""".stripMargin

  val all: Map[String, Q] = Map(
    "q44_embed_neardup" -> q44,
    "q45_simsearch_topk" -> q45,
    "q46_simsearch_lsh" -> q46,
    "q51_centroid_udaf" -> q51
  )

  val oracle: Map[String, String] = Map(
    "q44_embed_neardup" -> q44Sql,
    "q45_simsearch_topk" -> q45Sql,
    "q46_simsearch_lsh" -> q46Sql,
    "q51_centroid_udaf" -> q51Sql
  )
}
