package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Mergeable frequency sketches beyond the HLL family (q273) and the
  * deterministic Misra–Gries heavy-hitter aggregator (q171): the
  * count–min sketch (Cormode–Muthukrishnan, J. Algorithms '05).
  *
  * Why it matters at 100 TB: a CM sketch is a fixed-size (d×w integer
  * grid) linear projection of the frequency vector, so per-partition
  * sketches combine by cell-wise ADDITION — the exact shape Spark's
  * partial aggregation pipeline wants (map-side partials, one tiny
  * reduce), and the only frequency structure that also supports deletes
  * and sliding merges in a streaming compaction. The corpus-scale
  * token-frequency table itself may not fit anywhere; the sketch always
  * does.
  */
object Sketches {

  private type Q = (SparkSession, String) => DataFrame

  private val D = 4     // hash rows
  private val W = 1024  // cells per row

  /** 32-bit md5-prefix hash of `j:tok`, reduced mod W — evaluated with
    * the identical byte string in both engines. */
  private def cellExpr(tokCol: String): String =
    s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', $tokCol)), 1, 8), 16, 10) AS BIGINT) % $W"

  /** q283 — count–min sketch over the corpus token stream, audited
    * against exact counts.
    *
    * Dataflow: (1) exact per-token counts (one shuffle, map-side
    * partials); (2) each token fans out to its D=4 (row, cell) slots and
    * the 4×1024 cell grid aggregates `sum(count)` — algebraically
    * identical to sketching the raw stream, but the fan-out runs on the
    * DISTINCT-token relation (vocabulary-sized, not corpus-sized);
    * (3) the point-query audit takes the exact top-30 tokens
    * (TakeOrderedAndProject — never a global sort) and probes the
    * broadcast sketch: est = min over the 4 rows, which can only
    * OVER-estimate (`over_est` ≥ 0 is the CM invariant, pinned in the
    * spec).
    * `over_ppm` = overestimate per million stream tokens; the classic
    * guarantee is over ≤ e·N/W with prob 1−e⁻⁴ per query.
    * All arithmetic is BIGINT-exact; no floats anywhere.
    */
  private val q283: Q = (s, dir) => {
    val toks = Tables.spread(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("tok"))
    val cnts = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val js = array((0 until D).map(lit): _*)
    val sketch = cnts
      .select(col("exact"), explode(js).as("j"),
        expr(cellExpr("tok")).as("cell"))
      .groupBy("j", "cell").agg(sum("exact").as("v"))
    val n = cnts.agg(sum("exact").as("n_stream"))
    cnts.orderBy(col("exact").desc, col("tok")).limit(30)
      .select(col("tok"), col("exact"), explode(js).as("j"))
      .withColumn("cell", expr(cellExpr("tok")))
      .join(broadcast(sketch), Seq("j", "cell"))
      .groupBy("tok", "exact").agg(min("v").as("est"))
      .withColumn("over_est", col("est") - col("exact"))
      .crossJoin(broadcast(n))
      .withColumn("over_ppm", expr("over_est * 1000000L div n_stream"))
      .select("tok", "exact", "est", "over_est", "over_ppm", "n_stream")
      .orderBy(col("exact").desc, col("tok"))
  }

  private val q283Sql =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |cnts AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact
       |         FROM toks GROUP BY tok),
       |fan AS (SELECT tok, exact, unnest([0, 1, 2, 3]) AS j FROM cnts),
       |hashed AS (SELECT tok, exact, j,
       |    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % $W AS cell
       |  FROM fan),
       |sketch AS (SELECT j, cell, CAST(sum(exact) AS BIGINT) AS v
       |           FROM hashed GROUP BY j, cell),
       |n AS (SELECT CAST(sum(exact) AS BIGINT) AS n_stream FROM cnts),
       |top AS (SELECT tok, exact FROM cnts ORDER BY exact DESC, tok LIMIT 30),
       |probe AS (SELECT t.tok, t.exact, h.j,
       |    ('0x' || substr(md5(CAST(h.j AS VARCHAR) || ':' || t.tok), 1, 8))::BIGINT % $W AS cell
       |  FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) h),
       |est AS (SELECT p.tok, p.exact, CAST(min(s.v) AS BIGINT) AS est
       |  FROM probe p JOIN sketch s ON s.j = p.j AND s.cell = p.cell
       |  GROUP BY p.tok, p.exact)
       |SELECT e.tok, e.exact, e.est, e.est - e.exact AS over_est,
       |  CAST((e.est - e.exact) * 1000000 // n.n_stream AS BIGINT) AS over_ppm,
       |  n.n_stream
       |FROM est e CROSS JOIN n
       |ORDER BY e.exact DESC, e.tok""".stripMargin

  /** q316 — KMV (k-minimum-values) distinct-count and overlap sketch
    * (Beyer et al., SIGMOD'07 — the theta-sketch lineage): per side,
    * the K = 256 smallest 60-bit md5 hashes of the DISTINCT join keys;
    * estimate D̂ = (K−1)·2⁶⁰/h_K (exact count when the side holds
    * fewer than K distinct keys — the small side degrades to exact,
    * which the sf0.001 run exercises while sf0.1/sf1 exercise the
    * estimator), and the overlap via the UNION sketch: ρ̂ = |{K
    * smallest of A∪B} ∩ A ∩ B| / |union sketch|. This is the sketch a
    * planner consults to size a join before running it — one
    * TakeOrdered(K) per side (global sort-limit, no full shuffle),
    * fixed-size and mergeable like the HLL/CMS family, plus the
    * audit's exact twins (countDistinct + one key semi-join).
    * Everything before the two final divisions is exact BIGINT; the
    * divisions are single correctly-rounded doubles ((K−1)·2⁶⁰ is a
    * power-of-two multiple of 255 — exactly representable).
    */
  private val KmvK = 256

  private val q316: Q = (s, dir) => {
    def sketch(df: DataFrame, keyCol: String): DataFrame =
      df.select(col(keyCol).cast("long").as("key")).distinct()
        .select(expr(
          "CAST(conv(substring(md5(CAST(key AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
        .orderBy("h").limit(KmvK)
    val sa = graft.util.QueryCaches.tracked(
      sketch(Tables.spread(Tables.orders(s, dir)), "o_custkey"))
    val sb = graft.util.QueryCaches.tracked(
      sketch(Tables.spread(Tables.customer(s, dir)), "c_custkey"))
    val su = graft.util.QueryCaches.tracked(
      sa.unionByName(sb).distinct().orderBy("h").limit(KmvK))
    def est(kCol: String, hCol: String) =
      when(col(kCol) < KmvK, col(kCol).cast("double"))
        .otherwise(expr(s"CAST(${KmvK - 1} AS DOUBLE) * " +
          s"CAST(1152921504606846976 AS DOUBLE) / CAST($hCol AS DOUBLE)"))
    val aAgg = sa.agg(count(lit(1)).as("ka"), max("h").as("hka"))
    val bAgg = sb.agg(count(lit(1)).as("kb"), max("h").as("hkb"))
    val uAgg = su.agg(count(lit(1)).as("ku"))
    val iAgg = su.join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi").agg(count(lit(1)).as("inter_k"))
    val ea = Tables.orders(s, dir).agg(
      countDistinct("o_custkey").as("na"))
    val eb = Tables.customer(s, dir).agg(
      countDistinct("c_custkey").as("nb"))
    val ei = Tables.orders(s, dir).select(col("o_custkey").as("key"))
      .distinct()
      .join(Tables.customer(s, dir).select(col("c_custkey").as("key"))
        .distinct(), Seq("key"), "left_semi")
      .agg(count(lit(1)).as("ni"))
    aAgg.crossJoin(broadcast(bAgg)).crossJoin(broadcast(uAgg))
      .crossJoin(broadcast(iAgg)).crossJoin(broadcast(ea))
      .crossJoin(broadcast(eb)).crossJoin(broadcast(ei))
      .select(lit(KmvK).as("k"),
        col("na").as("exact_a"), round(est("ka", "hka"), 2).as("est_a"),
        col("nb").as("exact_b"), round(est("kb", "hkb"), 2).as("est_b"),
        col("inter_k"), col("ku").as("union_k"),
        round(col("inter_k").cast("double") / col("ku").cast("double"), 6)
          .as("jacc_est"),
        round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double"), 6)
          .as("jacc_exact"))
  }

  private val q316Sql =
    s"""WITH sa AS MATERIALIZED (SELECT CAST(('0x' ||
       |    substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS key
       |        FROM orders) t
       |  ORDER BY h LIMIT $KmvK),
       |sb AS MATERIALIZED (SELECT CAST(('0x' ||
       |    substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS key
       |        FROM customer) t
       |  ORDER BY h LIMIT $KmvK),
       |su AS MATERIALIZED (SELECT h FROM
       |  (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL
       |    SELECT h FROM sb) u0) u
       |  ORDER BY h LIMIT $KmvK),
       |agg AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM sa) AS ka,
       |  (SELECT max(h) FROM sa) AS hka,
       |  (SELECT CAST(count(*) AS BIGINT) FROM sb) AS kb,
       |  (SELECT max(h) FROM sb) AS hkb,
       |  (SELECT CAST(count(*) AS BIGINT) FROM su) AS ku,
       |  (SELECT CAST(count(*) AS BIGINT) FROM su
       |   WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
       |    AS inter_k,
       |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
       |    AS na,
       |  (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer)
       |    AS nb,
       |  (SELECT CAST(count(*) AS BIGINT) FROM
       |    (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS key FROM orders) a
       |    WHERE key IN (SELECT CAST(c_custkey AS BIGINT) FROM customer))
       |    AS ni)
       |SELECT CAST($KmvK AS INTEGER) AS k,
       |  na AS exact_a,
       |  round(CASE WHEN ka < $KmvK THEN CAST(ka AS DOUBLE)
       |    ELSE CAST(${KmvK - 1} AS DOUBLE)
       |      * CAST(1152921504606846976 AS DOUBLE) / CAST(hka AS DOUBLE)
       |    END, 2) AS est_a,
       |  nb AS exact_b,
       |  round(CASE WHEN kb < $KmvK THEN CAST(kb AS DOUBLE)
       |    ELSE CAST(${KmvK - 1} AS DOUBLE)
       |      * CAST(1152921504606846976 AS DOUBLE) / CAST(hkb AS DOUBLE)
       |    END, 2) AS est_b,
       |  inter_k, ku AS union_k,
       |  round(CAST(inter_k AS DOUBLE) / CAST(ku AS DOUBLE), 6) AS jacc_est,
       |  round(CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE), 6)
       |    AS jacc_exact
       |FROM agg""".stripMargin

  val all: Map[String, Q] = Map(
    "q283_cms_frequency" -> q283,
    "q316_kmv_overlap" -> q316
  )

  val oracle: Map[String, String] = Map(
    "q283_cms_frequency" -> q283Sql,
    "q316_kmv_overlap" -> q316Sql
  )
}
