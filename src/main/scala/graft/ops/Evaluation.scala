package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Large-scale model/score EVALUATION operators — the audit pass a
  * training-data pipeline runs over scores it just produced (quality
  * classifiers, retrieval scorers, dedup confidences): threshold-free
  * ranking quality (AUC), and distribution alignment across sources.
  *
  * Scale rules: an AUC over 10¹² scored rows is a RANK statistic, and
  * ranks are the canonical single-reducer trap (`ORDER BY` window with no
  * partition). Every rank here goes through [[GlobalRank]]'s range-
  * partitioned decomposition instead — P driver-side longs of metadata,
  * no `Exchange SinglePartition` anywhere in the plan (pinned by
  * PlanSpec's no-unpartitioned-window sweep).
  */
object Evaluation {

  private type Q = (SparkSession, String) => DataFrame

  private val vd = "CAST(embedding AS array<double>)"

  /** q284 — exact tie-aware AUC (Mann–Whitney) of a centroid-similarity
    * score predicting class membership, computed entirely from integer
    * rank algebra.
    *
    * Score: dot(vq, cv) where vq is the embedding quantized once to
    * BIGINT 2²⁰ths (the q277/q278 discipline) and cv the class-0
    * centroid mean re-quantized to the same grid — an exact BIGINT fold
    * in any aggregation order, so both engines rank identically.
    * (The +2²¹·n0 shift before the integer division keeps the numerator
    * positive: Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, and the two only agree on non-negative operands.)
    *
    * AUC: with midrank2 = 2·(exclusive prefix count) + tie-size + 1
    * (twice the Mann–Whitney midrank, kept integral), the statistic is
    *   AUC = (Σ_pos midrank2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    * — ties contribute the correct ½ credit with zero floats until the
    * single final division. The prefix count runs over the DISTINCT-score
    * relation through [[GlobalRank.prefixSum]] (no global-sort window).
    * BIGINT bounds: sum_midrank2 ≤ 2n² — exact to n ≈ 2·10⁹ scored rows;
    * past that, cast the two final sums to DECIMAL(38,0) (DuckDB's
    * HUGEINT sums already are 128-bit).
    */
  private val q284: Q = (s, dir) => {
    val eq = graft.util.QueryCaches.tracked(
      Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("label"),
          expr(s"transform($vd, x -> CAST(round(x * 1048576) AS BIGINT))")
            .as("vq")))
    val cent = eq.filter(col("label") === 0)
      .agg(count(lit(1)).as("n0"),
        (0 until 64).map(i => sum(expr(s"vq[$i]")).as(s"c$i")): _*)
    val cm = cent.select(array((0 until 64).map(i =>
      expr(s"(c$i + 2097152L * n0) div n0 - 2097152L")): _*).as("cv"))
    val scored = eq.crossJoin(broadcast(cm))
      .select(col("label"),
        expr("""aggregate(zip_with(vq, cv, (x, y) -> x * y),
                |  CAST(0 AS BIGINT), (a, t) -> a + t)""".stripMargin)
          .as("score"))
    val g = scored.groupBy("score").agg(
      count(lit(1)).as("c"),
      sum(when(col("label") === 0, 1L).otherwise(0L)).as("cpos"))
    GlobalRank.prefixSum(g, "pre", col("c"), Seq(col("score")))
      .agg(sum("cpos").as("n_pos"),
        sum(col("c") - col("cpos")).as("n_neg"),
        sum(col("cpos") * (lit(2L) * col("pre") + col("c") + lit(1L)))
          .as("sum_midrank2"))
      .select(col("n_pos"), col("n_neg"),
        (col("sum_midrank2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .as("u2_numer"),
        round(expr("""CAST(sum_midrank2 - n_pos * (n_pos + 1) AS DOUBLE)
                     |/ CAST(2 * n_pos * n_neg AS DOUBLE)""".stripMargin), 6)
          .as("auc"))
  }

  private val q284Sql =
    """WITH eq AS (SELECT vec_id, label,
      |    list_transform(embedding::DOUBLE[],
      |      x -> CAST(round(x * 1048576) AS BIGINT)) AS vq
      |  FROM embeddings),
      |c0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM eq WHERE label = 0),
      |cs AS (SELECT u.j, CAST(sum(vq[u.j]) AS BIGINT) AS cj
      |  FROM eq CROSS JOIN unnest(generate_series(1, 64)) AS u(j)
      |  WHERE label = 0 GROUP BY u.j),
      |cm AS (SELECT list((cj + 2097152 * n0) // n0 - 2097152 ORDER BY j) AS cv
      |  FROM cs CROSS JOIN c0),
      |scored AS (SELECT label,
      |    CAST(list_sum(list_transform(generate_series(1, 64),
      |      j -> vq[j] * cv[j])) AS BIGINT) AS score
      |  FROM eq CROSS JOIN cm),
      |g AS (SELECT score, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cpos
      |  FROM scored GROUP BY score),
      |p AS (SELECT score, c, cpos,
      |    CAST(coalesce(sum(c) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS pre
      |  FROM g),
      |f AS (SELECT CAST(sum(cpos) AS BIGINT) AS n_pos,
      |    CAST(sum(c - cpos) AS BIGINT) AS n_neg,
      |    CAST(sum(cpos * (2 * pre + c + 1)) AS BIGINT) AS sum_midrank2
      |  FROM p)
      |SELECT n_pos, n_neg,
      |  sum_midrank2 - n_pos * (n_pos + 1) AS u2_numer,
      |  round(CAST(sum_midrank2 - n_pos * (n_pos + 1) AS DOUBLE)
      |    / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
      |FROM f""".stripMargin

  val all: Map[String, Q] = Map(
    "q284_auc_centroid" -> q284
  )

  val oracle: Map[String, String] = Map(
    "q284_auc_centroid" -> q284Sql
  )
}
