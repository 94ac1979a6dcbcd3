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

  val all: Map[String, Q] = Map(
    "q283_cms_frequency" -> q283
  )

  val oracle: Map[String, String] = Map(
    "q283_cms_frequency" -> q283Sql
  )
}
