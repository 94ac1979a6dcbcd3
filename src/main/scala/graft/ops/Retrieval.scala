package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Retrieval-ensemble operators — the stage a RAG / retrieval-training
  * pipeline runs AFTER the index lookups the ANN family (q45/q46/q53)
  * models: fusing heterogeneous rankings into one list (q275, reciprocal
  * rank fusion) and diversifying a top-k before it is shown or trained on
  * (q276, maximal marginal relevance).
  *
  * Scale rules: every ranking is a bounded [[graft.functions.TopKByScore]]
  * aggregation (partial+final, shuffle volume independent of scored rows —
  * never a data-keyed ranking window); the fusion join touches only the
  * ≤2k surviving candidates per query; MMR's greedy rounds iterate over a
  * 20-candidate-per-query relation with eager lineage truncation
  * ([[graft.util.Lineage]], the q233/q237 discipline). The per-query
  * candidate relations and the embedding projection are keyed-shared
  * ([[graft.util.QueryCaches]]) so a composed fuse+diversify job pays the
  * dense scoring pass once.
  */
object Retrieval {

  private type Q = (SparkSession, String) => DataFrame

  private val vd = "CAST(embedding AS array<double>)"

  /** (vec_id, v) projection, spread + persisted once per session/dir —
    * consumed by the dense scoring pass and again by q276's
    * candidate-pair sims.
    */
  private def embRel(s: SparkSession, dir: String): DataFrame =
    graft.util.QueryCaches.keyed(s"retr:emb:$dir") {
      Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), expr(vd).as("v"))
    }

  /** Dense retrieval: cosine top-20 per query (the 5 vec_id<5 query
    * vectors broadcast, q45's brute kernel at k=20) — (query_id, doc_id,
    * cs, rd). Shared by q275 (fusion leg) and q276 (candidate pool).
    */
  private def denseTop(s: SparkSession, dir: String): DataFrame =
    graft.util.QueryCaches.keyed(s"retr:dense:$dir") {
      val topk = udaf(new graft.functions.TopKByScore(20))
      val e = embRel(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(expr("cosine_sim(qv, v)"), 6).as("cs"))
        .groupBy("query_id").agg(topk(col("cs"), col("vec_id")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), col("col.id").as("doc_id"),
          col("col.score").as("cs"), (col("pos") + 1).cast("int").as("rd"))
    }

  /** q275 — per-query HYBRID retrieval via reciprocal rank fusion
    * (Cormack et al., SIGIR'09): for each query (docs 0–4, embeddings
    * aligned on id), leg 1 is the dense cosine top-20 and leg 2 the
    * lexical shared-3-shingle top-20 (|S(q)∩S(d)| via the
    * distinct-shingle postings — exact overlap, no corpus statistics
    * needed), fused by `RRF(d) = Σ_legs 1/(60 + rank_leg(d))` and
    * re-ranked to a top-10. Complements q199, which fuses two GLOBAL
    * corpus-level signals (term frequency × quality prior) through
    * [[GlobalRank.rowNumber]]: hybrid search is per-query, so both legs
    * here are bounded [[graft.functions.TopKByScore]] aggregations with
    * per-query ranks from the aggregator's order — no global rank, no
    * ranking window — and the fusion joins two ≤20-row-per-query
    * relations. The fused score needs no q199-style integer quantization:
    * it is a fixed-order sum of exactly TWO coalesced reciprocals inside
    * one projection (never a float aggregation), bit-identical on both
    * engines. The lexical leg's postings join is query-shingles-broadcast
    * × postings — linear in corpus size, the map-side-only shape an
    * inverted index serves at 100 TB.
    */
  private val q275: Q = (s, dir) => {
    val topkL = udaf(new graft.functions.TopKByScore(20))
    val topkF = udaf(new graft.functions.TopKByScore(10))
    val sets = TextDedup.shingleSetsFor(Tables.spread(Tables.documents(s, dir)))
    val post = sets.select(col("doc_id"), explode(col("sh")).as("g"))
      .transform(graft.util.QueryCaches.tracked)
    val qp = post.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("g"))
    val lex = post.join(broadcast(qp), Seq("g"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("shared"))
      .groupBy("query_id")
      .agg(topkL(col("shared").cast("double"), col("doc_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rl"))
    val den = denseTop(s, dir).select(col("query_id"), col("doc_id"), col("rd"))
    den.join(lex, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(expr(
        """coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + rd AS DOUBLE), CAST(0.0 AS DOUBLE))
          |+ coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + rl AS DOUBLE), CAST(0.0 AS DOUBLE))"""
          .stripMargin), 6))
      .groupBy("query_id").agg(topkF(col("rrf"), col("doc_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("rrf"))
      .orderBy("query_id", "rank")
  }

  /** The dense-leg oracle CTE chain (q45's formula at k=20) — shared by
    * q275Sql and q276Sql so the candidate definition cannot drift.
    */
  private val denseCtes =
    """e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |qv AS (SELECT vec_id AS query_id, v AS qv FROM e0 WHERE vec_id < 5),
      |ds AS (SELECT qv.query_id, e0.vec_id AS doc_id,
      |    round(list_dot_product(qv.qv, e0.v)
      |      / (sqrt(list_dot_product(qv.qv, qv.qv))
      |         * sqrt(list_dot_product(e0.v, e0.v))), 6) AS cs
      |  FROM qv JOIN e0 ON e0.vec_id <> qv.query_id),
      |dr AS (SELECT query_id, doc_id, cs,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cs DESC, doc_id) AS INTEGER) AS rd
      |  FROM ds)""".stripMargin

  private val q275Sql =
    s"""WITH ${TextDedup.minhashCtes},
       |$denseCtes,
       |sets AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh),
       |post AS (SELECT doc_id, unnest(sh) AS g FROM sets),
       |qp AS (SELECT doc_id AS query_id, g FROM post WHERE doc_id < 5),
       |ls AS (SELECT qp.query_id, post.doc_id, CAST(count(*) AS BIGINT) AS shared
       |  FROM qp JOIN post ON post.g = qp.g
       |  WHERE post.doc_id <> qp.query_id GROUP BY 1, 2),
       |lr AS (SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY CAST(shared AS DOUBLE) DESC, doc_id) AS INTEGER) AS rl
       |  FROM ls),
       |f AS (SELECT coalesce(d.query_id, l.query_id) AS query_id,
       |    coalesce(d.doc_id, l.doc_id) AS doc_id,
       |    round(coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + d.rd AS DOUBLE), CAST(0.0 AS DOUBLE))
       |      + coalesce(CAST(1.0 AS DOUBLE) / CAST(60 + l.rl AS DOUBLE), CAST(0.0 AS DOUBLE)), 6)
       |      AS rrf
       |  FROM (SELECT * FROM dr WHERE rd <= 20) d
       |  FULL JOIN (SELECT * FROM lr WHERE rl <= 20) l
       |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
       |SELECT query_id, rank, doc_id, rrf FROM (
       |  SELECT query_id, doc_id, rrf,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank
       |  FROM f) t
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** q276 — maximal marginal relevance diversification (Carbonell &
    * Goldstein, SIGIR'98): greedily re-rank each query's cosine top-20
    * into 5 picks maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` with
    * λ=0.7 — the de-duplicating re-rank that keeps a near-identical
    * second copy of the best hit from wasting a result slot (and, in a
    * training pipeline, keeps retrieved context sets diverse). Greedy MMR
    * is inherently sequential in k, so the implementation makes the
    * sequence EXPLICIT and everything else data-parallel: 5 rounds, each
    * one equi-join (penalty = max sim to the selected set, a bounded
    * groupBy-max over the persisted 380-pair-per-query candidate-sim
    * relation), an anti-join to drop picked candidates, and a struct-max
    * argmax per query — never a window, never a collect, all queries
    * advance in the same round concurrently. Determinism: relevance and
    * sims are quantized to BIGINT millionths BEFORE the λ-combination
    * (`7·rel_q − 3·sim_q`, integers end-to-end — the q112 discipline),
    * ties broken by smallest doc_id via lexicographic struct-max; rounds
    * truncate lineage eagerly (the selected set is referenced twice per
    * round — [[graft.util.Lineage]]) and the oracle's rounds are
    * `AS MATERIALIZED` for the same reason.
    */
  private val q276: Q = (s, dir) => {
    val cand = graft.util.QueryCaches.tracked(
      denseTop(s, dir).select(col("query_id"), col("doc_id"),
        expr("CAST(round(cs * 1e6) AS BIGINT)").as("rel_q")))
    val e = embRel(s, dir)
    val sims = graft.util.QueryCaches.tracked(
      cand.as("a")
        .join(cand.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .join(e.select(col("vec_id").as("ida"), col("v").as("va")),
          col("a.doc_id") === col("ida"))
        .join(e.select(col("vec_id").as("idb"), col("v").as("vb")),
          col("b.doc_id") === col("idb"))
        .select(col("a.query_id").as("query_id"), col("a.doc_id").as("ca"),
          col("b.doc_id").as("cb"),
          expr("CAST(round(round(cosine_sim(va, vb), 6) * 1e6) AS BIGINT)")
            .as("sim_q")))
    def argmax(df: DataFrame, scoreQ: Column, r: Int): DataFrame =
      df.groupBy("query_id")
        .agg(max(struct(scoreQ.as("sq"), (-col("doc_id")).as("nd"),
          col("doc_id").as("doc_id"))).as("m"))
        .select(col("query_id"), col("m.doc_id").as("doc_id"),
          col("m.sq").as("score_q"), lit(r).as("r"))
    var sel = graft.util.Lineage.truncate(
      argmax(cand, col("rel_q") * 7, 1))
    for (i <- 2 to 5) {
      val pen = sims
        .join(sel.select(col("query_id"), col("doc_id").as("cb")),
          Seq("query_id", "cb"))
        .groupBy(col("query_id"), col("ca")).agg(max("sim_q").as("ms"))
      val next = argmax(
        cand
          .join(sel.select(col("query_id"), col("doc_id")),
            Seq("query_id", "doc_id"), "left_anti")
          .join(pen.select(col("query_id"), col("ca").as("doc_id"), col("ms")),
            Seq("query_id", "doc_id")),
        col("rel_q") * 7 - col("ms") * 3, i)
      sel = graft.util.Lineage.truncate(sel.unionByName(next))
    }
    sel.select(col("query_id"), col("r"), col("doc_id"),
        (col("score_q").cast("double") / expr("CAST(1e7 AS DOUBLE)")).as("score"))
      .orderBy("query_id", "r")
  }

  private val q276Sql: String = {
    def roundCte(i: Int): String = {
      val selUnion = (1 until i).map(j => s"SELECT * FROM s_$j")
        .mkString(" UNION ALL ")
      s"""sel_$i AS MATERIALIZED ($selUnion),
         |s_$i AS MATERIALIZED (
         |  SELECT query_id, m[3] AS doc_id, m[1] AS score_q, $i AS r FROM (
         |    SELECT c.query_id,
         |      max(ROW(7 * c.rel_q - 3 * p.ms, -c.doc_id, c.doc_id)) AS m
         |    FROM cand c
         |    JOIN (SELECT cs2.query_id, cs2.ca, max(cs2.sim_q) AS ms
         |          FROM cs2 JOIN sel_$i s ON s.query_id = cs2.query_id
         |                                AND s.doc_id = cs2.cb
         |          GROUP BY 1, 2) p
         |      ON p.query_id = c.query_id AND p.ca = c.doc_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel_$i s2
         |                      WHERE s2.query_id = c.query_id
         |                        AND s2.doc_id = c.doc_id)
         |    GROUP BY c.query_id) t)""".stripMargin
    }
    s"""WITH $denseCtes,
       |cand AS MATERIALIZED (SELECT query_id, doc_id,
       |    CAST(round(cs * 1e6) AS BIGINT) AS rel_q
       |  FROM dr WHERE rd <= 20),
       |cs2 AS MATERIALIZED (SELECT a.query_id, a.doc_id AS ca, b.doc_id AS cb,
       |    CAST(round(round(list_dot_product(va.v, vb.v)
       |      / (sqrt(list_dot_product(va.v, va.v))
       |         * sqrt(list_dot_product(vb.v, vb.v))), 6) * 1e6) AS BIGINT)
       |      AS sim_q
       |  FROM cand a JOIN cand b ON b.query_id = a.query_id
       |                         AND b.doc_id <> a.doc_id
       |  JOIN e0 va ON va.vec_id = a.doc_id
       |  JOIN e0 vb ON vb.vec_id = b.doc_id),
       |s_1 AS MATERIALIZED (
       |  SELECT query_id, m[3] AS doc_id, m[1] AS score_q, 1 AS r FROM (
       |    SELECT query_id, max(ROW(7 * rel_q, -doc_id, doc_id)) AS m
       |    FROM cand GROUP BY query_id) t),
       |${(2 to 5).map(roundCte).mkString(",\n")}
       |SELECT query_id, r, doc_id,
       |  CAST(score_q AS DOUBLE) / CAST(1e7 AS DOUBLE) AS score
       |FROM (SELECT * FROM s_1 UNION ALL SELECT * FROM s_2
       |  UNION ALL SELECT * FROM s_3 UNION ALL SELECT * FROM s_4
       |  UNION ALL SELECT * FROM s_5) u
       |ORDER BY query_id, r""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q275_rrf_fusion" -> q275,
    "q276_mmr_diversify" -> q276
  )

  val oracle: Map[String, String] = Map(
    "q275_rrf_fusion" -> q275Sql,
    "q276_mmr_diversify" -> q276Sql
  )
}
