package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.source.Tables

/** Physical-plan assertions: every scale claim made in operator Scaladoc
  * (broadcasts, pushdown, top-k planning, partial aggregation) is pinned
  * here so a refactor that silently degrades the plan fails the build.
  * Uses sf0.001 — plan shape, not data volume, is under test.
  */
class PlanSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    // executedPlan before AQE finalization still shows join strategies;
    // explain string includes the whole tree.
    df.queryExecution.executedPlan.toString()
  }

  test("q20: dimension joins broadcast (no shuffle of the fact side for dims)") {
    val p = planString(SparkEntry.queries("q20_join_inner")(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast for nation/region dims in:\n$p")
  }

  test("q28: top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = planString(SparkEntry.queries("q28_topk")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("filter + projection push into the parquet scan") {
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = planString(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"expected pushed filter in:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected pruned 2-column read schema in:\n$p")
  }

  test("column pruning reaches the scan through spread's exchange") {
    val df = Tables.spread(Tables.lineitem(spark, dir)).select("l_orderkey")
    val p = planString(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"round-robin repartition must not widen the scan:\n$p")
  }

  test("no declared query scans a table at full width (column pruning sweep)") {
    // Every parquet scan in every declared plan must read a strict subset
    // of its table's columns — at 100 TB an unpruned documents scan drags
    // the full text corpus through a two-column query. The one exemption
    // is justified: q30's scalar suite deliberately exercises every
    // events column (incl. the JSON props blob), and q44's labeled
    // near-dup, q166's label-cohesion audit, and q184's hard-negative
    // mining genuinely consume all 3 embeddings columns (vec_id,
    // embedding, label) — full width IS the pruned width there.
    val fullWidth = Map("documents" -> 5, "embeddings" -> 3, "events" -> 6,
      "lineitem" -> 16, "orders" -> 9, "customer" -> 8, "part" -> 9,
      "supplier" -> 7, "nation" -> 4, "region" -> 3)
    // (q188's drift split genuinely consumes all 3 embeddings columns
    // too: vec_id keys the digest-mod half, label the class, embedding
    // the centroid.)
    val exempt = Set("q30_scalar_suite", "q44_embed_neardup",
      "q166_label_cohesion", "q184_hard_negatives", "q188_centroid_drift")
    // Structural, not textual: the plan's toString TRUNCATES wide
    // ReadSchema strings ("struct<...,l_returnflag:s..." with no closing
    // '>'), so the old regex parse silently skipped exactly the wide
    // scans the sweep exists to police. Collecting FileSourceScanExec
    // nodes (recursing through AQE wrappers and cached relations) and
    // reading requiredSchema directly cannot be fooled by formatting.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] = plan.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case i: InMemoryTableScanExec => fileScans(i.relation.cachedPlan)
    }.flatten
    SparkEntry.queries.keys.filterNot(exempt).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      // queries whose CONSTRUCTION runs jobs (GlobalRank) register caches;
      // drain per iteration or they pile up for the whole suite run
      graft.util.QueryCaches.drain()
      fileScans(plan).foreach { f =>
        val table = f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        val nCols = f.requiredSchema.size
        // the shared postings table IS the projection (2 columns, both
        // needed by every consumer) — full-width reads of it are the point
        if (!table.startsWith("graft_postings13"))
        withClue(s"$name scanning $table: ") {
          assert(fullWidth.contains(table),
            s"table '$table' missing from the fullWidth map — add it")
          assert(nCols < fullWidth(table),
            s"scan reads all $nCols columns (${f.requiredSchema.simpleString})")
        }
      }
    }
  }

  test("q23: aggregation is partial then final (map-side combine)") {
    val df = SparkEntry.queries("q23_groupby_agg")(spark, dir)
    val p = planString(df)
    // two HashAggregate layers around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final hash aggregate in:\n$p")
  }

  test("q45: query-side of the similarity join is broadcast") {
    val p = planString(SparkEntry.queries("q45_simsearch_topk")(spark, dir))
    assert(p.contains("BroadcastExchange"), s"expected broadcast query set in:\n$p")
  }

  test("q45/q46 use the native codegen'd cosine expression, not a UDF") {
    val p = planString(SparkEntry.queries("q45_simsearch_topk")(spark, dir))
    assert(p.contains("cosine_sim"), s"expected native cosine_sim in:\n$p")
    assert(!p.contains("UDF"), s"no scala UDF should appear in:\n$p")
  }

  test("q45: per-query top-k is a partial+final bounded aggregation, not a window") {
    val p = planString(SparkEntry.queries("q45_simsearch_topk")(spark, dir))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate for TopKByScore in:\n$p")
    assert(!p.contains("Window"), s"ranking window would shuffle every scored row:\n$p")
  }

  test("q98: per-group top-k is a partial+final bounded aggregation, not a window") {
    val p = planString(SparkEntry.queries("q98_topk_per_group")(spark, dir))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate for TopKByScore in:\n$p")
    assert(!p.contains("Window"), s"ranking window would shuffle every document:\n$p")
  }

  test("q41: LSH band join is an equi-join over the persisted bands relation") {
    val p = planString(SparkEntry.queries("q41_dedup_minhash_lsh")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join must not degrade to an all-pairs join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected hash/merge equi-join on (b, bh) in:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bands must be persisted once, not recomputed per side:\n$p")
  }

  test("q43: prefix-token candidate join is an equi-join (no all-pairs fallback)") {
    val p = planString(SparkEntry.queries("q43_dedup_ngram_jaccard")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay an equi-join on (lang, lb, shingle):\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected shuffled equi-join in:\n$p")
  }

  test("q52: as-of is union + one keyed running window — no join, no range explosion") {
    val p = planString(SparkEntry.queries("q52_asof_join")(spark, dir))
    assert(!p.contains("Join"), s"as-of must not plan a join operator:\n$p")
    assert(p.contains("Window"), s"expected the running last() window in:\n$p")
    assert(p.contains("Union"), s"expected the tagged-side union in:\n$p")
  }

  test("q44: near-dup block key is (label, bucket) — hash-bounded, not label alone") {
    val df = SparkEntry.queries("q44_embed_neardup")(spark, dir)
    val p = planString(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair join must not degrade to all-pairs:\n$p")
    // the bucket column must be part of the join key: a data-dependent
    // label block alone goes quadratic at 100x on a dominant label
    val joinKeys = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }.mkString
    assert(joinKeys.contains("bucket") && joinKeys.contains("label"),
      s"expected (label, bucket) composite equi-key, got: $joinKeys")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bucketed relation must be persisted once for the self-join:\n$p")
  }

  test("q57: LSH near-dup pairs come from an equi-join on the bucket id") {
    val p = planString(SparkEntry.queries("q57_embed_neardup_lsh")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket join must not degrade to all-pairs:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bucketed relation must be persisted once for the self-join:\n$p")
  }

  test("q05: diff classification stays inside the join projection (one join, no re-shuffle)") {
    val df = SparkEntry.queries("q05_diff_fullouter")(spark, dir)
    val p = planString(df)
    assert(p.contains("FullOuter") || p.contains("full_outer") || p.contains("FULL OUTER"),
      s"expected full outer join in:\n$p")
  }

  test("no declared query plans a cartesian or nested-loop join (except the range join)") {
    // Legitimate non-equi joins: q22 is a genuine range-theta join, q45 is
    // the brute-force broadcast scan baseline, q11 crosses two single-row
    // count aggregates (1×1), q53 crosses every vector with the 8-row
    // broadcast quantizer, q70 crosses the 1-row corpus count into the
    // tf⋈df relation. Everything else must stay equi/broadcast.
    // (q75/q88/q103/q108/q110/q130 cross a 1-row corpus-stats aggregate,
    // like q70.)
    // (q124/q126/q127 cross every vector with the ≤8-row broadcast
    // quantizer — the same deliberate shape as q53's assignment.)
    // (q137/q138 cross a 1-row totals/count aggregate, like q70.)
    // (q140 assigns via the ≤8-row broadcast quantizer like q124; q141
    // scores codes against the 5-row broadcast distance tables like q45.)
    // (q151 crosses the |sources|-row mixture with its 1-row totals
    // aggregate, like q70; q152 is q45's broadcast brute-force scan shape
    // with a second score column; q157 is q151's scalar-totals cross.)
    // (q159 crosses the 256-row feature table with its 1-row totals
    // aggregate, like q151.)
    // (q163's running sum is a triangle join over the bounded 10-row
    // decile relation plus a 1-row totals cross — never a corpus window.)
    // (q167 crosses six 1-row aggregates into its single output row —
    // all scalar broadcasts.)
    // (q169 reads q91's prefix-sum relation, whose lang offsets broadcast;
    // q171 crosses the candidate counts with the 1-row token total, like
    // q70; q172 is q163's bounded 10-row triangle join + 1-row count
    // cross; q174/q175 cross every vector with the <=8-row broadcast
    // quantizer exactly like q126/q127, whose composition they are;
    // q180 crosses the 1-row corpus token total, like q70.)
    // (q181 crosses the 1-row node count into each rank iteration;
    // q183 crosses the 1-row token total, like q70; q185 composes
    // q45's broadcast brute-force ground truth and the ≤8-row broadcast
    // quantizer across its three nprobe branches, like q125/q127.)
    // (q186 crosses the 1-row broadcast bloom map onto the candidate
    // scan — the pre-filter that REPLACES a corpus-wide join.)
    // (q192 crosses the 1-row train vocabulary like q103; q193's
    // remainder rank is q163's bounded |sources|² triangle join plus
    // two 1-row broadcasts.)
    val exempt = Set("q22_join_range", "q45_simsearch_topk", "q11_reconcile",
      "q180_source_token_kl",
      "q181_pagerank", "q183_filter_funnel", "q185_nprobe_sweep",
      "q186_dedup_bloom", "q192_holdout_perplexity", "q193_budget_allocation",
      "q198_knn_reciprocity", // crosses two 1-row count aggregates, like q11
      "q202_ivf_cell_balance", // broadcast-quantizer assign + 1-row totals cross
      "q203_retention_halflife", // crosses the 1-row user total, like q70
      "q204_markov_stationary", // crosses the 1-row node count per iteration, like q181
      "q205_triangle_count", // crosses two 1-row aggregates, like q11
      "q210_split_stratification", // crosses the 10-row label and 1-row grand marginals
      "q212_chunk_stitch", // crosses four 1-row audit aggregates, like q167
      "q214_stream_state_budget", // crosses the 1-row watermark aggregate
      "q215_degree_assortativity", // crosses the 1-row node-count aggregate, like q198
      "q216_twohop_recall", // composes q45's broadcast brute-force ground truth, like q185
      "q217_positional_drift", // crosses the 1-row front/back totals aggregate, like q70
      "q219_salt_rebalance", // crosses per-family 1-row totals aggregates, like q70
      "q221_histogram_quantiles", // crosses the 1-row min/max/exact aggregates, like q88
      "q223_neyman_allocation", // crosses 1-row totals/shortfall broadcasts, like q193
      "q224_ks_test", // crosses the 1-row sample-size and max aggregates, like q11
      "q225_token_gini", // crosses the 1-row vocabulary totals, like q70
      "q226_bloom_fpp", // crosses the 1-row broadcast bloom map + audit folds, like q186
      "q227_late_event_curve", // crosses the bounded 4-row threshold broadcast
      "q229_attribution_asof", // crosses two 1-row revenue aggregates, like q11
      "q231_shard_uniformity", // crosses the 1-row doc total onto the 64-row grid, like q70
      "q233_kcore_curve", // crosses per-round 1-row node/edge counts, like q181
      "q234_token_burstiness", // crosses the 1-row doc-count aggregate, like q70
      "q235_quota_sample", // crosses 1-row Neyman totals + the 5-row offset triangle, like q193
      "q236_watermark_join_loss", // crosses the bounded 2-row threshold broadcast, like q227
      "q237_eigen_centrality", // crosses the 1-row max normalizer per iteration, like q181
      "q238_runtime_filter_gain", // crosses three 1-row audit counts, like q11
      "q239_multiprobe_lsh", // composes q45's broadcast ground truth + 1-row candidate counts, like q185
      "q240_dict_coverage", // crosses three 1-row dictionary folds, like q212
      "q243_assoc_lift", // crosses the 1-row user count onto the bounded pair grid, like q70
      "q244_negative_sampling", // crosses the 1-row total-mass aggregate, like q70
      "q245_hill_tail", // crosses the 1-row reference order statistic, like q70
      "q248_markov_entropy", // crosses the 1-row transition total, like q70
      "q249_daily_autocorr", // crosses the 1-row pair-moment aggregate, like q11
      "q250_spearman_sources", // two bounded |sources|^2 triangle-join rankings, like q193
      "q251_admission_pipeline", // crosses the 1-row mixture-mass total, like q151
      "q253_bigram_entropy", // crosses the 1-row bigram total, like q248
      "q254_cramers_v", // crosses the 1-row contingency totals, like q137
      "q260_gram_df_spectrum", // crosses the 1-row vocabulary total, like q70
      "q268_modularity", // crosses the 1-row edge-count m, like q181
      "q269_simhash_spectrum", // bounded <=33-row histogram triangle join, like q163
      "q270_result_redundancy", // q45's broadcast brute-force scan baseline, like q185
      "q271_cusum_changepoint", // bounded |days|^2 prefix triangle + 1-row totals, like q163
      "q272_ks_matrix", // bounded 1024-grid x types CDF triangle + 1-row min/max cross, like q221
      "q169_pack_efficiency", "q171_heavy_hitters", "q172_vocab_growth",
      "q174_ivfpq_search", "q175_ivfpq_recall",
      "q53_ann_ivf", "q70_tfidf", "q75_bm25", "q88_equidepth_buckets",
      "q103_bigram_lm", "q108_pmi_colloc", "q110_vocab_build",
      "q124_kmeans_step", "q125_ann_recall", "q126_ann_ivf_trained",
      "q127_ann_recall_trained", "q128_quantizer_quality",
      "q130_mixture_sample", "q137_token_drift", "q138_curriculum_order",
      "q140_semdedup", "q141_pq_adc_topk", "q142_oov_audit",
      "q151_temp_mixture", "q152_trunc_recall", "q157_epoch_plan",
      "q159_dsir_weight", "q163_quality_token_curve", "q167_modal_agreement")
    SparkEntry.queries.keys.filterNot(exempt).foreach { name =>
      val p = planString(SparkEntry.queries(name)(spark, dir))
      assert(!p.contains("CartesianProduct"),
        s"$name degraded to CartesianProduct:\n$p")
      withClue(s"$name: ") {
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name degraded to BroadcastNestedLoopJoin:\n$p")
      }
    }
  }

  test("q115: pair join sees scalar (label, dim, mean) rows, never vectors") {
    val df = SparkEntry.queries("q115_centroid_separation")(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "expected the dim-keyed pair join")
    joins.foreach { j =>
      val arrays = (j.left.output ++ j.right.output)
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrays.isEmpty,
        s"vector columns must not cross the pair join (labels×dims rows only): $arrays")
    }
  }

  test("q124/q126: quantizer assignment is a broadcast, never a shuffled cross") {
    Seq("q124_kmeans_step", "q126_ann_ivf_trained").foreach { name =>
      val p = planString(SparkEntry.queries(name)(spark, dir))
      withClue(s"$name: ") {
        assert(p.contains("BroadcastExchange"),
          s"expected the ≤8-row quantizer broadcast in:\n$p")
        assert(!p.contains("CartesianProduct"),
          s"assignment must broadcast the quantizer, not shuffle a cross:\n$p")
      }
    }
  }

  test("q130: mixture plan broadcasts back onto the corpus; aggregates are partial+final") {
    val p = planString(SparkEntry.queries("q130_mixture_sample")(spark, dir))
    assert(p.contains("BroadcastExchange"),
      s"the 5-row mixture plan must broadcast, not shuffle the corpus:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregates in:\n$p")
  }

  test("q123: star join broadcasts every dimension; only the fact join shuffles") {
    val p = planString(SparkEntry.queries("q123_star_join")(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast dimension joins in:\n$p")
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"),
      s"expected the order-date range pushed to the orders scan in:\n$p")
  }

  test("q105: bucket fingerprints aggregate partial then final (map-side combine)") {
    val p = planString(SparkEntry.queries("q105_bucket_diff")(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final hash aggregate for fingerprints in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket compare must stay an equi join in:\n$p")
  }

  test("q121/q110: global ranking plans with NO window at all") {
    // The GlobalRank rewrite must hold: ranks come from range partition +
    // sortWithinPartitions + same-stage monotonic ids + broadcast
    // offsets, so the plan must contain ZERO WindowExec nodes — neither
    // the single-partition global window (the 100 TB scale-killer this
    // replaced) nor a per-partition-id ranking window (an extra shuffle
    // of the full relation). Checked structurally, not on plan text.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // recurse into cached plans too: GlobalRank persists nearly the whole
    // upstream of these queries, so a window reintroduced above the cache
    // would be invisible to a non-recursive sweep
    def windows(plan: SparkPlan): Seq[WindowExec] = plan.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case i: InMemoryTableScanExec => windows(i.relation.cachedPlan)
    }.flatten
    Seq("q121_zorder_audit", "q110_vocab_build", "q138_curriculum_order",
      "q163_quality_token_curve", "q195_zipf_fit", "q225_token_gini")
      .foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val wins = windows(df.queryExecution.executedPlan)
      graft.util.QueryCaches.drain()
      assert(wins.isEmpty,
        s"$name: unexpected Window stage(s):\n${wins.mkString("\n")}")
    }
  }

  test("whole-stage codegen covers the scalar suite (no codegen fallback operators)") {
    val df = SparkEntry.queries("q30_scalar_suite")(spark, dir)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val p = df.queryExecution.executedPlan.toString()
    // codegen'd operators print with the `*(stageId)` marker
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
      s"expected whole-stage-codegen *(n) spans in:\n$p")
  }

  test("q41: LSH signature pipeline executes with codegen fallback disabled") {
    // Round-6 driver bench showed q41 at 1.31 s vs 0.93 s in r5; the
    // drained Probe re-run converges to ~1.0 s steady-state, so the delta
    // was JVM/host warmup, not a plan change. This pin makes the innocent
    // explanation durable: if the sigColsFor kernel (or anything above
    // it) ever falls back to interpreted evaluation, fallback=false turns
    // the silent slowdown into a hard failure — the PqAssignSpec
    // discipline applied to the LSH hot path.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = SparkEntry.queries("q41_dedup_minhash_lsh")(spark, dir)
      assert(df.count() > 0)
      val p = df.queryExecution.executedPlan.toString()
      assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined,
        s"expected whole-stage-codegen *(n) spans in the LSH plan:\n$p")
    } finally {
      graft.util.QueryCaches.drain()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("q131/q132: moment aggregation is partial then final (map-side combine)") {
    for (q <- Seq("q131_ols_trend", "q132_corr_moments")) {
      val p = planString(SparkEntry.queries(q)(spark, dir))
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q: expected partial+final hash aggregate for the moment sums in:\n$p")
      assert(!p.contains("Window"), s"$q: no window should appear in:\n$p")
    }
  }

  test("q133: assignment is the native pq_assign expression, no UDF, no pre-sort shuffle") {
    val p = planString(SparkEntry.queries("q133_pq_assign")(spark, dir))
    assert(p.contains("pq_assign"), s"expected native pq_assign in:\n$p")
    assert(!p.contains("UDF"), s"no scala UDF should appear in:\n$p")
    // map-side until the declared output sort: exactly the sort's range
    // exchange and spread's round-robin may appear, nothing hash-keyed
    assert(!p.contains("hashpartitioning"),
      s"q133 must not shuffle on any key before the output sort:\n$p")
  }

  test("q134: passage relation is gram-partitioned once; df join is an equi-join") {
    val p = planString(SparkEntry.queries("q134_dup_passage")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"df join must stay an equi-join on the passage gram:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"passage relation must be persisted once, not recomputed per side:\n$p")
  }

  test("q136: per-vector top-k is a bounded aggregation over the persisted bucket join") {
    val p = planString(SparkEntry.queries("q136_knn_graph")(spark, dir))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate for TopKByScore in:\n$p")
    assert(!p.contains("Window"), s"ranking window would shuffle every scored pair:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"neighbor generation must stay an equi-join on the bucket id:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bucket signatures must be persisted once, not recomputed per side:\n$p")
  }

  test("q137: token counts aggregate partial then final; totals join is a 1-row broadcast") {
    val p = planString(SparkEntry.queries("q137_token_drift")(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final hash aggregate for the token counts in:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"snapshot totals must broadcast, never shuffle the token relation:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q142: occurrence counts reduce map-side before the vocab equi-join; no window") {
    val p = planString(SparkEntry.queries("q142_oov_audit")(spark, dir))
    assert(!p.contains("CartesianProduct"), s"no cartesian in:\n$p")
    // (lang, token) counting must plan partial + final hash aggregation so
    // the shuffle carries distinct pairs, not the raw token stream
    assert("partial_count|partial.*count|HashAggregate".r.findFirstIn(p).isDefined &&
      p.contains("HashAggregate"), s"expected hash aggregation in:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q143: signature and shingle-set relations are persisted once across configs") {
    val p = planString(SparkEntry.queries("q143_band_tuning")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all band/verify joins must stay equi-joins:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"sig/sets must be computed once and reused by all three configs:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q145: both roles of the incremental join read the one persisted band index") {
    val p = planString(SparkEntry.queries("q145_dedup_increment")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the new-vs-corpus candidate join must stay an equi-join:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"batch and corpus sides must both read the persisted band relation:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q146: the manifest chain is doc_id equi-joins + max_by, no window") {
    val p = planString(SparkEntry.queries("q146_corpus_manifest")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every gate joins on doc_id/cluster_id equi-keys:\n$p")
    assert(p.contains("max_by"),
      s"survivor selection must stay the max_by aggregate:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q144: survivor selection is a max_by aggregate, never a per-cluster window") {
    val p = planString(SparkEntry.queries("q144_dedup_survivorship")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(p.contains("max_by"),
      s"survivor argmax must plan as the partial+final max_by aggregate:\n$p")
    assert(!p.contains("Window"), s"no ranking window should appear in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster/quality joins must stay equi-joins:\n$p")
  }

  test("q140: dedup pair join is an equi-join on the (cell, bucket) block key") {
    val p = planString(SparkEntry.queries("q140_semdedup")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere in:\n$p")
    // the only nested-loop join allowed is the ≤8-row broadcast quantizer
    // assignment; the pair join itself must hash/merge on (cell, bucket)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi pair join in:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"blocked relation must be computed once (persisted) in:\n$p")
    assert(!p.contains("Window"), s"no window should appear in:\n$p")
  }

  test("q141: codes come from the native pq_assign; top-k is an aggregation, not a window") {
    val df = SparkEntry.queries("q141_pq_adc_topk")(spark, dir)
    val p = planString(df)
    assert(p.contains("pq_assign"),
      s"database side must encode through the native pq_assign expression:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"per-query top-k must be the bounded partial+final aggregation:\n$p")
    assert(!p.contains("Window"), s"no ranking window in:\n$p")
  }

  test("q139: source labels join the verified pairs as equi-joins on a persisted projection") {
    val p = planString(SparkEntry.queries("q139_source_dup_matrix")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"label joins must stay equi-joins on doc id:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"(doc_id, source) projection must be persisted once for both sides:\n$p")
  }

  test("q147: pair mining runs over the distinct vocabulary; top-30 is a TakeOrdered") {
    val p = planString(SparkEntry.queries("q147_bpe_merge_pairs")(spark, dir))
    // two aggregation layers twice: (word count) and (pair rollup), each
    // partial+final — the token stream collapses before pair explosion
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregates for word counts AND pair rollup in:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the merge-table cut must be a bounded TakeOrdered, not a sort+limit:\n$p")
  }

  test("q109/q149/q150/q156/q165: gram queries read the shared bucketed postings table") {
    // The corpus-wide GramPostings table replaces the per-query
    // explode+distinct rebuild: each query's cache build must scan the
    // gram-bucketed parquet table (amortized once per JVM), not re-derive
    // postings from `documents`. Recurse into cached plans — the table
    // scan hides inside the per-query tracked cache.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def planTexts(plan: SparkPlan): Seq[String] = plan.toString() +: plan.collect {
      case a: AdaptiveSparkPlanExec => planTexts(a.executedPlan)
      case i: InMemoryTableScanExec => planTexts(i.relation.cachedPlan)
    }.flatten
    Seq("q109_substring_pairs", "q149_gram_novelty", "q150_gram_containment",
      "q156_split_leakage", "q165_leakage_pairs").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val texts = planTexts(df.queryExecution.executedPlan)
      graft.util.QueryCaches.drain()
      assert(texts.exists(_.contains("graft_postings13")),
        s"$name: expected a scan of the shared graft_postings13 bucketed " +
        s"table in:\n${texts.mkString("\n---\n")}")
    }
  }

  test("q149: novelty join is an equi-join reading one gram-partitioned cache") {
    val p = planString(SparkEntry.queries("q149_gram_novelty")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"first-seen join must stay an equi-join on the gram in:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"gram postings must be persisted once for df + join back in:\n$p")
  }

  test("q152: both truncation variants score in one pass; top-k is an aggregation") {
    val p = planString(SparkEntry.queries("q152_trunc_recall")(spark, dir))
    assert(p.contains("BroadcastExchange"),
      s"the 5-row query set must broadcast:\n$p")
    assert(!p.contains("Window"),
      s"per-query top-k must be the bounded aggregation, not a ranking window:\n$p")
    // both TopK states ride ONE grouped aggregation (partial+final), so
    // the corpus is scored in a single pass
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final object hash aggregate carrying both top-k states:\n$p")
  }

  test("q155: paraphrase candidates come from equi-joins over persisted relations") {
    val p = planString(SparkEntry.queries("q155_paraphrase_mining")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket pair join + shingle verify must stay equi-joins:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bucket signatures and shingle sets must each be persisted once:\n$p")
  }

  test("q150: containment joins are gram/doc equi-joins over persisted relations") {
    val p = planString(SparkEntry.queries("q150_gram_containment")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair + totals joins must stay equi-joins:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"the df-bounded gram relation must be persisted for its three consumers:\n$p")
  }

  test("q151: temperature mixture broadcasts the 1-row totals; aggregates partial+final") {
    val p = planString(SparkEntry.queries("q151_temp_mixture")(spark, dir))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row totals must broadcast (scalar crossJoin):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-source aggregate must be partial then final:\n$p")
  }

  test("q153: the per-lang cutoff relation broadcasts back onto the corpus") {
    val p = planString(SparkEntry.queries("q153_length_filter")(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"|langs|-row cutoffs must broadcast, never shuffle the corpus:\n$p")
    assert(p.contains("ReadSchema: struct<lang:string,n_chars:bigint>"),
      s"only (lang, n_chars) may be read from documents:\n$p")
  }

  test("q154: split assignment is map-side; the manifest aggregate is partial+final") {
    val p = planString(SparkEntry.queries("q154_split_manifest")(spark, dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate over (lang, split):\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"assignment must stay a pure map-side projection:\n$p")
  }

  test("q156: leakage probe is a gram equi-join over one persisted postings cache") {
    val p = planString(SparkEntry.queries("q156_split_leakage")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"train-membership probe must stay an equi-join on the gram:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"split-bucketed postings must be persisted once for both split sides:\n$p")
    assert(!p.contains("Window"),
      s"split assignment and leak rollup must never need a window:\n$p")
  }

  test("q158: holdout-to-train probe is a bucket equi-join over one persisted cache") {
    val p = planString(SparkEntry.queries("q158_semantic_leakage")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"holdout x train must stay a bucket equi-join:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"bucket+split signatures must be computed once in a shared cache:\n$p")
    assert(!p.contains("Window"),
      s"split assignment and leak rollup must never need a window:\n$p")
  }

  test("q159: the 256-row feature table broadcasts; per-doc rollup is partial+final") {
    val p = planString(SparkEntry.queries("q159_dsir_weight")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the bounded feature table must broadcast onto the doc counts:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the token reduce and doc rollup must aggregate partial then final:\n$p")
    assert(!p.contains("Window"),
      s"DSIR scoring must never need a window:\n$p")
  }

  test("q160: label rollup is equi-joins over bounded kNN edges, no ranking window") {
    val p = planString(SparkEntry.queries("q160_knn_label_consistency")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"label lookups must stay equi-joins:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ["),
      s"per-vector top-k must come from the bounded aggregation, not a window:\n$p")
  }

  test("q165: evidence pairs read one shared gram cache; equi-joins, no window") {
    val p = planString(SparkEntry.queries("q165_leakage_pairs")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"df-capped pair generation must stay a gram equi-join:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"split-bucketed postings must come from the shared splitGrams cache:\n$p")
    assert(!p.contains("Window"),
      s"pair rollup must never need a window:\n$p")
  }

  test("q166: centroid means broadcast back onto the member explode; no window") {
    val p = planString(SparkEntry.queries("q166_label_cohesion")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the |labels·dims|-row centroid relation must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"member-to-centroid pairing must stay an equi-join:\n$p")
    assert(!p.contains("Window"),
      s"cohesion rollup must never need a window:\n$p")
  }

  test("q168: PQ Lloyd step broadcasts the seed table; bounded partial+final aggs") {
    val p = planString(SparkEntry.queries("q168_pq_train_step")(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 256-row seed table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"seed lookup must stay an equi-join:\n$p")
    assert(!p.contains("Window"),
      s"centroid recompute must never need a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the (m, code, j) reduce must aggregate partial then final:\n$p")
  }

  test("q161: PQ distortion audit is join-free map-side work + a bounded aggregate") {
    val p = planString(SparkEntry.queries("q161_pq_distortion")(spark, dir))
    assert(!p.contains("Join"),
      s"the audit reads only pq_assign's extended output — no join may appear:\n$p")
    assert(!p.contains("Window"),
      s"distortion rollup must never need a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the (subspace, code) rollup must aggregate partial then final:\n$p")
  }

  test("q162: cluster-size histogram is two partial+final aggregates, no window") {
    val p = planString(SparkEntry.queries("q162_cluster_size_hist")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cluster rollup must stay equi-joins:\n$p")
    assert(!p.contains("Window"),
      s"per-cluster and histogram rollups must never need a window:\n$p")
  }

  test("q157: epoch plan broadcasts the 1-row totals; aggregates partial+final") {
    val p = planString(SparkEntry.queries("q157_epoch_plan")(spark, dir))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row totals must broadcast (scalar crossJoin):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-source aggregate must be partial then final:\n$p")
  }

  test("q148/q91: the global prefix sums plan with no single-partition " +
       "stage and no data-keyed window") {
    // GlobalRank.prefixSum's contract: the ONLY window partitions by the
    // range id (bounded partitions), and nothing — window, sort, or
    // exchange — funnels the full relation through one reducer before
    // the final declared ORDER BY. For q91 specifically this also pins
    // the round-6 verdict fix: the per-LANGUAGE running sum must NOT be
    // a Window.partitionBy("lang") (zipfian language mass = one-reducer
    // skew at 100 TB) — any surviving window may key only on the
    // synthetic range id. Checked structurally, recursing into cached
    // plans where the kernel hides its upstream.
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def offending(plan: SparkPlan): Seq[SparkPlan] = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty ||
        !w.partitionSpec.forall(_.references.map(_.name)
          .forall(_ == "__gr_pid")) => Seq(w)
      // A SinglePartition exchange is the scale-killer ONLY when row
      // data flows through it; the global scalar-aggregate shape
      // (partial agg with no grouping keys below the exchange — one row
      // per map task) is metadata-sized and fine (q224/q227 end in it).
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
        !(e.child match {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
            a.groupingExpressions.isEmpty
          case _ => false
        }) => Seq(e)
      case a: AdaptiveSparkPlanExec => offending(a.executedPlan)
      case i: InMemoryTableScanExec => offending(i.relation.cachedPlan)
    }.flatten
    // q224 (two chained prefix sums) and q227 (prefixMax) joined the
    // kernel's consumers this round — same contract: any surviving
    // window keys only on the synthetic range id, and no stage may
    // collapse to a single partition.
    Seq("q148_shard_plan", "q91_sequence_pack", "q224_ks_test",
      "q227_late_event_curve").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val bad = offending(df.queryExecution.executedPlan)
      graft.util.QueryCaches.drain()
      assert(bad.isEmpty,
        s"$name: single-partition or data-keyed window stage(s) in the " +
        s"prefix-sum plan:\n${bad.mkString("\n")}")
    }
  }

  test("q181: PageRank iterations are equi-joins over bounded edges, no window") {
    // The Pregel shape must hold in the plan: 5 declared iterations of
    // (edge ⨝ rank → partial+final groupBy), never a ranking window and
    // never a cartesian rank×rank product. The only nested-loop joins
    // are the 1-row node-count broadcasts.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(plan: SparkPlan): Seq[WindowExec] = plan.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case i: InMemoryTableScanExec => windows(i.relation.cachedPlan)
    }.flatten
    val df = SparkEntry.queries("q181_pagerank")(spark, dir)
    val p = planString(df)
    val wins = windows(df.queryExecution.executedPlan)
    graft.util.QueryCaches.drain()
    assert(wins.isEmpty, s"q181: unexpected Window stage(s):\n$wins")
    assert(!p.contains("CartesianProduct"), s"q181 cartesian:\n$p")
  }

  test("q182: shard-migration audit is join-free map-side work + aggregates") {
    val p = planString(SparkEntry.queries("q182_shard_migration")(spark, dir))
    assert(!p.contains("Join"), s"q182 must not join anything:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregates in:\n$p")
  }

  test("q184: hard-negative mining joins on the hyperplane bucket, top-k is an aggregation") {
    val p = planString(SparkEntry.queries("q184_hard_negatives")(spark, dir))
    graft.util.QueryCaches.drain()
    assert(p.contains("bucket"), s"expected the bucket equi-join key in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q184 must stay an equi join:\n$p")
    assert(!p.contains("Window"), s"q184 top-k must not be a window:\n$p")
  }
}
