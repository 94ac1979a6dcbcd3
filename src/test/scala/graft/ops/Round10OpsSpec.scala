package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Crafted-input semantics for the round-10 additions (q273 HLL set
  * algebra, q274 sorted-neighborhood blocking, q275 RRF, q276 MMR): the
  * DuckDB gate proves cross-engine parity; these prove the MEANING on
  * inputs where the right answer is known in closed form.
  */
class Round10OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def eventsDir(users: Map[String, Range]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-events")
    users.toSeq.flatMap { case (et, r) =>
      r.map(u => (u.toLong, Timestamp.valueOf("2024-01-01 00:00:00"),
        u.toLong, et, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def docsDir(docs: Seq[(Long, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-docs")
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def embDir(vecs: Seq[(Long, Seq[Float])]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-emb")
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q273: exact overlap is recovered exactly; HLL estimates land within 4-sigma") {
    // A = 1..5000, B = 2501..7500: |A∩B| = 2500, |A∪B| = 7500 — large
    // enough that the raw-harmonic branch (not linear counting) runs.
    val dir = eventsDir(Map("a_click" -> (1 to 5000), "b_view" -> (2501 to 7500)))
    val r = graft.SparkEntry.queries("q273_hll_set_algebra")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    assert(r.length === 1)
    val row = r(0)
    def d(n: String) = row.getDouble(row.fieldIndex(n))
    def l(n: String) = row.getLong(row.fieldIndex(n))
    assert(l("exact_a") === 5000L && l("exact_b") === 5000L)
    assert(l("exact_inter") === 2500L && l("exact_union") === 7500L)
    // m=1024 → relative sigma ≈ 1.04/sqrt(1024) ≈ 3.25%; allow 4 sigma
    assert(math.abs(d("est_a") - 5000) < 5000 * 0.13, s"est_a=${d("est_a")}")
    assert(math.abs(d("est_b") - 5000) < 5000 * 0.13, s"est_b=${d("est_b")}")
    assert(math.abs(d("est_union") - 7500) < 7500 * 0.13,
      s"est_union=${d("est_union")}")
    // inclusion–exclusion intersection: errors of three sketches compound
    assert(math.abs(d("est_inter") - 2500) < 2500 * 0.4,
      s"est_inter=${d("est_inter")}")
    // the reported algebra must be internally consistent
    assert(math.abs(d("est_inter") - (d("est_a") + d("est_b") - d("est_union"))) < 1e-3)
  }

  test("q274: the forward pass catches a tail edit, the reverse pass a head edit") {
    // 12 fillers with disjoint vocabulary spread the sort space so the
    // planted pairs are NOT trivially within one window of everything.
    val fillers = (0 until 12).map { i =>
      (10L + i, (0 until 10).map(j => s"f${i}w$j").mkString(" "))
    }
    // pair X: identical except the LAST word — same forward key
    val x1 = (1L, (1 to 11).map(j => s"x$j").mkString(" ") + " enda")
    val x2 = (2L, (1 to 11).map(j => s"x$j").mkString(" ") + " endb")
    // pair Y: identical except the FIRST word — same reverse key
    val y1 = (3L, "heada " + (2 to 12).map(j => s"y$j").mkString(" "))
    val y2 = (4L, "headb " + (2 to 12).map(j => s"y$j").mkString(" "))
    val dir = docsDir(fillers ++ Seq(x1, x2, y1, y2))
    val pairs = graft.SparkEntry.queries("q274_sorted_neighborhood")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.QueryCaches.drain()
    assert(pairs === Set((1L, 2L), (3L, 4L)),
      s"expected exactly the two planted pairs, got $pairs")
  }

  test("q275: a doc ranked by both legs outranks single-leg docs of equal rank") {
    // Structural smoke on the real fixture: 5 queries x top-10, fused
    // score non-increasing within each query (the TopK contract).
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q275_rrf_fusion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    graft.util.QueryCaches.drain()
    assert(rows.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    rows.groupBy(_._1).values.foreach { qr =>
      val byRank = qr.sortBy(_._2).map(_._3)
      assert(byRank.length === 10)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"rrf must be non-increasing in rank: ${byRank.toSeq}")
      // two-leg membership dominates: rank-1 fused score must exceed the
      // best possible single-leg score 1/61
      assert(byRank.head > 1.0 / 61.0 || byRank.head > byRank.last)
    }
  }

  test("q277: identical vectors project to zero distortion; histogram covers all pairs") {
    // 4 blocks of 61 vectors so ids 0, 61, 122, 183 are sampled pair
    // heads; make each sampled pair (i, i+1) IDENTICAL vectors — the JL
    // projection of equal inputs is equal, so cos64 = cos16 = 1 exactly
    // and every pair lands in bucket 0 with distortion 0.
    val base = (0 until 244).map { i =>
      // members of a sampled pair (i, i+1 with i % 61 == 0) share a key
      val key = if (i % 61 == 1) i - 1 else i
      val v = (0 until 64).map(j => (math.sin(key * 64 + j) * 0.5).toFloat)
      i.toLong -> v
    }
    val dir = embDir(base)
    val rows = graft.SparkEntry.queries("q277_jl_distortion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.util.QueryCaches.drain()
    assert(rows.toSeq === Seq((0L, 4L, 0.0)),
      s"4 identical pairs must land in bucket 0 at distortion 0, got ${rows.toSeq}")
  }

  test("q278: the exact re-rank is lossless — recall is exactly shortlist recall") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q278_jl_ann_recall")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(rows.length === 5)
    rows.foreach { r =>
      val nExact = r.getLong(r.fieldIndex("n_exact"))
      val nHit = r.getLong(r.fieldIndex("n_hit"))
      val nShort = r.getLong(r.fieldIndex("n_in_shortlist"))
      val recall = r.getDouble(r.fieldIndex("recall_at_10"))
      assert(nExact === 10L)
      assert(nHit === nShort,
        s"re-rank must recover every exact hit the shortlist contains ($nHit vs $nShort)")
      assert(recall === nHit.toDouble / 10.0)
    }
  }

  test("q279: picks the modal A<>B pair and rewrites every match site") {
    // pairs: (a,b) x3 (winner), (b,a), (b,c), (c,a), (b,d), (b,b) is
    // filtered (A = B needs the sequential scan the operator declares
    // out of scope). Rewrites: "a_b a_b c" (5->3), "c a_b d" (4->3),
    // "a_b b a_b" (5->3... no: 'a b b a b' -> a_b, b, a_b = 3).
    val dir = docsDir(Seq(
      (0L, "a b a b c"), (1L, "c a b d"), (2L, "a b b a b")))
    val r = graft.SparkEntry.queries("q279_bpe_merge_step")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    assert(r.length === 1)
    val row = r(0)
    def l(n: String) = row.getLong(row.fieldIndex(n))
    assert(row.getString(0) === "a" && row.getString(1) === "b")
    // (a,b) occurs 2 + 1 + 2 = 5 times
    assert(l("pair_count") === 5L)
    assert(l("n_tokens_before") === 14L && l("n_tokens_after") === 9L)
    assert(l("n_merges") === 5L)
    // vocab {a,b,c,d} -> {a_b,b,c,d} (b survives in doc 2)
    assert(l("vocab_before") === 4L && l("vocab_after") === 4L)
  }

  test("q280: teleport mass stays on seeds yet expands to related non-seeds") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q280_personalized_pagerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    graft.util.QueryCaches.drain()
    assert(rows.length === 20)
    // mass conservation: total <= S (floor-division + dangling edges leak)
    assert(rows.map(_._3).sum <= 1000000000000L)
    assert(rows.forall { case (id, seed, q) => seed === (id < 5) && q >= 0L })
    // sorted by mass desc (ties by id)
    val masses = rows.map(_._3)
    assert(masses.zip(masses.tail).forall { case (a, b) => a >= b })
    // the walk must EXPAND: some non-seed carries positive mass
    assert(rows.exists { case (_, seed, q) => !seed && q > 0L },
      "personalization must propagate mass beyond the seed set")
  }

  test("q281: holdout confusion accounting is internally consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q281_label_propagation_ssl")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nH = r.getLong(r.fieldIndex("n_holdout"))
      val nP = r.getLong(r.fieldIndex("n_predicted"))
      val nC = r.getLong(r.fieldIndex("n_correct"))
      val acc = r.getDouble(r.fieldIndex("accuracy"))
      assert(nC <= nP && nP <= nH && nH > 0)
      assert(acc === (if (nP == 0) 0.0 else nC.toDouble / nP))
    }
    // the graph is connected enough that SOME holdout node gets a label
    assert(rows.map(_.getLong(2)).sum > 0, "propagation must reach the holdout")
  }

  test("q282: textbook K-M trace — censored users leave the risk set without a churn event") {
    // Window end = day 20; censor threshold = day 13 (end − 7 d):
    //  u1/u2: lifetime 2, churned   u3: lifetime 5, churned
    //  u4: day 2→20, lifetime 18, ACTIVE at end (censored)
    //  u5: day 20 only, lifetime 0, censored
    // K-M: S(0)=1 (no churn, u5 leaves censored); S(2)=1·(1−2/4)=.5;
    // S(5)=.5·(1−1/2)=.25; day 18 censored only → factor 1 → S=.25.
    def ev(id: Long, uid: Long, day: Int): (Long, Timestamp, Long, String, Double, String) =
      (id, Timestamp.valueOf(java.time.LocalDate.of(2024, 3, 1)
        .plusDays(day).atTime(12, 0)), uid, "a", 1.0, "{}")
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-km")
    Seq(
      ev(1, 1, 0), ev(2, 1, 2),
      ev(3, 2, 0), ev(4, 2, 2),
      ev(5, 3, 0), ev(6, 3, 5),
      ev(7, 4, 2), ev(8, 4, 20),
      ev(9, 5, 20)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("q282_kaplan_meier")(spark, d)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    graft.util.QueryCaches.drain()
    assert(rows(0L) === ((5L, 0L, 1L, 1.0)))    // u5 censored at 0, no churn
    assert(rows(2L) === ((4L, 2L, 0L, 0.5)))
    assert(rows(5L) === ((2L, 1L, 0L, 0.25)))
    assert(rows(18L) === ((1L, 0L, 1L, 0.25)))  // u4 censored, S unchanged
  }

  test("q276: round 2 trades relevance for diversity") {
    // Query 0 = (1,0,0,0); vecs 1–4 are low-relevance fillers (cos ≈ .1,
    // also the other query ids — their own result sets are irrelevant
    // here); A (vec 5, rel .95) and its near-copy A' (vec 6, rel .94,
    // sim(A,A') ≈ .9995); B (vec 7, rel .90 but diverse: sim(A,B) ≈ .72).
    // Greedy trace for query 0 with λ=0.7:
    //   round 1: A (highest relevance).
    //   round 2: A' scores .7·.94 − .3·.9995 ≈ .358;
    //            B  scores .7·.90 − .3·.719  ≈ .414 → B wins despite
    //            lower relevance — the whole point of MMR.
    val q = Seq(1f, 0f, 0f, 0f)
    val f = Seq(
      Seq(0.1f, 0.99499f, 0f, 0f), Seq(0.1f, 0f, 0.99499f, 0f),
      Seq(0.1f, 0f, 0f, 0.99499f), Seq(0.1f, -0.99499f, 0f, 0f))
    val a = Seq(0.95f, 0.3122499f, 0f, 0f)
    val a2 = Seq(0.94f, 0.3411744f, 0f, 0f)
    val b = Seq(0.90f, -0.4358899f, 0f, 0f)
    val dir = embDir(Seq(0L -> q, 1L -> f(0), 2L -> f(1), 3L -> f(2),
      4L -> f(3), 5L -> a, 6L -> a2, 7L -> b))
    val rows = graft.SparkEntry.queries("q276_mmr_diversify")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    graft.util.QueryCaches.drain()
    assert(rows((0L, 1)) === 5L, s"round 1 must pick A, got ${rows((0L, 1))}")
    assert(rows((0L, 2)) === 7L,
      s"round 2 must pick diverse B over near-copy A', got ${rows((0L, 2))}")
    // 5 queries × 5 rounds, every pick distinct within its query
    assert(rows.size === 25)
    (0L to 4L).foreach { qid =>
      val picks = (1 to 5).map(r => rows((qid, r)))
      assert(picks.distinct.length === 5, s"query $qid repicked: $picks")
    }
  }

  test("q283: CM estimates are exact on a collision-free vocabulary and never undercount") {
    // 3-token vocabulary in 4×1024 cells: md5-collision-free in every
    // row (deterministic given the fixed hash), so est == exact and the
    // top-30 ordering is (count desc, token asc).
    val dir = docsDir(Seq(
      1L -> "alpha alpha alpha beta", 2L -> "alpha beta gamma",
      3L -> "beta gamma gamma gamma gamma"))
    val r = graft.SparkEntry.queries("q283_cms_frequency")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(r.map(_.getString(0)).toSeq === Seq("gamma", "alpha", "beta"))
    r.foreach { row =>
      val (exact, est, over) = (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(est >= exact, s"CM must never undercount: $row")
      assert(over === 0L, s"collision-free input must be exact: $row")
      assert(row.getLong(5) === 12L, "n_stream is the full token stream")
    }
    assert(r.map(_.getLong(1)).toSeq === Seq(5L, 4L, 3L))
  }

  private def embLabDir(vecs: Seq[(Long, Seq[Float], Int)]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-emblab")
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def e64(head: Float*): Seq[Float] =
    head ++ Seq.fill(64 - head.length)(0f)

  test("q284: AUC is 1 on separable scores, 0.5 on all-ties, 0.75 on a known 3-of-4 ordering") {
    def auc(vecs: Seq[(Long, Seq[Float], Int)]): (Long, Long, Double) = {
      val dir = embLabDir(vecs)
      val r = graft.SparkEntry.queries("q284_auc_centroid")(spark, dir).collect()
      graft.util.QueryCaches.drain()
      assert(r.length === 1)
      (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(3))
    }
    // class 0 along +e1, class 1 along -e1: every positive outscores
    // every negative against the class-0 centroid.
    val (p1, n1, a1) = auc(Seq(
      (0L, e64(1f), 0), (1L, e64(0.5f), 0),
      (2L, e64(-0.5f), 1), (3L, e64(-1f), 1)))
    assert((p1, n1) === ((2L, 2L)) && a1 === 1.0)
    // identical vectors: one 4-way tie, midrank credit → exactly 0.5
    val (_, _, a2) = auc(Seq(
      (0L, e64(1f), 0), (1L, e64(1f), 0),
      (2L, e64(1f), 1), (3L, e64(1f), 1)))
    assert(a2 === 0.5)
    // scores ∝ e1-component: pos {1.0, 0.25}, neg {0.5, 0.0} →
    // 3 of the 4 (pos, neg) pairs rank correctly → AUC 0.75
    val (_, _, a3) = auc(Seq(
      (0L, e64(1f), 0), (1L, e64(0.25f), 0),
      (2L, e64(0.5f), 1), (3L, e64(0f), 1)))
    assert(a3 === 0.75)
  }

  test("q291: AP is 1 when separable, 0.5 on all-ties, 5/6 on a known 3-of-4 ordering") {
    def ap(vecs: Seq[(Long, Seq[Float], Int)]): Double = {
      val dir = embLabDir(vecs)
      val r = graft.SparkEntry.queries("q291_avg_precision")(spark, dir)
        .collect()
      graft.util.QueryCaches.drain()
      assert(r.length === 1)
      r(0).getDouble(3)
    }
    assert(ap(Seq((0L, e64(1f), 0), (1L, e64(0.5f), 0),
      (2L, e64(-0.5f), 1), (3L, e64(-1f), 1))) === 1.0)
    // one 4-block tie: P = 2/4 at the single threshold → AP 0.5
    assert(ap(Seq((0L, e64(1f), 0), (1L, e64(1f), 0),
      (2L, e64(1f), 1), (3L, e64(1f), 1))) === 0.5)
    // blocks desc: pos(P=1/1), neg, pos(P=2/3), neg → AP = (1 + 2/3)/2
    val a = ap(Seq((0L, e64(1f), 0), (1L, e64(0.25f), 0),
      (2L, e64(0.5f), 1), (3L, e64(0f), 1)))
    assert(math.abs(a - 5.0 / 6) < 1e-6, s"AP: $a")
  }

  test("q289: ECE is 0 when score bins match label rates, 0.2 on a known miscalibration") {
    def bins(vecs: Seq[(Long, Seq[Float], Int)]) = {
      val dir = embLabDir(vecs)
      val r = graft.SparkEntry.queries("q289_ece_calibration")(spark, dir)
        .collect().map(row => (row.getLong(0), row.getLong(1),
          row.getDouble(2), row.getDouble(3), row.getDouble(4)))
      graft.util.QueryCaches.drain()
      r.toSeq
    }
    // 5 class-0 at score s > 0, 5 class-1 at score 0: bin 9 is all
    // positive at conf 1, bin 0 all negative at conf 0 — ECE exactly 0.
    val calibrated = bins(
      (0 until 5).map(i => (i.toLong, e64(1f), 0)) ++
        (5 until 10).map(i => (i.toLong, e64(0f), 1)))
    assert(calibrated === Seq((0L, 5L, 0.0, 0.0, 0.0),
      (9L, 5L, 1.0, 1.0, 0.0)))
    // Move 2 of the 5 zero-score vectors to class 0: bin 0 now claims
    // conf 0 but delivers 2/5 → ECE = (5·|0.4−0|)/10 = 0.2.
    val off = bins(
      (0 until 5).map(i => (i.toLong, e64(1f), 0)) ++
        (5 until 7).map(i => (i.toLong, e64(0f), 0)) ++
        (7 until 10).map(i => (i.toLong, e64(0f), 1)))
    assert(off === Seq((0L, 5L, 0.0, 0.4, 0.2), (9L, 5L, 1.0, 1.0, 0.2)))
  }

  test("q290: l-diversity flags exactly the cells below 5 distinct users") {
    // One event per user per type, single hour: cell "many" has 10
    // distinct users (safe), cell "few" has 3 (risky).
    val dir = eventsDir(Map("many" -> (1 to 10), "few" -> (11 to 13)))
    val r = graft.SparkEntry.queries("q290_l_diversity")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(r.length === 1)
    val row = r(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === ((2L, 1L, 3L, 3L, 10L)))
    assert(math.abs(row.getDouble(5) - 3.0 / 13) < 1e-9)
  }

  private def docsSrcDir(docs: Seq[(Long, String, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("graft-r10-docsrc")
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q292: PSI is exactly 0 for a same-shape source and matches the closed form for a shifted one") {
    // Bins are n_chars div 64. Source R (reference, 12 docs): 6 short +
    // 6 long. Source S (6 docs): 3 + 3 — identical smoothed shape
    // (7/14, 7/14) vs (4/8, 4/8) → PSI exactly 0. Source T (4 docs):
    // all short → smoothed (5/6, 1/6) vs (1/2, 1/2).
    val short = "x" * 10
    val long = "y" * 70
    val dir = docsSrcDir(
      (0 until 6).map(i => (i.toLong, short, "r")) ++
        (6 until 12).map(i => (i.toLong, long, "r")) ++
        (12 until 15).map(i => (i.toLong, short, "s")) ++
        (15 until 18).map(i => (i.toLong, long, "s")) ++
        (18 until 22).map(i => (i.toLong, short, "t")))
    val r = graft.SparkEntry.queries("q292_psi_drift")(spark, dir)
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    graft.util.QueryCaches.drain()
    assert(r("r") === ((12L, 2L, 0.0)), "reference scores itself at 0")
    assert(r("s") === ((6L, 2L, 0.0)), "same shape after smoothing is 0")
    def log2(x: Double) = math.log(x) / math.log(2)
    def q7(x: Double) = math.round(x * 1e7) / 1e7
    val expected = q7((5.0 / 6 - 0.5) * log2((5.0 / 6) / 0.5)) +
      q7((1.0 / 6 - 0.5) * log2((1.0 / 6) / 0.5))
    assert(r("t")._1 === 4L)
    assert(math.abs(r("t")._3 - expected) < 1e-6, s"t PSI: ${r("t")._3} vs $expected")
  }

  // Two exact-duplicate triples on +e1 / −e1: the sign flip complements
  // every hyperplane bit (plane·e1 = ±1, never 0), so the two triples are
  // guaranteed distinct LSH buckets and the kNN graph is two disjoint
  // 3-cliques at cos = 1 — closed-form geometry with no dependence on
  // the seeded plane pattern.
  private def twoCliqueDir(): String = embDir(Seq(
    0L -> e64(1f), 1L -> e64(1f), 2L -> e64(1f),
    3L -> e64(-1f), 4L -> e64(-1f), 5L -> e64(-1f)))

  test("q285: Boruvka picks form the exact min-forest on two duplicate cliques") {
    val dir = twoCliqueDir()
    val r = graft.SparkEntry.queries("q285_boruvka_step")(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1),
        row.getLong(2), row.getInt(3)))
    graft.util.QueryCaches.drain()
    // Per clique {x, x+1, x+2} at distance 0: nodes x and x+1 both pick
    // (x, x+1) — mutual, picked_by 2; node x+2's min edge by the
    // (dist, a, b) total order is (x, x+2) — picked_by 1.
    assert(r.toSeq === Seq((0L, 1L, 0L, 2), (0L, 2L, 0L, 1),
      (3L, 4L, 0L, 2), (3L, 5L, 0L, 1)))
    // Forest closed form: 6 nodes − 4 picked edges = 2 trees.
    val nodes = r.flatMap(e => Seq(e._1, e._2)).distinct.length
    assert(nodes - r.length === 2)
  }

  test("q286: interpolated Kneser-Ney matches hand-computed probabilities on a 2-word corpus") {
    // Corpus over vocabulary {a, b}: doc 1 = "a a b b" (bigrams aa, ab,
    // bb), doc 2 = "b a b a" (ba, ab, ba). Type counts aa:1 ab:2 bb:1
    // ba:2, T = 4 types, left marginals c(a•) = c(b•) = 3, every fan-in/
    // fan-out = 2. With d = 3/4:
    //   P(a|a) = 1/12 + (3·2/12)(2/4) = 1/3,  P(b|a) = 5/12 + 3/12 = 2/3
    // and symmetrically P(b|b) = 1/3, P(a|b) = 2/3 — each context's
    // probabilities sum to exactly 1 (the interpolated-KN invariant).
    val dir = docsDir(Seq(1L -> "a a b b", 2L -> "b a b a"))
    val r = graft.SparkEntry.queries("q286_kneser_ney")(spark, dir)
      .collect().map(row => row.getLong(0) ->
        (row.getLong(1), row.getDouble(2))).toMap
    graft.util.QueryCaches.drain()
    val l13 = math.round(math.log(1.0 / 3) / math.log(2) * 1e7) / 1e7
    val l23 = math.round(math.log(2.0 / 3) / math.log(2) * 1e7) / 1e7
    assert(r(1L)._1 === 3L && r(2L)._1 === 3L)
    assert(math.abs(r(1L)._2 - (2 * l13 + l23) / 3) < 1e-9,
      s"doc 1 scores P(aa)·P(ab)·P(bb): ${r(1L)}")
    assert(math.abs(r(2L)._2 - l23) < 1e-9,
      s"doc 2 scores P(ba)·P(ab)·P(ba) = (2/3)^3: ${r(2L)}")
  }

  test("q288: skyline keeps exactly the non-dominated (length, richness) cells") {
    val dir = docsDir(Seq(
      1L -> "x y z",          // (5, 3)  dominated by (14, 3)
      2L -> "x x x x",        // (7, 1)  dominated by (9, 5)
      3L -> "ab cd",          // (5, 2)  dominated by (5, 3) same-x
      4L -> "aaaa bbbb cccc", // (14, 3) frontier: longest
      5L -> "q w e r t",      // (9, 5)  frontier: richest
      6L -> "q w e r t"))     // duplicate cell rides the frontier point
    val r = graft.SparkEntry.queries("q288_pareto_skyline")(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    graft.util.QueryCaches.drain()
    assert(r.toSeq === Seq((9L, 5L, 2L), (14L, 3L, 1L)))
  }

  test("q293: power iteration locks onto the dominant axis with exact integer fixpoint") {
    // 5 vectors on e1, 3 on e2: M = diag(5, 3)·2⁴⁰ and x0 = e1·2²⁰ is
    // already the exact eigendirection — every round reproduces
    // x = (2²⁰, 0, …) bit-for-bit (y = 5·2³⁶ = d·2²⁰ exactly), and the
    // Rayleigh numerator is 5 rows × round((2⁴⁰)²/2⁴⁰) = 5·2⁴⁰.
    val dir = embDir(
      (0 until 5).map(i => i.toLong -> e64(1f)) ++
        (5 until 8).map(i => i.toLong -> e64(0f, 1f)))
    val r = graft.SparkEntry.queries("q293_pca_power")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(r.length === 64)
    r.foreach { row =>
      val (j, xj) = (row.getInt(0), row.getLong(1))
      assert(xj === (if (j == 0) 1048576L else 0L), s"x[$j] = $xj")
      assert(row.getLong(2) === 8L)
      assert(row.getLong(3) === 1099511627776L, "xtx = 2^40")
      assert(row.getLong(4) === 5L * 1099511627776L, "rayleigh = 5*2^40")
    }
  }

  test("q294: farthest-point traversal picks the 5 orthogonal exemplars in id order") {
    // ids 0..4 on axes e1..e5, ids 5..7 duplicating e1..e3: every
    // uncovered axis sits at the same distance 2⁴⁰, so the (dist desc,
    // id asc) tie-break must add centers 1, 2, 3, 4 in order; the
    // duplicates then assign at radius 0.
    def axis(k: Int): Seq[Float] = e64(Seq.fill(k)(0f) :+ 1f: _*)
    val dir = embDir(Seq(
      0L -> axis(0), 1L -> axis(1), 2L -> axis(2), 3L -> axis(3),
      4L -> axis(4), 5L -> axis(0), 6L -> axis(1), 7L -> axis(2)))
    val r = graft.SparkEntry.queries("q294_kcenter_coreset")(spark, dir)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    graft.util.QueryCaches.drain()
    assert(r.toSeq === Seq((0L, 2L, 0L), (1L, 2L, 0L), (2L, 2L, 0L),
      (3L, 1L, 0L), (4L, 1L, 0L)))
  }

  test("q287: LOF is exactly 1 everywhere on uniform-density cliques") {
    val dir = twoCliqueDir()
    val r = graft.SparkEntry.queries("q287_lof_outliers")(spark, dir)
      .collect()
    graft.util.QueryCaches.drain()
    assert(r.length === 6)
    r.foreach { row =>
      // deg 2, duplicate distances floored to 1 quantum → kdist 1,
      // sum_reach 2, every lrd equal → LOF exactly 1.0.
      assert(row.getLong(1) === 2L, s"deg: $row")
      assert(row.getLong(2) === 1L, s"kdist_q: $row")
      assert(row.getLong(3) === 2L, s"sum_reach_q: $row")
      assert(row.getDouble(4) === 1.0, s"uniform density must give LOF 1: $row")
    }
  }

  test("q287 precondition: every kNN neighbor_id is itself a kNN source") {
    // q287's lrd/kd joins are INNER on the neighbor side: they rely on
    // every neighbor being a source row of the kNN relation (it shares a
    // bucket with its picker, so it has >=1 in-bucket neighbor). If
    // knnNeighbors ever gains a degree/score filter, the joins would
    // silently drop reach-dist terms and skew LOF instead of failing —
    // this pins the invariant loudly (ADVICE round-10).
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    graft.util.QueryCaches.drain()
    val knn = Similarity.knnNeighbors(spark, dir)
    val orphans = knn.select(col("neighbor_id").as("vec_id")).distinct()
      .join(knn.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .count()
    graft.util.QueryCaches.drain()
    assert(orphans === 0L,
      s"$orphans neighbor ids are not kNN sources — q287's inner joins would drop their reach terms")
  }
}
