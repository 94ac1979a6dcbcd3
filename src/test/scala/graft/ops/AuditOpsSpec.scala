package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.SparkEntry

/** Executable semantics for the corpus-audit trio q158/q159/q160:
  * planted-fixture leakage for the semantic decontamination audit, and
  * full driver-side replications of the DSIR weights and the kNN
  * label-consistency rollup on real sf0.001 data.
  */
class AuditOpsSpec extends AnyFunSuite
  with org.scalatest.BeforeAndAfterEach {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  override def afterEach(): Unit = graft.util.QueryCaches.drain()

  /** The same digest-mod split bucket the kernels derive, driver-side. */
  private def splitBucket(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 4), 16) % 100
  }

  test("q158 kernel: verbatim train copy leaks; orthogonal holdout does not") {
    val spark2 = spark
    import spark2.implicits._
    val ids = 0L until 4000L
    val trainId = ids.find(splitBucket(_) < 98).get
    val valId = ids.find(splitBucket(_) == 98).get
    val testId = ids.find(splitBucket(_) == 99).get
    // base: nonzero pattern; orth: dot(base, orth) = 0 by construction,
    // so even a bucket collision scores cosine 0 < 0.35
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else 0.5f)
    val orth = Array.tabulate(64)(i =>
      if (i % 2 == 0) 0.5f else -1.0f) // Σ (1*0.5 + 0.5*(-1)) per pair = 0
    val emb = Seq((trainId, base), (valId, base), (testId, orth))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticLeakage(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // identical vectors share every hyperplane sign → guaranteed same
    // bucket → the copy is retrieved and scores exactly 1.0
    assert(out(valId)._1 === "val")
    assert(out(valId)._2 >= 1L, "verbatim copy must be a candidate")
    assert(out(valId)._3 === 1.0)
    assert(out(valId)._4, "verbatim train copy must flag as leaked")
    // the orthogonal holdout vector can never clear the 0.35 bar,
    // whether or not it shares the copy's bucket
    assert(out(testId)._1 === "test")
    assert(!out(testId)._4, "orthogonal holdout must not flag as leaked")
    assert(out(testId)._3 < 0.35)
    assert(!out.contains(trainId), "train vectors are never audited")
  }

  test("q158 on real data: every holdout vector appears once, flags consistent") {
    val emb = graft.source.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0))
    val holdout = emb.filter(splitBucket(_) >= 98).toSet
    val out = SparkEntry.queries("q158_semantic_leakage")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet === holdout)
    assert(out.length === holdout.size)
    out.foreach { r =>
      val expectSplit = if (splitBucket(r.getLong(0)) == 98) "val" else "test"
      assert(r.getString(1) === expectSplit)
      assert(r.getBoolean(4) === (r.getDouble(3) >= 0.35))
      if (r.getLong(2) == 0L) assert(r.getDouble(3) === -2.0)
    }
  }

  test("q159 matches a driver-side DSIR replication at sf0.001") {
    def feat(w: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 256
    }
    // target flags from q54's declared output (the shared blend)
    val keep = SparkEntry.queries("q54_quality_filter")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    graft.util.QueryCaches.drain()
    val docs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val dc: Map[Long, Map[Int, Long]] = docs.map { case (id, toks) =>
      id -> toks.groupBy(feat).map { case (f, ws) => f -> ws.size.toLong }
    }.toMap
    val feats = dc.values.flatMap(_.keys).toSet
    val ft = feats.map { f =>
      val nT = dc.collect { case (id, m) if keep(id) => m.getOrElse(f, 0L) }.sum
      val nR = dc.valuesIterator.map(_.getOrElse(f, 0L)).sum
      f -> ((nT, nR))
    }.toMap
    val tTot = ft.values.map(_._1).sum
    val rTot = ft.values.map(_._2).sum
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    val lrQ = ft.map { case (f, (nT, nR)) =>
      f -> math.round(log2(((nT + 1).toDouble * (rTot + 256)) /
        ((nR + 1).toDouble * (tTot + 256))) * 1e7)
    }
    val expect = dc.map { case (id, m) =>
      id -> m.map { case (f, c) => c * lrQ(f) }.sum.toDouble / 1e7
    }
    val out = SparkEntry.queries("q159_dsir_weight")(spark, dir).collect()
    assert(out.length === docs.length)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === docs.find(_._1 == id).get._2.size)
      // quantization means a 1-ulp log2 divergence can only move the
      // weight by c/1e7 per feature — 1e-3 is orders above that
      assert(math.abs(r.getDouble(2) - expect(id)) < 1e-3,
        s"doc $id: spark ${r.getDouble(2)} vs replica ${expect(id)}")
    }
  }

  test("q161 distortion totals reconcile with q133's declared per-vector errors") {
    val q133 = SparkEntry.queries("q133_pq_assign")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val out = SparkEntry.queries("q161_pq_distortion")(spark, dir).collect()
    // every vector appears once per subspace
    val nVecs = q133.length.toLong
    (0 until 4).foreach { m =>
      val rows = out.filter(_.getInt(0) == m)
      assert(rows.map(_.getLong(2)).sum === nVecs, s"subspace $m covers the corpus")
    }
    // summed (subspace, code) distortion == summed per-vector err_q
    assert(out.map(_.getLong(3)).sum === q133.map(_.getLong(5)).sum)
    out.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / r.getLong(2).toDouble / 1e9) < 1e-12)
    }
  }

  test("q168 training step reconciles with q161's assignment counts") {
    val dist = SparkEntry.queries("q161_pq_distortion")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    graft.util.QueryCaches.drain()
    val out = SparkEntry.queries("q168_pq_train_step")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    // both queries run the same pq_assign argmin, so occupied cells and
    // member counts must agree exactly
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSet === dist.keySet)
    out.foreach { r =>
      assert(r.getLong(2) === dist((r.getInt(0), r.getInt(1))))
      assert(r.getDouble(3) >= 0.0)
    }
    // a Lloyd step moves a non-degenerate codebook: some cell must shift
    assert(out.exists(_.getDouble(3) > 0.0))
  }

  test("q162 histogram reconciles with q56's declared clusters") {
    val q56 = SparkEntry.queries("q56_dedup_clusters")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val chars = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = q56.groupBy(_.getLong(1))
    val expect = byCluster.values.groupBy(_.size).map { case (sz, cs) =>
      val reclaimed = cs.map(_.filterNot(r => r.getBoolean(2))
        .map(r => chars(r.getLong(0))).sum).sum
      sz.toLong -> ((cs.size.toLong, (sz * cs.size).toLong, reclaimed))
    }
    val out = SparkEntry.queries("q162_cluster_size_hist")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).toSet === expect.keySet)
    out.foreach { r =>
      val (nc, nd, rc) = expect(r.getLong(0))
      assert(r.getLong(1) === nc)
      assert(r.getLong(2) === nd)
      assert(r.getLong(3) === rc)
      assert(r.getLong(0) >= 2L, "a cluster in the dup graph has at least 2 members")
    }
  }

  test("q163 curve is a complete monotone partition of the corpus token mass") {
    val out = SparkEntry.queries("q163_quality_token_curve")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val nDocs = graft.source.Tables.documents(spark, dir).count()
    assert(out.map(_.getInt(0)).toSeq === (1 to 10))
    assert(out.map(_.getLong(1)).sum === nDocs)
    // cumulative tokens strictly increase and end at the total => share 1.0
    val cums = out.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(out.map(_.getLong(2)).sum === cums.last)
    assert(out.last.getDouble(4) === 1.0)
    // the curve is the whole point: each decile's cum == prefix sum of deciles
    val prefix = out.map(_.getLong(2)).scanLeft(0L)(_ + _).tail
    assert(cums.toSeq === prefix.toSeq)
  }

  test("q164 by-source rollup reconciles with q156's per-doc leakage") {
    val perDoc = SparkEntry.queries("q156_split_leakage")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val src = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = perDoc.groupBy(r => (src(r.getLong(0)), r.getString(1)))
      .map { case (k, rows) =>
        k -> ((rows.length.toLong, rows.map(_.getLong(2)).sum,
          rows.map(_.getLong(3)).sum))
      }
    val out = SparkEntry.queries("q164_leakage_by_source")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    assert(out.nonEmpty)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet === expect.keySet)
    out.foreach { r =>
      val (nd, ng, nl) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === nd)
      assert(r.getLong(3) === ng)
      assert(r.getLong(4) === nl)
      assert(r.getDouble(5) === nl.toDouble / ng.toDouble)
    }
  }

  test("q165 kernel: a verbatim train copy is named as the leaking pair") {
    val spark2 = spark
    import spark2.implicits._
    val ids = 0L until 4000L
    val trainId = ids.find(splitBucket(_) < 98).get
    val trainId2 = ids.find(i => splitBucket(i) < 98 && i != trainId).get
    val valId = ids.find(splitBucket(_) == 98).get
    val t1 = (1 to 20).map(i => s"w$i").mkString(" ") // 8 distinct 13-grams
    val t2 = (1 to 20).map(i => s"z$i").mkString(" ") // disjoint grams
    val docs = Seq((trainId, t1), (trainId2, t2), (valId, t1))
      .toDF("doc_id", "text")
    val out = CorpusPrep.leakagePairs(docs).collect()
    // exactly one evidence pair: the copy's source, with full containment
    assert(out.length === 1)
    assert(out(0).getLong(0) === valId)
    assert(out(0).getString(1) === "val")
    assert(out(0).getLong(2) === trainId)
    assert(out(0).getLong(3) === 8L)
    assert(out(0).getLong(4) === 8L)
    assert(out(0).getDouble(5) === 1.0)
  }

  test("q165 kernel: the df cap executes — boilerplate grams generate no pairs") {
    val spark2 = spark
    import spark2.implicits._
    // 60 docs share ONE boilerplate 13-gram (df=60 > cap 50); the rest of
    // each doc is unique. Without the cap, every (holdout, train) pair
    // would collide through the boilerplate gram — 59 pairs for one
    // holdout doc; with it, only genuinely shared rare grams pair.
    val ids = 0L until 4000L
    val trainIds = ids.filter(splitBucket(_) < 98).take(59)
    val valId = ids.find(splitBucket(_) == 98).get
    val boiler = (1 to 13).map(i => s"b$i").mkString(" ")
    val docs = (trainIds.zipWithIndex.map { case (id, i) =>
      (id, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g")
    } :+ ((valId, s"$boiler v0a v0b v0c v0d v0e v0f v0g")))
      .toDF("doc_id", "text")
    // holdout doc shares ONLY the (capped) boilerplate gram with anyone
    assert(CorpusPrep.leakagePairs(docs).count() === 0L)
    graft.util.QueryCaches.drain()
    // plant a verbatim copy of train doc 0: its 7 rare grams (df=2) pair,
    // the boilerplate gram still does not
    val (t0, t0Text) = (trainIds.head,
      s"$boiler u0a u0b u0c u0d u0e u0f u0g")
    val docs2 = (trainIds.zipWithIndex.map { case (id, i) =>
      (id, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g")
    } :+ ((valId, t0Text))).toDF("doc_id", "text")
    val out = CorpusPrep.leakagePairs(docs2).collect()
    assert(out.length === 1, "exactly the planted pair survives the cap")
    assert(out(0).getLong(0) === valId && out(0).getLong(2) === t0)
    assert(out(0).getLong(3) === 7L, "the df-capped boilerplate gram is excluded")
    assert(out(0).getLong(4) === 8L, "the denominator stays uncapped")
  }

  test("q165 pairs never exceed q156's per-doc leaked gram count") {
    val pairs = SparkEntry.queries("q165_leakage_pairs")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val perDoc = SparkEntry.queries("q156_split_leakage")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    pairs.foreach { r =>
      val (split, nGrams, nLeaked) = perDoc(r.getLong(0))
      assert(r.getString(1) === split)
      assert(r.getLong(4) === nGrams, "denominator is the uncapped gram count")
      // shared grams with ONE train doc cannot exceed total leaked grams
      // (both df-capped and uncapped agree on this bound)
      assert(r.getLong(3) <= nLeaked)
      assert(r.getLong(3) >= 3L)
    }
  }

  test("q166 cohesion is bounded and covers every label exactly once") {
    val out = SparkEntry.queries("q166_label_cohesion")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val labels = graft.source.Tables.embeddings(spark, dir)
      .select("label").collect().map(_.getInt(0))
    assert(out.map(_.getInt(0)).toSeq === labels.distinct.sorted.toSeq)
    assert(out.map(_.getLong(1)).sum === labels.length.toLong)
    out.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      // members correlate positively with their own centroid on this data
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("q167 ARI reconciles with a driver-side computation from q56 and q129") {
    val t = SparkEntry.queries("q56_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.QueryCaches.drain()
    val e = SparkEntry.queries("q129_embed_dedup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.QueryCaches.drain()
    val shared = t.keySet intersect e.keySet
    def comb2(n: Long) = n * (n - 1) / 2
    val sumIj = shared.groupBy(id => (t(id), e(id)))
      .map(g => comb2(g._2.size.toLong)).sum
    val sumA = shared.groupBy(id => t(id)).map(g => comb2(g._2.size.toLong)).sum
    val sumB = shared.groupBy(id => e(id)).map(g => comb2(g._2.size.toLong)).sum
    val nPairs = comb2(shared.size.toLong)
    val out = SparkEntry.queries("q167_modal_agreement")(spark, dir).collect()(0)
    graft.util.QueryCaches.drain()
    assert(out.getLong(0) === t.size.toLong)
    assert(out.getLong(1) === e.size.toLong)
    assert(out.getLong(2) === shared.size.toLong)
    assert(out.getLong(3) === nPairs)
    assert(out.getLong(4) === sumA)
    assert(out.getLong(5) === sumB)
    assert(out.getLong(6) === sumIj)
    val exp = sumA.toDouble * sumB / nPairs
    val den = (sumA + sumB) / 2.0 - exp
    val ari = if (nPairs == 0 || den == 0) 1.0 else (sumIj - exp) / den
    assert(math.abs(out.getDouble(7) - ari) < 1e-9)
  }

  test("q160 agrees with a driver-side rollup of q136's declared graph") {
    val knn = SparkEntry.queries("q136_knn_graph")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val labels = graft.source.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = knn.groupBy(r => labels(r.getLong(0))).map { case (lb, rows) =>
      val nVecs = rows.map(_.getLong(0)).distinct.length.toLong
      val nEdges = rows.length.toLong
      val nAgree = rows.count(r => labels(r.getLong(1)) == lb).toLong
      lb -> ((nVecs, nEdges, nAgree))
    }
    val out = SparkEntry.queries("q160_knn_label_consistency")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getInt(0)).toSet === expect.keySet)
    out.foreach { r =>
      val (nv, ne, na) = expect(r.getInt(0))
      assert(r.getLong(1) === nv)
      assert(r.getLong(2) === ne)
      assert(r.getLong(3) === na)
      assert(r.getDouble(4) === na.toDouble / ne)
      assert(ne <= 3 * nv, "bounded k: at most 3 edges per vector")
    }
  }

  test("q193 allocation reconciles: sums to the budget exactly, ranks are a permutation") {
    val out = SparkEntry.queries("q193_budget_allocation")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(3)).sum === 1000000L,
      "largest-remainder apportionment must balance the books to the token")
    assert(out.map(_.getLong(2)).sorted.toSeq === (1L to out.length).toSeq,
      "remainder ranks must be a 1..n permutation (unique tiebreaks)")
    out.foreach { r =>
      val d = r.getLong(3) - r.getLong(1)
      assert(d == 0L || d == 1L, "each source gets its floor or floor+1")
    }
  }

  test("q181 PageRank conserves probability mass up to floor loss") {
    // each iteration floors N + |E| divisions: total mass can only leak
    // DOWNWARD from S=1e12, by < (N + |E|) per iteration — a wrong join
    // (dropped nodes, double-counted edges) would violate the envelope
    val out = SparkEntry.queries("q181_pagerank")(spark, dir).collect()
    val n = out.length.toLong
    val mass = out.map(_.getLong(1)).sum
    val s = 1000000000000L
    val maxLoss = 5 * (n + 3 * n + 1) // 5 iterations, outdeg <= 3
    assert(mass <= s, s"mass $mass exceeds S=$s")
    assert(mass >= s - maxLoss, s"mass $mass lost more than the floor envelope $maxLoss")
    out.foreach(r => assert(r.getLong(1) > 0, "every node keeps positive rank"))
  }
}
