package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Crafted/closed-form semantics for the last three round-11 additions
  * (q305 Mann–Whitney U, q306 Gini, q307 mutual kNN), which shipped
  * after Round11OpsSpec and therefore carried only oracle agreement.
  *
  * q307's verdict sketch asked for "a crafted asymmetric kNN graph
  * where exactly one pair is mutual" — that is geometrically
  * IMPOSSIBLE at k=3: the globally closest pair is always mutual, and
  * the points-to relation always bottoms out in a sink set whose 4
  * tightest members each hold the other three as their top-3 (a mutual
  * K4, six pairs). The crafted graph here is the sparsest asymmetric
  * shape k=3 admits: a 6-node chain with super-exponentially growing
  * gaps whose head-K4 is exactly the mutual set and whose two tail
  * nodes emit only unreciprocated edges.
  */
class Round12OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  /** documents.parquet fixture with explicit per-row (source, n_chars). */
  private def docsDir(rows: Seq[(String, Long)]): String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r12-docs").toString
    rows.zipWithIndex.map { case ((src, nc), i) => (i.toLong, "x", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q305 MWU: hand-computed U and z on a two-source trace with ties") {
    // A = {1,2,2,3}, B = {2,3,3,5}; n=8. Midranks: 1→1, 2→3, 3→6, 5→8.
    // R_A = 1+3+3+6 = 13, U_A = 13 − 4·5/2 = 3; U_B = 16 − U_A = 13.
    // Σ(t³−t) = 24+24 = 48; σ² = (16/12)·(9 − 48/56) = 76/7;
    // z_A = (2U_A − 16)/(2σ) = −5/σ = −1.517442 (6 dp), z_B = +1.517442.
    val d = docsDir(Seq(
      "A" -> 1L, "A" -> 2L, "A" -> 2L, "A" -> 3L,
      "B" -> 2L, "B" -> 3L, "B" -> 3L, "B" -> 5L))
    val got = graft.SparkEntry.queries("q305_mannwhitney_drift")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set("A", "B"))
    assert(got("A") === ((4L, 3L, -1.517442)))
    assert(got("B") === ((4L, 13L, 1.517442)))
    graft.util.QueryCaches.drain()
  }

  test("q305 MWU: single-source corpus yields U=0 and NULL z (σ=0 guard)") {
    val d = docsDir(Seq("only" -> 1L, "only" -> 2L, "only" -> 2L))
    val rows = graft.SparkEntry.queries("q305_mannwhitney_drift")(spark, d).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "only")
    assert(rows(0).getLong(1) === 3L)   // ns = n
    assert(rows(0).getLong(2) === 0L)   // U = R − n(n+1)/2 = 0
    assert(rows(0).isNullAt(3), "z must be NULL when one source is the whole corpus")
    graft.util.QueryCaches.drain()
  }

  test("q306 Gini: textbook fixtures — uniform 0, arithmetic 0.25, skewed 0.72") {
    // a: {1,2,3,4} → (2·30 − 5·10)/(4·10) = 0.25
    // b: {5,5,5}   → 0 (all equal)
    // c: {1,1,1,97} → (2·394 − 5·100)/(4·100) = 0.72
    val d = docsDir(Seq(
      "a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 4L,
      "b" -> 5L, "b" -> 5L, "b" -> 5L,
      "c" -> 1L, "c" -> 1L, "c" -> 1L, "c" -> 97L))
    val got = graft.SparkEntry.queries("q306_gini_length")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      "a" -> ((4L, 10L, 0.25)),
      "b" -> ((3L, 15L, 0.0)),
      "c" -> ((4L, 100L, 0.72))))
    graft.util.QueryCaches.drain()
  }

  // ---- q307 crafted fixture ------------------------------------------

  /** The 4 MD5-seeded hyperplane sign vectors, recomputed from the same
    * public recipe as [[Similarity.planeLits]] (bit p,j = parity of the
    * first hex digit of md5("p_j")).
    */
  private def planeSigns: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(4) { p =>
      Array.tabulate(64) { j0 =>
        md.reset()
        val hex = md.digest(s"${p}_${j0 + 1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** Six vectors in one plane of the embedding space: rotations of a
    * plane-aligned base (so all six share one LSH bucket — every plane
    * margin is tens of units, perturbations are ≤1e-4) at angles
    * 0, .004, .10, .22, .47, .99 rad. Gaps grow super-exponentially, so
    * nodes 0–3 form the mutual K4 and nodes 4–5 only emit one-sided
    * edges (node 4's nearest are {3,2,1} but 3's top-3 is {2,1,0}).
    */
  private def craftedVectors: Array[Array[Float]] = {
    val p = planeSigns
    val base = Array.tabulate(64)(j =>
      p(0)(j) + 0.6 * p(1)(j) + 0.5 * p(2)(j) + 0.45 * p(3)(j))
    val nb = math.sqrt(base.map(x => x * x).sum)
    val raw = Array.tabulate(64)(j => if (j % 2 == 0) 1.0 else -1.0)
    val proj = raw.zip(base).map { case (a, b) => a * b }.sum / (nb * nb)
    val d0 = Array.tabulate(64)(j => raw(j) - proj * base(j))
    val nd = math.sqrt(d0.map(x => x * x).sum)
    val dir = d0.map(_ / nd * nb)
    val ts = Array(0.0, 0.004, 0.10, 0.22, 0.47, 0.99)
    ts.map { t =>
      val (c, s) = (math.cos(t), math.sin(t))
      Array.tabulate(64)(j =>
        BigDecimal(c * base(j) + s * dir(j))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toFloat)
    }
  }

  private def embDir(vecs: Array[Array[Float]]): String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r12-emb").toString
    vecs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v.toSeq, i % 2) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** cosine_sim's exact arithmetic (float→double cast, left-to-right
    * accumulation) followed by Spark's HALF_UP round(·, 6).
    */
  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      val xi = a(i).toDouble; val yi = b(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    BigDecimal(dot / (math.sqrt(nx) * math.sqrt(ny)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def bruteTop3(vecs: Array[Array[Float]]): Map[Long, Seq[(Long, Double)]] =
    vecs.indices.map { i =>
      i.toLong -> vecs.indices.filter(_ != i)
        .map(j => (j.toLong, cos6(vecs(i), vecs(j))))
        .sortBy { case (j, c) => (-c, j) }.take(3).toSeq
    }.toMap

  test("q307 crafted chain: mutual set is exactly the head-K4, tail edges one-sided") {
    val vecs = craftedVectors
    val d = embDir(vecs)
    val knn = bruteTop3(vecs)
    // the directed graph must be asymmetric: nodes 4 and 5 emit only
    // unreciprocated edges
    assert(knn(4L).map(_._1).toSet === Set(3L, 2L, 1L))
    assert(knn(5L).map(_._1).toSet === Set(4L, 3L, 2L))
    val got = graft.SparkEntry.queries("q307_mutual_knn")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    // hand-derived mutual set with both direction ranks
    val expectedRanks = Map(
      (0L, 1L) -> ((1, 1)), (0L, 2L) -> ((2, 2)), (0L, 3L) -> ((3, 3)),
      (1L, 2L) -> ((2, 1)), (1L, 3L) -> ((3, 2)), (2L, 3L) -> ((3, 1)))
    assert(got.keySet === expectedRanks.keySet,
      s"mutual set must be the head-K4; got ${got.keySet.toSeq.sorted}")
    expectedRanks.foreach { case (pair @ (a, b), (rab, rba)) =>
      val (cs, gotRab, gotRba) = got(pair)
      assert((gotRab, gotRba) === ((rab, rba)), s"ranks for $pair")
      assert(cs === cos6(vecs(a.toInt), vecs(b.toInt)), s"cos for $pair")
    }
    assert(!got.keySet.exists { case (a, b) => a >= 4L || b >= 4L },
      "no pair involving the one-sided tail nodes may survive")
    graft.util.QueryCaches.drain()
  }

  test("q308 MSF equals plain-Scala KRUSKAL over the same edge set at sf0.001") {
    // different algorithm, same strict total order (dist_q, a, b) —
    // MSF uniqueness forces the identical edge set
    val dir = "/root/testdata/sf0.001"
    val und = Similarity.knnNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (v, n, cs) =>
        (math.min(v, n), math.max(v, n), 1000000L - math.round(cs * 1e6)) }
      .distinct
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    val expected = und.sortBy { case (a, b, d) => (d, a, b) }
      .filter { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) false
        else {
          parent.getOrElseUpdate(ra, ra); parent.getOrElseUpdate(rb, rb)
          parent(math.max(ra, rb)) = math.min(ra, rb); true
        }
      }.toSet
    val got = graft.SparkEntry.queries("q308_boruvka_msf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty)
    // a forest, never a cycle: edges < nodes
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.size
    assert(got.size < nodes)
    graft.util.QueryCaches.drain()
  }

  test("q309 replay counts equal a plain-Scala fold of the four batches at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.source.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val feed = li.map { case (ok, ln, q) =>
      val ver = math.floor(q).toLong
      val tomb = (ok + ln) % 7 == 0
      (ok, ver, !tomb, (ln - 1) % 4)
    }
    val state = scala.collection.mutable.Map[Long, Long]()
    val expected = (0 to 3).flatMap { k =>
      val latest = feed.filter(_._4 == k).groupBy(_._1).map { case (key, rows) =>
        val (_, ver, present, _) = rows.maxBy(r => (r._2, r._3))
        (key, ver, present)
      }
      val acts = latest.toSeq.map { case (key, ver, present) =>
        val inState = state.contains(key)
        if (!present && inState) { state.remove(key); "delete" }
        else if (!present) "noop"
        else if (!inState) { state(key) = ver; "insert" }
        else if (state(key) != ver) { state(key) = ver; "update" }
        else "noop"
      }
      acts.groupBy(identity).map { case (a, xs) => (k, a, xs.size.toLong) }
    }.toSet
    val got = graft.SparkEntry.queries("q309_cdc_replay")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // the fold must exercise every action class across the replay
    assert(got.map(_._2) === Set("insert", "update", "delete", "noop"))
    graft.util.QueryCaches.drain()
  }

  test("q311 DBSCAN labels equal a plain-Scala reimplementation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.source.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val planes = planeSigns
    def bucket(v: Array[Float]): String = planes.map { p =>
      val dot = v.zip(p).map { case (x, pj) => x.toDouble * pj }.sum
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (norm > 0 && dot > 0) '1' else '0'
    }.mkString
    val byBucket = vecs.toSeq.groupBy { case (_, v) => bucket(v) }
    val nbrs = byBucket.values.flatMap { grp =>
      grp.flatMap { case (i, vi) =>
        grp.collect { case (j, vj) if j != i && cos6(vi, vj) >= 0.2 => i -> j }
      }
    }.toSeq
    val deg = nbrs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val core = deg.filter(_._2 >= 3L).keySet
    val border = nbrs.collect { case (i, j) if core(j) => i }.toSet -- core
    val expected = vecs.keys.map { i =>
      i -> ((deg.getOrElse(i, 0L) + 1L,
        if (core(i)) "core" else if (border(i)) "border" else "noise"))
    }.toMap
    val got = graft.SparkEntry.queries("q311_dbscan_labels")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === expected)
    assert(Set("core", "border", "noise").subsetOf(got.values.map(_._2).toSet),
      "fixture must exercise all three labels")
    graft.util.QueryCaches.drain()
  }

  test("q312 HDBSCAN MSF equals Kruskal under mutual-reachability at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val knn = Similarity.knnNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (v, n, cs) =>
        (v, n, math.max(1000000L - math.round(cs * 1e6), 1L)) }
    val kdist = knn.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val und = knn.map { case (v, n, d) =>
      (math.min(v, n), math.max(v, n),
        Seq(d, kdist(v), kdist(n)).max) }.distinct
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    val expected = und.sortBy { case (a, b, d) => (d, a, b) }
      .filter { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) false
        else {
          parent.getOrElseUpdate(ra, ra); parent.getOrElseUpdate(rb, rb)
          parent(math.max(ra, rb)) = math.min(ra, rb); true
        }
      }.toSet
    val got = graft.SparkEntry.queries("q312_hdbscan_msf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // mutual reachability can only raise edge weights vs the raw MSF
    val raw = graft.SparkEntry.queries("q308_boruvka_msf")(spark, dir)
      .collect().map(_.getLong(2)).sum
    assert(got.toSeq.map(_._3).sum >= raw)
    graft.util.QueryCaches.drain()
  }

  /** documents.parquet fixture with explicit text (q313 prefixes). */
  private def textDocsDir(texts: Seq[String]): String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r12-text").toString
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = Seq(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1,
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
    dp(a.length)(b.length)
  }

  test("q313 crafted: substitution/deletion/insertion at ed 1, ed>=2 excluded, ed 0 kept") {
    val texts = Seq(
      "hello world abc",   // 0
      "hello world abd",   // 1: substitution of 0
      "hello world ab",    // 2: deletion from 0
      "xhello world abc",  // 3: insertion into 0
      "hello world xyz",   // 4: ed 3 from 0 — excluded
      "hello world abc")   // 5: exact duplicate of 0
    val d = textDocsDir(texts)
    val got = graft.SparkEntry.queries("q313_edit_distance_join")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      i <- texts.indices; j <- (i + 1) until texts.length
      e = lev(texts(i), texts(j)) if e <= 1
    } yield (i.toLong, j.toLong, e)).toSet
    assert(got === expected)
    assert(got.contains((0L, 1L, 1)) && got.contains((0L, 2L, 1)) &&
      got.contains((0L, 3L, 1)) && got.contains((0L, 5L, 0)))
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L })
    graft.util.QueryCaches.drain()
  }

  test("q313 blocking is EXACT: equals brute-force all-pairs ed<=1 at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val prefs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).take(24)))
    val brute = (for {
      i <- prefs.indices; j <- (i + 1) until prefs.length
      (da, pa) = prefs(i); (db, pb) = prefs(j)
      if math.abs(pa.length - pb.length) <= 1
      e = lev(pa, pb) if e <= 1
    } yield (math.min(da, db), math.max(da, db), e)).toSet
    val got = graft.SparkEntry.queries("q313_edit_distance_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty)
    graft.util.QueryCaches.drain()
  }

  /** 60-bit md5-prefix gram key, the engine's conv(md5)[1..15] idiom. */
  private def gh60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Plain-Scala winnowing (k = 3 word-grams, w = 4) of one text. */
  private def winnow(text: String): (Long, Set[Long]) = {
    val words = text.split(" ", -1)
    if (words.length < 3) return (0L, Set.empty)
    val hs = words.sliding(3).map(g => gh60(g.mkString(" "))).toArray
    val m = hs.length
    val fps = (1 to math.max(m - 3, 1))
      .map(q => hs.slice(q - 1, math.min(q + 3, m)).min).toSet
    (m.toLong, fps)
  }

  test("q314 equals a plain-Scala winnowing reimplementation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) => id -> winnow(t) }
      .collect { case (id, (m, fps)) if m > 0 =>
        id -> ((m, fps.size.toLong,
          BigDecimal(fps.size.toDouble / m.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
    val got = graft.SparkEntry.queries("q314_winnow_profile")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    // winnowing's expected density is 2/(w+1) = 0.4
    val avg = got.values.map(_._3).sum / got.size
    assert(avg > 0.3 && avg < 0.5, s"mean density $avg out of winnowing band")
    graft.util.QueryCaches.drain()
  }

  test("q315 guarantee: docs sharing a 12-token distinct run must pair") {
    // 12 shared tokens → 10 shared grams → 7 full shared windows →
    // ≥ ceil(7/4) = 2 distinct shared fingerprints → survives the
    // n_shared >= 2 filter. Junk contexts differ entirely.
    val run = (1 to 12).map(i => s"run$i").mkString(" ")
    val d = textDocsDir(Seq(
      s"alpha beta gamma $run delta epsilon",
      s"one two three four $run five six",
      "completely unrelated text with nothing shared at all"))
    val got = graft.SparkEntry.queries("q315_moss_pairs")(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.contains((0L, 1L)), s"guaranteed pair missing: $got")
    assert(got((0L, 1L)) >= 2L)
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L })
    graft.util.QueryCaches.drain()
  }

  test("q316 KMV: exact branch below K, estimator within 25% above K") {
    // sf0.001: both key sets < 256 → sketch degrades to exact
    val small = graft.SparkEntry.queries("q316_kmv_overlap")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(small.getDouble(2) === small.getLong(1).toDouble, "exact_a branch")
    assert(small.getDouble(4) === small.getLong(3).toDouble, "exact_b branch")
    assert(small.getDouble(7) === small.getDouble(8),
      "below K the union sketch is the exact union: jacc_est == jacc_exact")
    graft.util.QueryCaches.drain()
    // sf0.1: > 256 distinct keys → real estimator; k=256 → σ ≈ 6%
    val big = graft.SparkEntry.queries("q316_kmv_overlap")(
      spark, "/root/testdata/sf0.1").collect()(0)
    val (ea, esta) = (big.getLong(1).toDouble, big.getDouble(2))
    assert(esta !== ea, "estimator branch must be active at sf0.1")
    assert(math.abs(esta - ea) / ea < 0.25, s"est_a $esta vs exact $ea")
    assert(math.abs(big.getDouble(7) - big.getDouble(8)) < 0.15,
      "jaccard estimate within sketch tolerance")
    graft.util.QueryCaches.drain()
  }

  /** events.parquet fixture: (epoch_us, event_type) rows. */
  private def eventsDir(rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r12-ev").toString
    rows.zipWithIndex.map { case ((us, et), i) =>
      (i.toLong, new java.sql.Timestamp(us / 1000), i.toLong, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q317 Theil–Sen: hand-computed pairwise-slope median on a crafted trace") {
    // type "a": daily counts [1,2,3,4,10] on days 0..4 — ten pairwise
    // slopes ×10⁶ sorted: 10⁶×6, 2250000, 2666666, 3500000, 6000000;
    // lower median (position 5) = 1000000. The outlier day (10) moves
    // OLS but not Theil–Sen — the robustness under test.
    val day = 86400000000L
    val counts = Seq(1, 2, 3, 4, 10)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((d * day + 1000L, "a")) }
    val dir = eventsDir(rows)
    val got = graft.SparkEntry.queries("q317_theilsen_trend")(spark, dir)
      .collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getString(0) === "a")
    assert(r.getLong(1) === 5L)        // n_days
    assert(r.getLong(2) === 10L)       // n_pairs
    assert(r.getLong(3) === 1000000L)  // slope_q median = +1/day
    assert(r.getDouble(4) === 1.0)
    graft.util.QueryCaches.drain()
  }

  test("q318 Benford: crafted digits count exactly; χ² matches the closed form") {
    val s2 = spark
    import s2.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r12-li").toString
    // cents: 100→digit 1 (×4), 2550→digit 2 (×2), 300→digit 3, 9999→9
    val prices = Seq(1.00, 1.00, 1.00, 1.00, 25.50, 25.50, 3.00, 99.99)
    prices.map(Tuple1(_)).toDF("l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = graft.SparkEntry.queries("q318_benford_audit")(spark, d)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set(1, 2, 3, 9))
    assert(got(1)._1 === 4L && got(2)._1 === 2L &&
      got(3)._1 === 1L && got(9)._1 === 1L)
    // closed-form χ² with the same pinned literals, quantized like the engine
    val p = Map(1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829992, 9 -> 0.04575749056067514)
    val n = 8.0
    val chiQ = got.keys.toSeq.map { dg =>
      val o = got(dg)._1.toDouble
      val t = (o - n * p(dg)) * (o - n * p(dg)) / (n * p(dg))
      math.round(t * 1e6)
    }.sum
    val expectedChi = BigDecimal(chiQ.toDouble / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.values.foreach { case (_, _, chi) => assert(chi === expectedChi) }
    graft.util.QueryCaches.drain()
  }

  test("q319 conformal threshold equals a plain-Scala reimplementation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val kdist = Similarity.knnNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0),
        math.max(1000000L - math.round(r.getDouble(2) * 1e6), 1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    def isCal(v: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 2 == 0
    }
    val (cal, test) = kdist.partition { case (v, _) => isCal(v) }
    val k = (9L * (cal.size + 1L) + 9L) / 10L
    val qhat = cal.values.toSeq.sorted.apply(k.toInt - 1)
    val covered = test.values.count(_ <= qhat)
    val coverage = BigDecimal(covered.toDouble / test.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = graft.SparkEntry.queries("q319_conformal_knn")(spark, dir)
      .collect()(0)
    assert(r.getLong(0) === cal.size.toLong)
    assert(r.getLong(1) === test.size.toLong)
    assert(r.getLong(2) === k)
    assert(r.getLong(3) === qhat)
    assert(r.getDouble(4) === coverage)
    // the finite-sample guarantee: realized coverage within binomial
    // noise of the 0.9 target
    val sigma = math.sqrt(0.9 * 0.1 / test.size)
    assert(math.abs(coverage - 0.9) <= 4 * sigma,
      s"coverage $coverage too far from 0.9 (sigma $sigma)")
    graft.util.QueryCaches.drain()
  }

  test("q307 equals a plain-Scala mutual-pair reimplementation at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val knn = Similarity.knnNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byEdge = knn.map { case (a, b, cs, rk) => (a, b) -> ((cs, rk)) }.toMap
    val expected = knn.collect {
      case (a, b, cs, rab) if a < b && byEdge.contains((b, a)) =>
        (a, b) -> ((cs, rab, byEdge((b, a))._2))
    }.toMap
    val got = graft.SparkEntry.queries("q307_mutual_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "sf0.001 must contain mutual pairs")
    // the filter must be non-trivial: some directed edges are one-sided
    assert(knn.exists { case (a, b, _, _) => !byEdge.contains((b, a)) },
      "sf0.001 kNN graph should be asymmetric")
    graft.util.QueryCaches.drain()
  }
}
