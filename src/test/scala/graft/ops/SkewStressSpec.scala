package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Adversarial-skew fixture shared by the dedup/LSH stress tests: one
  * DOMINANT language (≈85% of documents) and one dominant embedding
  * label (≈85% of vectors), so any kernel that blocks on lang/label
  * alone would see a single giant block. Content is deterministic
  * (seeded), drawn from a zipf-ish 400-word vocabulary so common words
  * genuinely repeat across documents; 30 planted near-duplicate pairs
  * give the pipelines true positives to find. Written once per JVM to a
  * temp dir shaped like the driver's testdata (documents.parquet /
  * embeddings.parquet), so the production kernels run on it unchanged.
  */
object SkewFixture {
  val nBase = 1200
  val nDup = 30
  val n: Int = nBase + nDup

  lazy val dir: String = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val rnd = new scala.util.Random(42)
    // zipf-ish: low indices drawn far more often than the tail
    def word(): String =
      s"w${math.min((math.pow(rnd.nextDouble(), 2.5) * 400).toInt, 399)}"
    val langs = Array("de", "fr", "es")
    val base = (0 until nBase).map { id =>
      val text = Seq.fill(30 + rnd.nextInt(30))(word()).mkString(" ")
      val lang = if (rnd.nextDouble() < 0.85) "en" else langs(rnd.nextInt(3))
      (id.toLong, text, lang, "skew", text.length.toLong)
    }
    // planted near-dups: doc 5000+i repeats doc i's text plus one word
    val dups = (0 until nDup).map { i =>
      val b = base(i)
      val text = b._2 + " w0"
      (5000L + i, text, b._3, "skew", text.length.toLong)
    }
    (base ++ dups).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val vrnd = new scala.util.Random(7)
    val vecs = (0 until nBase).map { id =>
      val v = Seq.fill(64)((vrnd.nextDouble() * 2 - 1).toFloat)
      val label = if (vrnd.nextDouble() < 0.85) 0 else 1 + vrnd.nextInt(3)
      (id.toLong, v, label)
    }
    val vdups = (0 until nDup).map { i =>
      val b = vecs(i)
      (5000L + i, b._2.map(x => x + 0.001f), b._3)
    }
    (vecs ++ vdups).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }
}

/** The 100 TB boundedness claims in the dedup/LSH Scaladoc, EXECUTED
  * against adversarial skew instead of argued: on a fixture where one
  * lang/label holds 85% of rows, candidate volume must stay hash-bounded
  * (a small multiple of n), never revert to the O(n²) all-pairs of the
  * dominant block.
  */
class SkewStressSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private def allPairs: Long = SkewFixture.n.toLong * (SkewFixture.n - 1) / 2

  test("q41 minhash banding: candidates stay hash-bounded under 85% one-lang skew") {
    val cands = TextDedup.candPairs(spark, SkewFixture.dir).count()
    graft.util.QueryCaches.drain()
    println(s"[skew] minhash candidates: $cands of $allPairs all-pairs")
    assert(cands >= SkewFixture.nDup, "planted duplicates must collide in some band")
    assert(cands < 16L * SkewFixture.n,
      s"banded candidates must stay ~linear in n, got $cands")
  }

  test("q43 prefix filter: candidates a small fraction of the dominant block's pairs") {
    val blocked = TextDedup.jaccardBlocked(spark, SkewFixture.dir)
    val blockPairs = blocked.groupBy("lang", "lb").count()
      .agg(sum(expr("count * (count - 1) / 2"))).head.getDouble(0).toLong
    val cands = TextDedup.jaccardPrefixCandidates(blocked, t = 0.1).count()
    val found = TextDedup.jaccardPrefixJoin(blocked, t = 0.1)
      .filter(col("doc_b") >= 5000L && col("doc_b") - 5000L === col("doc_a")).count()
    // A planted pair is only in scope when the appended word didn't push
    // the copy across an n_chars/100 block boundary — blocking is part of
    // the query's semantics (the brute-force oracle joins on lb too).
    val docs = spark.read.parquet(s"${SkewFixture.dir}/documents.parquet")
      .select(col("doc_id"), (col("n_chars") / 100).cast("long").as("lb"))
    val expected = docs.as("a").join(docs.as("b"),
        col("b.doc_id") === col("a.doc_id") + 5000L && col("a.lb") === col("b.lb"))
      .count()
    graft.util.QueryCaches.drain()
    println(s"[skew] q43 block-pairs: $blockPairs, candidates: $cands, " +
      s"planted found: $found of $expected in-block")
    assert(expected >= SkewFixture.nDup - 3, "fixture degenerated: too many pairs cross blocks")
    assert(found == expected, "every in-block planted near-dup pair must verify")
    assert(cands < blockPairs / 4,
      s"prefix filter must prune the dominant block's pair space, got $cands of $blockPairs")
    assert(cands < 40L * SkewFixture.n,
      s"candidates must stay ~linear in n, got $cands")
  }

  // derived plane count for the fixture corpus — the SAME formula the
  // production kernels apply, so the spec's buckets match the queries'
  private def fixtureP: Int =
    Similarity.planeCountFor(
      spark.read.parquet(s"${SkewFixture.dir}/embeddings.parquet").count())

  test("q44/q57 hyperplane blocks: dominant label splits across buckets") {
    val e = spark.read.parquet(s"${SkewFixture.dir}/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("CAST(embedding AS array<double>)").as("v"))
      .withColumn("bucket", expr(Similarity.hyperplaneBucket("v", fixtureP)))
    val sizes = e.groupBy("label", "bucket").count()
    val maxBlock = sizes.agg(max("count")).head.getLong(0)
    val dominant = e.filter(col("label") === 0).count()
    println(s"[skew] hyperplane max (label,bucket) block: $maxBlock of $dominant dominant-label rows")
    // 4 hyperplanes = 16 buckets; even the dominant label must shatter.
    // Bound = 4x the uniform share, far below the label-only block.
    assert(maxBlock <= dominant / 4,
      s"one (label,bucket) block holds $maxBlock of $dominant dominant-label vectors")
  }

  test("adaptive planes: in-bucket block sizes stay bounded at two corpus sizes") {
    // The 100× claim, executed: at n=1230 the floor p=4 applies; at
    // n=100000 the derived p=6 must hold blocks near the 2048-row target
    // instead of letting them grow 81× with the corpus. Vectors are a
    // deterministic distributed expression (no driver-side materialize).
    val results = Seq(1230L, 100000L).map { n =>
      val p = Similarity.planeCountFor(n)
      val e = spark.range(n).selectExpr("id AS vec_id",
          "transform(sequence(1,64), j -> cast(sin(id * j * 0.7) AS double)) AS v")
        .withColumn("bucket", expr(Similarity.hyperplaneBucket("v", p)))
      val sizes = e.groupBy("bucket").count()
      val maxBlock = sizes.agg(max("count")).head.getLong(0)
      val nBuckets = sizes.count()
      println(s"[skew] adaptive-p n=$n p=$p buckets=$nBuckets maxBlock=$maxBlock")
      // at most 4× the uniform share — the hash bounds the block, the
      // corpus size does not
      assert(maxBlock <= 4L * (n >> p).max(1L),
        s"n=$n p=$p: block $maxBlock exceeds 4x uniform ${n >> p}")
      (n, p, maxBlock)
    }
    assert(results.map(_._2) === Seq(4, 6), "p must grow with the corpus")
    // the counterfactual, executed: at n=100000 the OLD fixed p=4 leaves
    // blocks ~4x larger than the derived p=6 does — the derived planes
    // are what absorb the corpus growth
    val n2 = 100000L
    val fixedMax = spark.range(n2).selectExpr("id AS vec_id",
        "transform(sequence(1,64), j -> cast(sin(id * j * 0.7) AS double)) AS v")
      .withColumn("bucket", expr(Similarity.hyperplaneBucket("v", 4)))
      .groupBy("bucket").count().agg(max("count")).head.getLong(0)
    println(s"[skew] adaptive-p counterfactual: fixed p=4 maxBlock=$fixedMax vs derived ${results(1)._3}")
    assert(results(1)._3 * 2 < fixedMax,
      s"derived p must shrink blocks vs fixed p=4: ${results(1)._3} vs $fixedMax")
  }

  test("q61 simhash bands: candidate volume bounded, correlated content notwithstanding") {
    // Re-derive the 64-bit two-word fingerprint exactly as q61 does
    // (bitVotes64 is fully private): hi word votes on each md5 hex
    // digit's high bit, lo word on its second bit; 4 × 16-bit bands.
    def voteHi(j: Int) = sum(when(substring(col("h"), j, 1)
      .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
    def voteLo(j: Int) = sum(when(substring(col("h"), j, 1)
      .isin("4", "5", "6", "7", "c", "d", "e", "f"), 1).otherwise(-1))
    val fp = spark.read.parquet(s"${SkewFixture.dir}/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5(col("w")))
      .groupBy("doc_id")
      .agg(voteHi(1).as("v1"),
        ((2 to 32).map(j => voteHi(j).as(s"v$j")) ++
         (1 to 32).map(j => voteLo(j).as(s"u$j"))): _*)
      .select(col("doc_id"),
        (1 to 32).map(j => when(col(s"v$j") > 0, lit(1L << (32 - j)))
          .otherwise(lit(0L))).reduce(_ + _).as("sh_hi"),
        (1 to 32).map(j => when(col(s"u$j") > 0, lit(1L << (32 - j)))
          .otherwise(lit(0L))).reduce(_ + _).as("sh_lo"))
    val bands = fp.select(col("doc_id"), explode(expr(
        """transform(sequence(0,3), b -> struct(b AS b,
          |  CASE WHEN b = 0 THEN shiftright(sh_hi, 16) & 65535
          |       WHEN b = 1 THEN sh_hi & 65535
          |       WHEN b = 2 THEN shiftright(sh_lo, 16) & 65535
          |       ELSE sh_lo & 65535 END AS nib))""".stripMargin))
        .as("x"))
      .select(col("x.b").as("b"), col("x.nib").as("nib"))
    val perBucket = bands.groupBy("b", "nib").count()
    val joinRows = perBucket.agg(sum(expr("count * (count - 1) / 2"))).head.getDouble(0).toLong
    println(s"[skew] simhash band join rows: $joinRows of $allPairs all-pairs")
    // Content correlation concentrates simhash bytes more than minhash
    // buckets — the verify-before-distinct design absorbs that — but the
    // banded join must still examine well under the all-pairs volume.
    assert(joinRows < allPairs / 4,
      s"simhash banding degenerated to near-all-pairs: $joinRows of $allPairs")
  }

  test("q140 semdedup: blocks stay bounded under skew and planted near-dups are dropped") {
    val out = graft.SparkEntry.queries("q140_semdedup")(spark, SkewFixture.dir)
      .collect()
    graft.util.QueryCaches.drain()
    // planted vectors 5000+i sit 0.001 from vector i (cos ≈ 1): the later
    // copy must be dropped whenever the perturbation didn't flip a bucket
    // bit (a near-zero plane dot can), so demand a solid majority
    val plantedDropped = out.count(r => r.getLong(0) >= 5000L && !r.getBoolean(2))
    println(s"[skew] semdedup dropped $plantedDropped of ${SkewFixture.nDup} planted near-dups")
    assert(plantedDropped >= SkewFixture.nDup / 2,
      s"only $plantedDropped of ${SkewFixture.nDup} planted near-dups dropped")
    // the pair join's block key is (cell, bucket): even the dominant
    // k-means cell must shatter across the 16 hyperplane buckets
    val spark2 = spark
    import spark2.implicits._
    val cells = out.toSeq.map(r => (r.getLong(0), r.getLong(1))).toDF("vec_id", "cell")
    val blocks = spark.read.parquet(s"${SkewFixture.dir}/embeddings.parquet")
      .select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("v"))
      .withColumn("bucket", expr(Similarity.hyperplaneBucket("v", fixtureP)))
      .join(cells, "vec_id")
      .groupBy("cell", "bucket").count()
    val maxBlock = blocks.agg(max("count")).head.getLong(0)
    val dominant = cells.groupBy("cell").count().agg(max("count")).head.getLong(0)
    println(s"[skew] semdedup max (cell,bucket) block: $maxBlock of $dominant dominant-cell rows")
    assert(maxBlock <= dominant / 4,
      s"one (cell,bucket) block holds $maxBlock of the dominant cell's $dominant vectors")
  }

  test("q150 containment: planted subset copies surface at exactly 1.0; join stays df-bounded") {
    val out = graft.SparkEntry.queries("q150_gram_containment")(spark, SkewFixture.dir)
      .collect()
    graft.util.QueryCaches.drain()
    // doc 5000+i is doc i plus one appended word, so A's eligible grams
    // are a strict subset of B's and max-direction containment is an
    // EXACT 1.0 (every shared gram has df ≥ 2; a df > 50 gram drops from
    // numerator and denominator together, preserving the ratio)
    val planted = out.filter(r => r.getLong(1) == r.getLong(0) + 5000L)
    println(s"[skew] containment found ${planted.length} of ${SkewFixture.nDup} planted containments")
    assert(planted.length == SkewFixture.nDup,
      s"every planted subset copy must surface, got ${planted.length}")
    planted.foreach { r =>
      assert(r.getDouble(5) == 1.0,
        s"planted pair (${r.getLong(0)},${r.getLong(1)}) containment ${r.getDouble(5)} != 1.0")
    }
    // the df cap is the only thing standing between the gram self-join
    // and the dominant block's O(n^2): measure the actual join volume
    val g = CorpusPrep.hashedGrams(
      spark.read.parquet(s"${SkewFixture.dir}/documents.parquet"), k = 13).distinct()
    val joinRows = g.groupBy("gram").count()
      .filter(col("count").between(2, 50))
      .agg(sum(expr("count * (count - 1) / 2"))).head.getDouble(0).toLong
    graft.util.QueryCaches.drain()
    println(s"[skew] containment gram-join rows: $joinRows of $allPairs all-pairs")
    assert(joinRows < 20L * SkewFixture.n,
      s"df-capped gram join must stay ~linear in n, got $joinRows")
  }
}
