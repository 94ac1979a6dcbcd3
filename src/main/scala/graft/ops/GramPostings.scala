package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-wide persisted 13-gram postings — the q145 index pattern
  * generalized to the whole gram family.
  *
  * q109/q149/q150/q156/q164/q165 all consume the SAME relation: the
  * distinct (doc_id, gram) 13-gram postings of the corpus. Before this
  * store, each query rebuilt it (explode every document into ~|words|
  * grams, hash, distinct) inside its own per-query cache — the entire
  * ~2–3 s bench tail was that rebuild, and at 100 TB it is a full-corpus
  * explode+shuffle re-paid per audit. Now the postings materialize ONCE
  * per (JVM, corpus dir) as a parquet table BUCKETED AND SORTED on
  * `gram` ([[graft.source.Bucketing]]): every downstream gram groupBy
  * (df counts, first-seen min) and gram equi-join (pair generation,
  * train-membership probe) then reads bucket-aligned files with NO
  * exchange — the one-time layout cost replaces a per-query shuffle,
  * which is exactly the bucketed-table trade the 100 TB story wants
  * (re-used across every audit of the same corpus snapshot).
  *
  * Freshness: the table name is keyed by the corpus dir but the build is
  * re-run per JVM (in-memory registry + overwrite write), so a driver
  * re-generating the testdata can never leave a stale postings table
  * behind — cross-run amortization is deliberately traded for
  * correctness; within a run (the bench protocol's JVM, a production
  * audit job) the build is paid once.
  */
object GramPostings {

  private val built = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Distinct (doc_id, gram) 13-gram postings for the corpus at `dir`,
    * materialized once per JVM as a gram-bucketed catalog table. The
    * build repartitions on `gram` with partition count == bucket count,
    * so Spark's bucket hash (the same murmur3 family) lands each task's
    * rows in exactly one bucket — one file per bucket, no write-side
    * explosion. Consumers typically wrap the returned relation in their
    * per-query `QueryCaches.tracked` cache: the cache build is then a
    * cheap bucketed scan instead of the full corpus explode.
    */
  private[graft] def postings13(s: SparkSession, dir: String): DataFrame = {
    val tbl = built.getOrElseUpdate(dir, {
      val name = "graft_postings13_" + java.lang.Long.toHexString(
        dir.hashCode.toLong & 0xffffffffL)
      // The warehouse dir can outlive the in-memory catalog (a previous
      // JVM's table files with no catalog entry): clear both, or CREATE
      // refuses with LOCATION_ALREADY_EXISTS — and a stale location must
      // never be adopted silently anyway (the corpus may have changed).
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      val g = CorpusPrep.hashedGrams(
          graft.source.Tables.spread(graft.source.Tables.documents(s, dir)),
          k = 13)
        .repartition(n, col("gram"))
        .distinct()
      graft.source.Bucketing.writeBucketed(g, name, "gram", n)
      name
    })
    s.table(tbl)
  }
}
