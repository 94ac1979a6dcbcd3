package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for intra-query persist()s (self-joined intermediates: LSH
  * bands, prefix-filter token sets, TF relations). Each query's cache is
  * only useful while that query's single action runs; without an explicit
  * unpersist, a suite that executes every query several times (Bench: one
  * warmup + three timed passes) accumulates cached blocks until the
  * ContextCleaner or LRU eviction catches up. Harness entrypoints
  * ([[graft.Bench]], [[graft.Verify]]) call [[drain]] after materializing
  * each query, so every pass pays — and releases — its own cache.
  *
  * The long-lived parity caches ([[graft.parity.ParityData]]) are shared
  * across queries by design and deliberately NOT registered here.
  */
object QueryCaches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val keyedReg = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Persist `df` (memory-and-disk, spillable) and remember it for the
    * next [[drain]]. Returns `df` for use mid-chain.
    */
  def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(p)
    p
  }

  /** Keyed shared-relation registry: expensive relations that several
    * queries COMPOSE (the connected-components cluster relations q56/
    * q129/q144/q146/q162/q167 all consume) build once per key within an
    * undrained session and are handed to every subsequent consumer —
    * q167 alone otherwise re-runs BOTH cluster pipelines q56 and q129
    * already paid for. The build itself is [[tracked]], so [[drain]]
    * both unpersists it and invalidates the key (the per-query bench/
    * verify protocol stays hermetic; a composed production job reaps the
    * reuse). Key must identify the inputs (include the corpus dir).
    */
  def keyed(key: String)(build: => DataFrame): DataFrame =
    keyedReg.getOrElseUpdate(key, tracked(build))

  /** Unpersist everything registered since the last drain (non-blocking —
    * block eviction proceeds async while the caller moves on), and
    * invalidate all keyed shared relations.
    */
  def drain(): Unit = {
    keyedReg.clear()
    var d = reg.poll()
    while (d != null) { d.unpersist(blocking = false); d = reg.poll() }
  }

  /** Number of currently-registered (not yet drained) cached frames. */
  def pending: Int = reg.size()
}
