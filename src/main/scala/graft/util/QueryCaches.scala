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

  /** Persist `df` (memory-and-disk, spillable) and remember it for the
    * next [[drain]]. Returns `df` for use mid-chain.
    */
  def tracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(p)
    p
  }

  /** Unpersist everything registered since the last drain (non-blocking —
    * block eviction proceeds async while the caller moves on).
    */
  def drain(): Unit = {
    var d = reg.poll()
    while (d != null) { d.unpersist(blocking = false); d = reg.poll() }
  }

  /** Number of currently-registered (not yet drained) cached frames. */
  def pending: Int = reg.size()
}
