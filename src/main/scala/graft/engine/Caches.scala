package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry of frames persisted INSIDE graft operators.
  *
  * Several operators (minhashPairs, simhashPairs, winnowPairs, dupSpans,
  * srpNearDups, packChunks) persist an internal co-partitioned frame so a
  * self-join reads one cached exchange instead of shuffling the payload
  * twice. The returned DataFrames are lazy, so the operator itself cannot
  * know when the caller is done with them — in a long-lived session repeated
  * invocations would otherwise accumulate cached blocks (disk-backed blocks
  * are never evicted) until the context shuts down.
  *
  * Every such internal persist is therefore tracked here; after
  * materializing an operator's output (collect/write/count), call
  * [[Caches.releaseAll]] to drop all operator-internal caches. Batch entry
  * points ([[graft.Bench]], [[graft.Verify]], [[graft.CurateMain]]) do this
  * between queries. Unpersisting is non-blocking and safe at any point —
  * a frame still mid-consumption is recomputed, never corrupted. */
object Caches {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(p)
    p
  }

  /** Number of currently-tracked operator-internal caches. */
  def trackedCount: Int = reg.size()

  /** Unpersist every operator-internal cache registered since the last
    * release (non-blocking). */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = reg.poll()
    }
  }
}
