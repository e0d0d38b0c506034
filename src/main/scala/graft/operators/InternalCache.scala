package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for operator-INTERNAL persisted frames.
  *
  * Several operators persist small reused intermediates (minhash
  * shingles, LSH band rows, filtered n-grams, the daily-anomaly frame):
  * the returned plan references them lazily, so the operator itself can
  * never know when it is safe to unpersist. Instead every internal
  * persist is registered here, and callers release them all with ONE
  * targeted call once they have materialized their results:
  *
  * {{{
  *   val pairs = TextDedup.minhashNearDups(...)
  *   pairs.write.parquet(out)        // action — caches did their job
  *   InternalCache.release()         // drop ONLY operator-internal frames
  * }}}
  *
  * `release()` never touches caller-owned caches (unlike
  * `spark.catalog.clearCache()`), and unpersisting is always safe —
  * plans remain valid and simply recompute if re-executed.
  */
object InternalCache {

  private val frames = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist an operator-internal frame and register it for release. */
  private[graft] def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    frames.add(p)
    p
  }

  /** Unpersist (non-blocking) every operator-internal frame registered
    * since the last release. */
  def release(): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = frames.poll()
    }
  }
}
