package graft.sources

/** Process-wide counters for driver-side METADATA operations — the
  * serial commit bill the composed builds pay (catalog renames, MSCK
  * repairs, partition drops, cache refreshes). At 100 TB the data work
  * is distributed but this bill is O(#commits × metadata latency) on
  * ONE driver thread, and it is exactly what blew q246/q258 up on a
  * slower-metadata machine (VERDICT r12) — so it must be a recorded
  * number, not a guess. [[graft.JobProfile]] snapshots these around a
  * query; every metadata statement in [[Materialize]] routes through
  * [[inc]]/[[add]].
  *
  * Thread-safe ([[java.util.concurrent.atomic.LongAdder]] per kind):
  * the erasure rewrites commit from parallel threads. */
object MetaOps {

  private val counts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.LongAdder]()

  def inc(kind: String): Unit = add(kind, 1L)

  def add(kind: String, n: Long): Unit =
    counts.computeIfAbsent(kind,
      _ => new java.util.concurrent.atomic.LongAdder).add(n)

  /** Current counter values (kind → count). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }

  def reset(): Unit = counts.clear()
}
