package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cross-query registry for SHARED materialized intermediates.
  *
  * Some expensive intermediates are consumed by more than one query in
  * a pipeline run — the verified minhash near-dup pair graph feeds both
  * the pair report (q23) and the cluster assignment (q48); the SimHash
  * removal set feeds both the dedup end product (q54) and the training
  * mix (q57). A real daily pipeline materializes such a table once and
  * every consumer reads it; recomputing the whole pair pipeline per
  * consumer doubles the most expensive stage of the run.
  *
  * `getOrBuild` persists the frame on first request and hands every
  * later request (same key, same session) the already-persisted plan.
  * Unlike [[InternalCache]] — operator-private frames released after
  * every query — shared frames live for a whole pipeline RUN and are
  * dropped with `release()` at run end (Bench: end of each sweep;
  * Verify: end of the dump). Eviction is always safe: the plan simply
  * recomputes.
  */
object SharedFrames {

  private val frames = new ConcurrentHashMap[String, DataFrame]()

  /** Return the shared frame for `key`, building and persisting it on
    * first request. Keys must include the session identity (plans are
    * session-bound) and every parameter the build depends on.
    *
    * REENTRANT by design: builders nest (q48's cluster frame builds on
    * top of the shared pair frame, so its builder calls getOrBuild
    * again) — running `build` inside `computeIfAbsent` would make the
    * nested insert a recursive update of the same ConcurrentHashMap,
    * which throws `IllegalStateException: Recursive update` whenever
    * the two keys land in the same bin (bin-collision-dependent, so it
    * surfaced as a FLAKY crash in the r8 scale panel, not a
    * deterministic failure). The build therefore runs OUTSIDE the map,
    * with `putIfAbsent` after; the benign race (two concurrent firsts
    * both build, one persisted plan wins and the loser's unpersisted
    * plan is garbage) is the correct trade — callers are single-
    * threaded driver loops, and eviction/rebuild is always safe. */
  def getOrBuild(key: String)(build: => DataFrame): DataFrame = {
    val cached = frames.get(key)
    if (cached != null) cached
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = frames.putIfAbsent(key, built)
      if (prev != null) { built.unpersist(blocking = false); prev }
      else built
    }
  }

  /** Session+input-scoped key helper. */
  def key(spark: org.apache.spark.sql.SparkSession, parts: String*): String =
    (System.identityHashCode(spark).toString +: parts).mkString(":")

  private val values = new ConcurrentHashMap[String, AnyRef]()

  /** Shared DRIVER-SIDE value (bounded, e.g. a trained k×dims centroid
    * table) with the same run lifecycle as the shared frames: computed
    * once per (key), dropped at `release()`. Reentrant for the same
    * reason as [[getOrBuild]] — computations may nest. */
  def getOrCompute[T <: AnyRef](key: String)(f: => T): T = {
    val cached = values.get(key)
    if (cached != null) cached.asInstanceOf[T]
    else {
      val computed = f
      val prev = values.putIfAbsent(key, computed)
      (if (prev != null) prev else computed).asInstanceOf[T]
    }
  }

  /** Unpersist and forget every shared frame (end of a pipeline run). */
  def release(blocking: Boolean = false): Unit = {
    frames.values.forEach(df => { df.unpersist(blocking); () })
    frames.clear()
    values.clear()
  }
}
