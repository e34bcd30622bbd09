package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Small bounded cache of persisted intermediate DataFrames, keyed by the
  * analyzed plan's semantic hash — so repeated ops over the same input in
  * one session share ONE cached instance instead of accumulating
  * block-manager entries per call (the round-2 advisor finding).
  *
  * Bounds and hygiene:
  *  - at most `MaxEntries` live entries; inserting beyond that unpersists
  *    and evicts the least-recently-used COMPLETED entry (in-flight builds
  *    are never evicted — the bound may be exceeded transiently while more
  *    than `MaxEntries` builds overlap);
  *  - entries whose session has stopped are dropped eagerly;
  *  - `clear()` releases everything (long-lived callers own cleanup);
  *  - a build that THROWS unpersists its partial persist and removes its
  *    reservation, so the failure path leaks no block-manager entry.
  *
  * Concurrency (r14 advice): the global monitor is held only for map
  * bookkeeping. The persist + eager count() — a full Spark job — runs
  * OUTSIDE it behind a per-key latch, so concurrent getOrPersist calls on
  * DIFFERENT keys (e.g. Materialize.stageAll thunks) materialize in
  * parallel, while a second caller of the SAME key blocks on the latch and
  * then shares the one cached instance.
  *
  * Staleness contract: like any persisted DataFrame, a cached entry
  * reflects the underlying files AT FIRST MATERIALIZATION. If input data is
  * rewritten in-place mid-session, call `clear()` — the cache can no more
  * observe the rewrite than a user-managed `.persist()` could.
  */
private[ops] object PlanCache {
  private val MaxEntries = 8

  private final class Slot {
    val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile var df: DataFrame = _ // set iff build succeeded
    @volatile var err: Throwable = _ // set iff build failed
    // set under the monitor when clear()/eviction races an in-flight
    // build: the builder then unpersists its own result on completion
    @volatile var orphaned: Boolean = false
    def done: Boolean = latch.getCount == 0
  }

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, Int, String), Slot]

  def getOrPersist(owner: DataFrame, tag: String)(build: => DataFrame): DataFrame = {
    val key = (owner.sparkSession, owner.queryExecution.analyzed.semanticHash(), tag)
    var mine: Slot = null
    val slot = synchronized {
      // drop entries belonging to stopped sessions before sizing decisions
      entries.filterInPlace { case ((s, _, _), sl) =>
        val alive = !s.sparkContext.isStopped
        if (!alive) { sl.orphaned = true; if (sl.done && sl.df != null) sl.df.unpersist(blocking = false) }
        alive
      }
      entries.remove(key) match {
        case Some(sl) => entries.put(key, sl); sl // re-insert = LRU touch
        case None =>
          if (entries.size >= MaxEntries)
            entries.find(_._2.done).foreach { case (k, sl) => // eldest completed
              if (sl.df != null) sl.df.unpersist(blocking = false)
              entries.remove(k)
            }
          mine = new Slot
          entries.put(key, mine)
          mine
      }
    }
    if (slot ne mine) {
      slot.latch.await()
      if (slot.err != null) throw slot.err
      slot.df
    } else {
      try {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        // materialize EAGERLY: every cached table here exists because
        // SEVERAL plan branches consume it, and Spark materializes a
        // lazy InMemoryRelation independently per branch of one action
        // (the round-11 q_dedup_recall race) - the PPJoin prefix table
        // was measured building TWICE inside its own candidate join
        // (2x 224k-row pipeline stages). One count() pays the build
        // once; every branch then reads the cache.
        try df.count()
        catch { case t: Throwable => df.unpersist(blocking = false); throw t }
        slot.df = df
        synchronized { if (slot.orphaned) df.unpersist(blocking = false) }
        df
      } catch {
        case t: Throwable =>
          slot.err = t
          synchronized {
            if (entries.get(key).contains(slot)) entries.remove(key)
          }
          throw t
      } finally slot.latch.countDown()
    }
  }

  def clear(): Unit = synchronized {
    entries.values.foreach { sl =>
      sl.orphaned = true
      if (sl.done && sl.df != null) sl.df.unpersist(blocking = false)
    }
    entries.clear()
  }
}
