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
  *    and evicts the least-recently-used entry;
  *  - entries whose session has stopped are dropped eagerly;
  *  - `clear()` releases everything (long-lived callers own cleanup).
  *
  * Staleness contract: like any persisted DataFrame, a cached entry
  * reflects the underlying files AT FIRST MATERIALIZATION. If input data is
  * rewritten in-place mid-session, call `clear()` — the cache can no more
  * observe the rewrite than a user-managed `.persist()` could.
  */
private[ops] object PlanCache {
  private val MaxEntries = 8
  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, Int, String), DataFrame]

  def getOrPersist(owner: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    synchronized {
      // drop entries belonging to stopped sessions before sizing decisions
      entries.filterInPlace { case ((s, _, _), df) =>
        val alive = !s.sparkContext.isStopped
        if (!alive) df.unpersist(blocking = false)
        alive
      }
      val key = (owner.sparkSession, owner.queryExecution.analyzed.semanticHash(), tag)
      entries.remove(key) match {
        case Some(df) => entries.put(key, df); df // re-insert = LRU touch
        case None =>
          if (entries.size >= MaxEntries) {
            val (k, df) = entries.head // eldest
            df.unpersist(blocking = false)
            entries.remove(k)
          }
          val df = build.persist(StorageLevel.MEMORY_AND_DISK)
          // materialize EAGERLY: every cached table here exists because
          // SEVERAL plan branches consume it, and Spark materializes a
          // lazy InMemoryRelation independently per branch of one action
          // (the round-11 q_dedup_recall race) - the PPJoin prefix table
          // was measured building TWICE inside its own candidate join
          // (2x 224k-row pipeline stages). One count() pays the build
          // once; every branch then reads the cache.
          df.count()
          entries.put(key, df)
          df
      }
    }

  def clear(): Unit = synchronized {
    entries.values.foreach(_.unpersist(blocking = false))
    entries.clear()
  }
}
