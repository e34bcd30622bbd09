package graft.sources

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{InputConfig, SourceTableConfig}

/** Batch poll loop over a set of tailed tables — the reference's
  * `thread_main` cycle (`in_sql.rb:255-278`) as an explicit, testable step
  * function. Structured Streaming (graft.streaming.KeysetTailProvider) is
  * the production scheduler; this runner provides the same semantics for
  * batch/cron invocation and for tests:
  *
  *   - per-table: read last state → keyset page → emit → THEN update state
  *     (at-least-once, `in_sql.rb:269-271`)
  *   - per-table fault isolation: an emit/scan failure logs and continues
  *     with the other tables (`in_sql.rb:272-275`); init failures drop the
  *     table from the set (`in_sql.rb:233-243`)
  */
final class KeysetTailRunner(
    spark: SparkSession,
    cfg: InputConfig,
    loadTable: (SparkSession, String) => DataFrame,
    store: StateStore) {

  /** Tables that survived init (update column resolvable). */
  val activeTables: Seq[SourceTableConfig] = cfg.tables.filter { t =>
    try {
      val df = loadTable(spark, t.table)
      t.updateColumn.orElse(t.primaryKey).exists(df.columns.contains) ||
        (t.updateColumn.isEmpty && t.primaryKey.isEmpty && false)
    } catch { case NonFatal(_) => false }
  }

  val lastErrors: mutable.Map[String, Throwable] = mutable.Map.empty

  /** One poll cycle. Returns rows emitted per table. */
  def pollOnce(emit: (String, DataFrame) => Unit): Map[String, Long] = {
    val emitted = mutable.LinkedHashMap.empty[String, Long]
    activeTables.foreach { t =>
      try {
        val df = loadTable(spark, t.table)
        val updCol = t.updateColumn.orElse(t.primaryKey).getOrElse(
          throw new IllegalStateException(s"${t.table}: no update_column/primary_key"))
        val last = store.lastRecord(t.table).flatMap(_.get(updCol))
        val page = KeysetScan.scan(df, updCol, last, cfg.selectLimit,
          rubyTimeFormat = t.timeFormat)
        val rows = page.collect() // bounded by select_limit, like the reference page
        if (rows.nonEmpty) {
          val tag = t.resolvedTag(cfg.tagPrefix)
          emit(tag, spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
            page.schema))
          // state update AFTER emit: crash between = replay (at-least-once)
          store.update(t.table, Serialize.rowToStringMap(page.schema, rows.last, t.timeFormat))
        }
        emitted += t.table -> rows.length.toLong
      } catch {
        case NonFatal(e) =>
          lastErrors(t.table) = e // isolate: other tables keep polling
          emitted += t.table -> -1L
      }
    }
    emitted.toMap
  }

  /** Poll until every table returns an empty page (Trigger.AvailableNow
    * catch-up semantics). */
  def drain(emit: (String, DataFrame) => Unit, maxCycles: Int = 1000): Long = {
    var total = 0L
    var cycle = 0
    var progressed = true
    while (progressed && cycle < maxCycles) {
      val counts = pollOnce(emit)
      val emittedNow = counts.values.filter(_ > 0).sum
      total += emittedNow
      progressed = emittedNow > 0
      cycle += 1
    }
    total
  }
}

object KeysetTailRunner {

  /** `all_tables` discovery (`in_sql.rb:178-180, 214-230`): every
    * non-system table in the directory becomes a tailed source with
    * tag = table name (`in_sql.rb:224`); `updateColumnFor` plays the role
    * of PK reflection (parquet has no PK metadata), and tables it cannot
    * resolve are dropped at init like the reference's `reject!`
    * (`in_sql.rb:233-243`). */
  def discovering(spark: SparkSession, dir: String, store: StateStore,
                  updateColumnFor: String => Option[String],
                  tagPrefix: Option[String] = None,
                  selectLimit: Int = 500): KeysetTailRunner = {
    val tables = Tables.discover(dir).map { name =>
      SourceTableConfig(name, tag = Some(name), updateColumn = updateColumnFor(name))
    }
    val cfg = InputConfig(tables, tagPrefix = tagPrefix,
      selectLimit = selectLimit, allTables = true)
    new KeysetTailRunner(spark, cfg, (s, t) => Tables.table(s, dir, t), store)
  }
}
