package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the keyset tail (or any streaming
  * DataFrame): the windowing surface the reference never had (its event time
  * is extracted, `in_sql.rb:143-148`, but never windowed — SURVEY §2.2).
  *
  * All operators are watermark-bounded so state is finite at 100 TB/day
  * rates: Spark drops per-window state once the watermark passes, and the
  * same code runs unchanged in batch mode (watermark becomes a no-op),
  * which is how the specs assert stream==batch parity.
  */
object StreamOps {

  /** Tumbling event-time counts/sums per window × event type.
    * Late rows beyond `watermarkDelay` are dropped, bounding state. */
  def tumblingAgg(events: DataFrame, tsCol: String, watermarkDelay: String,
                  windowDur: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"),
        col("total_value"))

  /** Windowed approximate-distinct via the mergeable KMV sketch
    * (`graft.ops.Sketch.KmvAgg`): per tumbling window, estimate distinct
    * `keyCol` values. Mergeability is exactly what streaming needs — each
    * micro-batch folds its partial bottom-k into the window's state, and
    * the emitted estimate equals the batch computation over the same rows
    * (asserted stream==batch in StreamOpsSpec). */
  def tumblingKmvDistinct(events: DataFrame, tsCol: String, watermarkDelay: String,
                          windowDur: String, keyCol: String, k: Int = 64): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      // COUNT(DISTINCT) semantics: null keys don't count (and would crash
      // the Aggregator's primitive Long input encoder)
      .filter(col(keyCol).isNotNull)
      .select(col(tsCol), graft.ops.Sketch.portableUnitHashLong(col(keyCol)).as("h"))
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(org.apache.spark.sql.functions.udaf(new graft.ops.Sketch.KmvAgg(k))
        .apply(col("h")).as("est_distinct"))
      .select(col("w.start").as("w_start"), col("est_distinct"))

  /** Windowed count-min cells (`graft.ops.Sketch.cmCell`): per tumbling
    * window, the depth×width frequency-sketch cell table over `keyCol`.
    * Like the windowed KMV, the construction is a partially-aggregable
    * count — each micro-batch's partial cells merge into window state by
    * addition, so the emitted table equals the batch sketch over the same
    * rows (asserted stream==batch in StreamOpsSpec). Downstream consumers
    * answer point queries with min-over-rows against the emitted cells. */
  def tumblingCountMin(events: DataFrame, tsCol: String, watermarkDelay: String,
                       windowDur: String, keyCol: String,
                       width: Int = 32, depth: Int = 4): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), posexplode(
          array((0 until depth).map(d =>
            graft.ops.Sketch.cmCell(col(keyCol), d, width)): _*))
        .as(Seq("d", "cell")))
      .groupBy(window(col(tsCol), windowDur).as("w"), col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("d"), col("cell"), col("cnt"))

  /** Gap-based session windows (native `session_window`): per user, sessions
    * close after `gap` of event-time silence. */
  def sessionAgg(events: DataFrame, tsCol: String, watermarkDelay: String,
                 gap: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup: each key emitted once for the stream's
    * lifetime — the streaming form of Dedup.exactGroups. State grows with
    * the distinct-key count (a fingerprint set; at 100 TB prefer
    * `dedupStreamBounded` unless the key space is itself bounded). */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)

  /** Watermark-bounded streaming dedup: exact within the watermark horizon,
    * constant state; a key re-appearing after the watermark passes is
    * re-emitted (at-least-once per key, by design). */
  def dedupStreamBounded(events: DataFrame, tsCol: String, watermarkDelay: String,
                         keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream interval join: rows pair when keys match and
    * the right event time falls in [leftTs - lower, leftTs + upper]. The
    * watermark + interval bound is what lets Spark evict join state — an
    * unbounded stream-stream join would buffer both streams forever. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, watermarkDelay: String,
                   keyCond: org.apache.spark.sql.Column,
                   lower: String, upper: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, keyCond &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lower") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upper"))
  }

  /** Custom keyed state via flatMapGroupsWithState: per-key high-watermark
    * monitor that emits one row per micro-batch per key whose running max
    * `value` advanced. State = one double per key (timeout-free here;
    * production would set an event-time timeout). Demonstrates the
    * arbitrary-state API where built-in windows can't express the op. */
  final case class MaxState(maxValue: Double)
  final case class MaxAdvance(user_id: Long, new_max: Double)

  def runningMaxAdvances(events: DataFrame): Dataset[MaxAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[MaxState]) =>
          val prev = state.getOption.map(_.maxValue).getOrElse(Double.NegativeInfinity)
          val batchMax = rows.map(_._2).foldLeft(Double.NegativeInfinity)(math.max)
          if (batchMax > prev) {
            state.update(MaxState(batchMax))
            Iterator(MaxAdvance(user, batchMax))
          } else Iterator.empty
      }
  }
}
