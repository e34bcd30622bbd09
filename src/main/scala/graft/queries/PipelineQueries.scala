package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{ColumnMapping, TagPattern}
import graft.ops.EventOps
import graft.sources.{KeysetScan, Tables}

/** Declared queries for the reference's own pipeline semantics
  * (SURVEY §2.1 I2–I8, O3–O6), each with a DuckDB oracle.
  *
  * Determinism rules (FIXTURES.md): fixed-literal fallbacks instead of
  * now(); every query ends in an ORDER BY on a unique key; `events.ts`
  * (ns in parquet) is truncated to µs identically on both sides.
  */
object PipelineQueries {

  private val TsFmtNoZone = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  val defs: Map[String, QueryDef] = Map(

    // I2/I3/I4/I5: keyset scan resuming from a serialized integer PK.
    "q_incr_scan_id" -> QueryDef.sql(
      (s, dir) => KeysetScan.scan(Tables.events(s, dir), "event_id", Some("100"), 500),
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE event_id > 100 ORDER BY event_id ASC LIMIT 500""".stripMargin,
      doc = "in_sql.rb:129-135 keyset page, integer update_column"),

    // I2 first-poll case: no lower bound when no state (in_sql.rb:131).
    "q_incr_scan_first" -> QueryDef.sql(
      (s, dir) => KeysetScan.scan(Tables.events(s, dir), "event_id", None, 500),
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id ASC LIMIT 500""".stripMargin,
      doc = "first poll emits from the beginning"),

    // I2 with a timestamp update_column: resume value is the SERIALIZED
    // string (in_sql.rb:131,141), parsed back via the table time_format.
    // Unique tiebreak on event_id for deterministic page boundaries.
    "q_incr_scan_ts" -> QueryDef.sql(
      (s, dir) => KeysetScan.scan(Tables.events(s, dir), "ts",
        Some("2024-01-02 03:00:00.000000+0000"), 500, tieBreak = Some("event_id")),
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-02 03:00:00'
        |ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC LIMIT 500""".stripMargin,
      doc = "string-serialized timestamp resume"),

    // I6: row serialization — Time → strftime string (µs + zone), natives pass.
    "q_serialize_coerce" -> QueryDef.sql(
      (s, dir) => EventOps.serializeRecord(Tables.events(s, dir)).orderBy("event_id"),
      """SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') || '+0000' AS ts,
        |       user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
      doc = "in_sql.rb:87-96 serialization, default %Y-%m-%d %H:%M:%S.%6N%z"),

    // I7: event-time normalization — parseable → event time; NULL/garbage →
    // fallback (fixed literal for determinism; production uses now()).
    "q_time_normalize" -> QueryDef.sql(
      (s, dir) => {
        val dirty = Tables.events(s, dir).withColumn("time_str",
          when(col("event_id") % 3 === 0, date_format(col("ts"), TsFmtNoZone))
            .when(col("event_id") % 3 === 1, lit(null).cast("string"))
            .otherwise(lit("not a timestamp")))
        EventOps.normalizeEventTime(dirty, "time_str",
            fallback = lit("2026-01-01 00:00:00").cast("timestamp"),
            parsePattern = Some(TsFmtNoZone))
          .select("event_id", "time_str", "event_time").orderBy("event_id")
      },
      """SELECT event_id, time_str,
        |       coalesce(try_strptime(time_str, '%Y-%m-%d %H:%M:%S.%f'),
        |                TIMESTAMP '2026-01-01 00:00:00') AS event_time
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 3 = 0 THEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')
        |                  WHEN event_id % 3 = 1 THEN NULL
        |                  ELSE 'not a timestamp' END AS time_str
        |      FROM events) ORDER BY event_id""".stripMargin,
      doc = "in_sql.rb:117-126,143-148 lenient parse + fallback"),

    // I4/I5 as a standalone top-k: plans as TakeOrderedAndProject.
    "q_select_limit_sort" -> QueryDef.sql(
      (s, dir) => Tables.events(s, dir).select("event_id", "event_type", "value")
        .orderBy(col("value").desc, col("event_id").asc).limit(100),
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,
      doc = "sort+limit → top-k without global sort"),

    // I8 + O3 + O4: tag assignment, prefix strip, first-match routing.
    "q_tag_route" -> QueryDef.sql(
      (s, dir) => {
        val routes = Seq(
          TagPattern("db.{purchase,refund}") -> "t_money",
          TagPattern("db.click")             -> "t_clicks",
          TagPattern("db.{signup,login}")    -> "t_auth")
        Tables.events(s, dir)
          .withColumn("tag", concat(lit("db."), col("event_type")))
          .withColumn("stripped_tag", EventOps.stripTagPrefix(col("tag"), "db"))
          .withColumn("dest_table", EventOps.routeColumn(col("tag"), routes, "t_default"))
          .groupBy("tag", "stripped_tag", "dest_table")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("tag")
      },
      """SELECT tag, stripped_tag, dest_table, COUNT(*) AS n_events FROM (
        |  SELECT 'db.' || event_type AS tag, event_type AS stripped_tag,
        |         CASE WHEN regexp_matches('db.' || event_type, '^(?:db\.purchase|db\.refund)$') THEN 't_money'
        |              WHEN regexp_matches('db.' || event_type, '^db\.click$') THEN 't_clicks'
        |              WHEN regexp_matches('db.' || event_type, '^(?:db\.signup|db\.login)$') THEN 't_auth'
        |              ELSE 't_default' END AS dest_table
        |  FROM events) GROUP BY 1, 2, 3 ORDER BY tag""".stripMargin,
      doc = "out_sql.rb:226-237 first-match routing + 160-162 prefix strip"),

    // O5 + O6: inject tag/time, then column-mapping projection
    // (rename + prune; absent source → NULL).
    "q_column_mapping" -> QueryDef.sql(
      (s, dir) => {
        val injected = EventOps.injectTagTime(Tables.events(s, dir),
          tagCol = concat(lit("db."), col("event_type")), timeCol = col("ts"))
        ColumnMapping.parse("event_id:event_id,timestamp:created_at,tag:tag,props:message,host:host")
          .apply(injected).orderBy("event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS created_at, 'db.' || event_type AS tag,
        |       props AS message, CAST(NULL AS VARCHAR) AS host
        |FROM events ORDER BY event_id""".stripMargin,
      doc = "out_sql.rb:61-72,140-148 column_mapping; inject out_sql.rb:96"),

    // Data-contract report (the dbt-test / great-expectations shape a
    // landing zone gates on): each check is one independent aggregate —
    // null keys, duplicate PKs, FK orphans (anti-join count), range and
    // staleness warns. Hard checks pass at 0 on the clean fixture; the
    // warn checks count real distribution tails so both report branches
    // carry signal. Each check scans once; the union is check-count rows.
    "q_data_quality" -> QueryDef.sql(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val ev = Tables.events(s, dir)
        def one(name: String, df: org.apache.spark.sql.DataFrame) =
          df.select(lit(name).as("check_name"), col("n").cast("long").as("n_violations"))
        one("fk_lineitem_orders_orphans",
            li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
              .agg(count(lit(1)).as("n")))
          .union(one("pk_orders_duplicates",
            o.agg((count(lit(1)) - count_distinct(col("o_orderkey"))).as("n"))))
          .union(one("not_null_l_quantity",
            li.agg(count(when(col("l_quantity").isNull, 1)).as("n"))))
          .union(one("pk_events_duplicates",
            ev.agg((count(lit(1)) - count_distinct(col("event_id"))).as("n"))))
          .union(one("warn_totalprice_gt_450k",
            o.agg(count(when(col("o_totalprice") > 450000, 1)).as("n"))))
          .union(one("warn_events_before_jan10",
            ev.agg(count(when(col("ts") < lit("2024-01-10").cast("timestamp"), 1)).as("n"))))
          .withColumn("passed", col("n_violations") === 0L)
          .orderBy("check_name")
      },
      """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
        |  n_violations = 0 AS passed FROM (
        |  SELECT 'fk_lineitem_orders_orphans' AS check_name, COUNT(*) AS n_violations
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'pk_orders_duplicates', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'not_null_l_quantity', COUNT(*) FILTER (WHERE l_quantity IS NULL) FROM lineitem
        |  UNION ALL
        |  SELECT 'pk_events_duplicates', COUNT(*) - COUNT(DISTINCT event_id) FROM events
        |  UNION ALL
        |  SELECT 'warn_totalprice_gt_450k', COUNT(*) FILTER (WHERE o_totalprice > 450000) FROM orders
        |  UNION ALL
        |  SELECT 'warn_events_before_jan10',
        |    COUNT(*) FILTER (WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10') FROM events
        |) ORDER BY check_name""".stripMargin,
      doc = "data-contract report: PK/FK/null/range/staleness checks, one " +
        "aggregate each (dbt-test shape)")
  )
}
