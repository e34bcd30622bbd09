package graft

import org.apache.spark.sql.functions._

/** Round-12 multi-table streaming coordination (r11 verdict #2): one
  * keyset-tail-multi stream over all configured tables with per-table
  * fault isolation and per-table offsets in one checkpoint. */
class MultiTailSpec extends SparkSpecBase {
  private val url = "jdbc:derby:memory:graftmt12;create=true"

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
    finally c.close()
  }

  test("keyset-tail-multi: one coordinated poll loop; dropped table skipped mid-stream; per-table offsets intact across restart") {
    import graft.core.{ConnectionConfig, InputConfig, SourceTableConfig}
    exec("CREATE TABLE mt_a (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    exec("CREATE TABLE mt_b (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(20))")
    (1 to 10).foreach { i =>
      exec(s"INSERT INTO mt_a VALUES ($i, 'a$i')")
      exec(s"INSERT INTO mt_b VALUES ($i, 'b$i')")
    }
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftmt12;create=true")
    // three configured tables, one nonexistent: init failure DROPS it
    // (in_sql.rb:233-243) while the stream starts with the survivors
    val cfg = InputConfig(tables = Seq(
      SourceTableConfig("mt_a", updateColumn = Some("id")),
      SourceTableConfig("mt_b", updateColumn = Some("id")),
      SourceTableConfig("mt_missing", updateColumn = Some("id"))),
      selectLimit = 6)
    val cp = java.nio.file.Files.createTempDirectory("graft_multi_cp").toString
    // foreachBatch sink (memory sink refuses checkpoint RECOVERY, which
    // the restart half of this test is about)
    def startQuery(sink: java.util.Queue[(String, String)]) =
      graft.streaming.KeysetTail.multiReader(spark, cc, cfg).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach { r =>
            sink.add((r.getString(0), r.getMap[String, String](1).get("ID").orNull))
          }
        }
        .option("checkpointLocation", cp).start()
    def counts(sink: java.util.Queue[(String, String)]): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      sink.asScala.toSeq.groupBy(_._1).map { case (t, xs) => t -> xs.size }
    }
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q1 = startQuery(got1)
    try {
      q1.processAllAvailable()
      assert(counts(got1) === Map("mt_a" -> 10, "mt_b" -> 10))
      // record carries the §1.2 serialized map (Derby uppercases names)
      import scala.jdk.CollectionConverters._
      val rec = got1.asScala.filter(_._1 == "mt_a").map(_._2).toSet
      assert(rec === (1 to 10).map(_.toString).toSet)
      // MID-STREAM failure: drop one table while the query runs — the
      // other table's new rows must still flow (in_sql.rb:272-275)
      exec("DROP TABLE mt_b")
      (11 to 15).foreach(i => exec(s"INSERT INTO mt_a VALUES ($i, 'a$i')"))
      q1.processAllAvailable()
      assert(counts(got1) === Map("mt_a" -> 15, "mt_b" -> 10))
      assert(q1.isActive && q1.exception.isEmpty,
        s"query stalled on the dropped table: ${q1.exception}")
    } finally q1.stop()
    // restart from the SAME checkpoint: mt_b recreated with overlapping
    // rows — its held offset (10) must skip 1..10 and emit only 11..12;
    // mt_a resumes past 15
    exec("CREATE TABLE mt_b (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(20))")
    (1 to 12).foreach(i => exec(s"INSERT INTO mt_b VALUES ($i, 'b$i')"))
    exec("INSERT INTO mt_a VALUES (16, 'a16')")
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(counts(got2) === Map("mt_a" -> 1, "mt_b" -> 2))
      val bIds = got2.asScala.filter(_._1 == "mt_b").map(_._2).toSet
      assert(bIds === Set("11", "12"))
    } finally q2.stop()
  }

  test("full reference loop as ONE pipeline: multi-tail -> route -> map-from-record -> JDBC sink") {
    import graft.core.{ConnectionConfig, InputConfig, OutputConfig, SinkTableConfig, SourceTableConfig}
    exec("CREATE TABLE src_users (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(20))")
    exec("CREATE TABLE src_orders (id BIGINT NOT NULL PRIMARY KEY, amount VARCHAR(10))")
    (1 to 5).foreach(i => exec(s"INSERT INTO src_users VALUES ($i, 'u$i')"))
    (1 to 7).foreach(i => exec(s"INSERT INTO src_orders VALUES ($i, '${i}0.5')"))
    // serialized (string) landing, like the reference's record hashes;
    // unquoted DDL → Spark's append resolves DB column names case-insensitively
    exec("CREATE TABLE dst_users (uid VARCHAR(20), uname VARCHAR(20), tag VARCHAR(40))")
    // `gone` is CLOB: Spark's DerbyDialect types a NULL StringType bind as
    // CLOB (setNull(CLOB) into VARCHAR is a Derby error) — Derby-only quirk
    exec("CREATE TABLE dst_rest (rid VARCHAR(20), gone CLOB, tag VARCHAR(40))")
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftmt12;create=true")
    val icfg = InputConfig(tables = Seq(
      SourceTableConfig("src_users", updateColumn = Some("id")),
      SourceTableConfig("src_orders", updateColumn = Some("id"))),
      tagPrefix = Some("db"), selectLimit = 4)
    // record keys are the dialect's identifiers (Derby: upper-case);
    // `tag` reads the event tag; `MISSING` proves absent-source → NULL
    val ocfg = OutputConfig(
      routes = Seq(SinkTableConfig("src_users", "dst_users", "ID:uid,NAME:uname,tag")),
      defaultTable = SinkTableConfig("", "dst_rest", "ID:rid,MISSING:gone,tag"),
      removeTagPrefix = Some("db"))
    val cp = java.nio.file.Files.createTempDirectory("graft_loop_cp").toString
    val q = graft.streaming.KeysetTail.multiReader(spark, cc, icfg).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.EventOps.routedTablesFromMap(b.toDF(), ocfg).foreach {
          case (table, df) => graft.sinks.JdbcSink.bulkAppend(df, url, table)
        }
      }
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    val noProps = new java.util.Properties()
    val users = spark.read.jdbc(url, "dst_users", noProps)
      .orderBy(col("uid").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(users === (1 to 5).map(i => (s"$i", s"u$i", "src_users")))
    val rest = spark.read.jdbc(url, "dst_rest", noProps)
      .orderBy(col("rid").cast("long"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getString(2))).toSeq
    assert(rest === (1 to 7).map(i => (s"$i", None, "src_orders")))
  }

  test("multi-tail on a TIMESTAMP update column: zone-less timeFormat resumes through the DB cast") {
    import graft.core.{ConnectionConfig, InputConfig, SourceTableConfig}
    exec("CREATE TABLE mt_ts (upd TIMESTAMP NOT NULL, v VARCHAR(20))")
    (1 to 8).foreach(i =>
      exec(s"INSERT INTO mt_ts VALUES (TIMESTAMP('2024-01-01 00:00:0$i'), 'v$i')"))
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftmt12;create=true")
    // Derby rejects a %z zone suffix in timestamp comparisons (FIXTURES /
    // round-11): the reference config for a Derby-class dialect carries a
    // zone-less time_format, exactly as the single-table source requires
    val cfg = InputConfig(tables = Seq(
      SourceTableConfig("mt_ts", updateColumn = Some("upd"),
        timeFormat = "%Y-%m-%d %H:%M:%S.%6N")), selectLimit = 3)
    val cp = java.nio.file.Files.createTempDirectory("graft_mt_ts_cp").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def startQuery() =
      graft.streaming.KeysetTail.multiReader(spark, cc, cfg).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => got.add(r.getMap[String, String](1)("V")))
        }
        .option("checkpointLocation", cp).start()
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === (1 to 8).map(i => s"v$i").toSet)
    // restart: the serialized-string boundary round-trips through the DB
    // cast — only rows strictly past it arrive
    exec("INSERT INTO mt_ts VALUES (TIMESTAMP('2024-01-01 00:00:09'), 'v9')")
    got.clear()
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(got.asScala.toSet === Set("v9"))
  }

  test("KeysetMultiOffset: tag-map offsets round-trip JSON, one line, escapes intact") {
    import graft.streaming.KeysetMultiOffset
    val o = KeysetMultiOffset(Map(
      "t.with\"quote" -> Some("2024-01-01 00:00:01.000000+0000"),
      "plain" -> None,
      "nl" -> Some("a\nb\\c")))
    val j = o.json()
    assert(!j.contains('\n'), s"offset json must be one line: $j")
    assert(KeysetMultiOffset.fromJson(j) === o)
  }
}
