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

  test("non-live tables keep their offsets: init-dropped at restart, held while others advance, resumed on recovery (in_sql.rb:280-307)") {
    import graft.core.{ConnectionConfig, InputConfig, SourceTableConfig}
    exec("CREATE TABLE mt_p (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    exec("CREATE TABLE mt_q (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(20))")
    (1 to 10).foreach { i =>
      exec(s"INSERT INTO mt_p VALUES ($i, 'p$i')")
      exec(s"INSERT INTO mt_q VALUES ($i, 'q$i')")
    }
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftmt12;create=true")
    val cfg = InputConfig(tables = Seq(
      SourceTableConfig("mt_p", updateColumn = Some("id")),
      SourceTableConfig("mt_q", updateColumn = Some("id"))),
      selectLimit = 4)
    val cp = java.nio.file.Files.createTempDirectory("graft_hold_cp").toString
    def startQuery(sink: java.util.Queue[(String, String)]) =
      graft.streaming.KeysetTail.multiReader(spark, cc, cfg).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach { r =>
            sink.add((r.getString(0), r.getMap[String, String](1).get("ID").orNull))
          }
        }
        .option("checkpointLocation", cp).start()
    def latestOffsetJson(): String = {
      val dir = java.nio.file.Paths.get(cp, "offsets")
      import scala.jdk.CollectionConverters._
      val latest = java.nio.file.Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      new String(java.nio.file.Files.readAllBytes(latest), "UTF-8")
    }
    import scala.jdk.CollectionConverters._
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q1 = startQuery(got1)
    try q1.processAllAvailable() finally q1.stop()
    assert(got1.asScala.count(_._1 == "mt_q") === 10)
    // RESTART with mt_q gone: init drops it (in_sql.rb:233-243); mt_p
    // advances >= 1 batch — committed offsets must still CARRY mt_q's held
    // boundary (the r12 divergence: it was erased here)
    exec("DROP TABLE mt_q")
    (11 to 15).foreach(i => exec(s"INSERT INTO mt_p VALUES ($i, 'p$i')"))
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      assert(got2.asScala.map(_._1).toSet === Set("mt_p"))
      assert(got2.asScala.count(_._1 == "mt_p") === 5)
    } finally q2.stop()
    assert(latestOffsetJson().contains("\"mt_q\":\"10\""),
      s"mt_q's held boundary must survive mt_p's advance: ${latestOffsetJson()}")
    // SECOND restart with mt_q recreated WITH overlapping rows: it resumes
    // from the held boundary — only 11..12 emitted, never 1..10 again
    exec("CREATE TABLE mt_q (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(20))")
    (1 to 12).foreach(i => exec(s"INSERT INTO mt_q VALUES ($i, 'q$i')"))
    val got3 = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q3 = startQuery(got3)
    try {
      q3.processAllAvailable()
      val byTable = got3.asScala.toSeq.groupBy(_._1)
      assert(byTable.getOrElse("mt_p", Nil).isEmpty)
      assert(byTable("mt_q").map(_._2).toSet === Set("11", "12"))
    } finally q3.stop()
  }

  test("one pooled driver connection per stream: dead connection skips the cycle (offsets held), reconnects next trigger (in_sql.rb:259-265)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetMultiOffset, KeysetTailMulti}
    val poolUrl = "jdbc:derby:memory:graftmtpool" // NO ;create — reconnect can fail
    def execAt(u: String, sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(u)
      try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
      finally c.close()
    }
    execAt(poolUrl + ";create=true",
      "CREATE TABLE mt_pool (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    (1 to 5).foreach(i => execAt(poolUrl, s"INSERT INTO mt_pool VALUES ($i, 'v$i')"))
    val stream = new KeysetMultiMicroBatchStream(poolUrl, Map.empty,
      Seq(KeysetTailMulti.TableSpec("pool", "mt_pool", "id",
        graft.core.RubyStrftime.DefaultRubyFormat)),
      maxRowsPerBatch = 100, fetchFirst = true)
    try {
      val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
      assert(o1.asInstanceOf[KeysetMultiOffset].last("pool") === Some("5"))
      val liveConn = stream.cachedConn
      assert(liveConn != null && !liveConn.isClosed, "connection must be cached across polls")
      // kill the database: cached connection dies AND reconnect fails
      intercept[java.sql.SQLException](
        java.sql.DriverManager.getConnection(poolUrl + ";drop=true"))
      val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      assert(o2 === o1, "a dead connection must skip the cycle with every offset held")
      // database comes back: next trigger reconnects and resumes from the
      // held boundary
      execAt(poolUrl + ";create=true",
        "CREATE TABLE mt_pool (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      (1 to 8).foreach(i => execAt(poolUrl, s"INSERT INTO mt_pool VALUES ($i, 'v$i')"))
      val o3 = stream.latestOffset(o1, ReadLimit.allAvailable())
      assert(o3.asInstanceOf[KeysetMultiOffset].last("pool") === Some("8"))
      val parts = stream.planInputPartitions(o1, o3)
      assert(parts.length === 1)
      assert(parts(0).asInstanceOf[graft.streaming.KeysetMultiPartition].lo === Some("5"),
        "recovered table resumes strictly past the held boundary")
    } finally stream.stop()
  }

  test("persistent READ failure (poll fine) demotes the table after k probe failures; other tables keep flowing (in_sql.rb:272-275)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetMultiOffset, KeysetTailMulti}
    exec("CREATE TABLE mt_u1 (id BIGINT NOT NULL PRIMARY KEY, a VARCHAR(10), b VARCHAR(10))")
    exec("CREATE TABLE mt_u2 (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(10))")
    (1 to 3).foreach { i =>
      exec(s"INSERT INTO mt_u1 VALUES ($i, 'a$i', 'b$i')")
      exec(s"INSERT INTO mt_u2 VALUES ($i, 'w$i')")
    }
    val stream = new KeysetMultiMicroBatchStream(url, Map.empty,
      Seq(KeysetTailMulti.TableSpec("u1", "mt_u1", "id",
            graft.core.RubyStrftime.DefaultRubyFormat),
          KeysetTailMulti.TableSpec("u2", "mt_u2", "id",
            graft.core.RubyStrftime.DefaultRubyFormat)),
      maxRowsPerBatch = 100, fetchFirst = true, demoteAfter = 2)
    try {
      val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
      assert(o1.asInstanceOf[KeysetMultiOffset].last ===
        Map("u1" -> Some("3"), "u2" -> Some("3")))
      // break u1's FULL-ROW read while its poll (update column only) still
      // succeeds: the schema reflected at init names column b
      exec("ALTER TABLE mt_u1 DROP COLUMN b")
      (4 to 6).foreach { i =>
        exec(s"INSERT INTO mt_u1 (id, a) VALUES ($i, 'a$i')")
        exec(s"INSERT INTO mt_u2 VALUES ($i, 'w$i')")
      }
      // cycle 1: u1's advance is REJECTED by the read probe (offset held,
      // failure 1/2) while u2 advances and emits
      val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      val m2 = o2.asInstanceOf[KeysetMultiOffset].last
      assert(m2("u1") === Some("3"), "broken table's offset must hold")
      assert(m2("u2") === Some("6"), "healthy table must advance")
      assert(!stream.demoted.contains("u1"), "one failure is below the demotion bar")
      assert(stream.planInputPartitions(o1, o2).length === 1) // u2 only
      // cycle 2: second consecutive probe failure -> demoted for the run
      (7 to 7).foreach(i => exec(s"INSERT INTO mt_u2 VALUES ($i, 'w$i')"))
      val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())
      val m3 = o3.asInstanceOf[KeysetMultiOffset].last
      assert(m3("u1") === Some("3") && m3("u2") === Some("7"))
      assert(stream.demoted.contains("u1"),
        s"2 consecutive read failures must demote (demoted=${stream.demoted})")
      // demoted: no longer polled, offset still CARRIED in every commit
      (8 to 8).foreach(i => exec(s"INSERT INTO mt_u2 VALUES ($i, 'w$i')"))
      val o4 = stream.latestOffset(o3, ReadLimit.allAvailable())
      val m4 = o4.asInstanceOf[KeysetMultiOffset].last
      assert(m4("u1") === Some("3") && m4("u2") === Some("8"))
    } finally stream.stop()
  }

  test("demoted table RE-PROMOTES itself: backoff re-probe recovers the table without restart, resuming from its held offset (r13 verdict missing #1; in_sql.rb:272-275)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetMultiOffset, KeysetMultiReaderFactory, KeysetTailMulti}
    exec("CREATE TABLE mt_h1 (id BIGINT NOT NULL PRIMARY KEY, a VARCHAR(10), b VARCHAR(10))")
    exec("CREATE TABLE mt_h2 (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(10))")
    (1 to 3).foreach { i =>
      exec(s"INSERT INTO mt_h1 VALUES ($i, 'a$i', 'b$i')")
      exec(s"INSERT INTO mt_h2 VALUES ($i, 'w$i')")
    }
    val stream = new KeysetMultiMicroBatchStream(url, Map.empty,
      Seq(KeysetTailMulti.TableSpec("h1", "mt_h1", "id",
            graft.core.RubyStrftime.DefaultRubyFormat),
          KeysetTailMulti.TableSpec("h2", "mt_h2", "id",
            graft.core.RubyStrftime.DefaultRubyFormat)),
      maxRowsPerBatch = 100, fetchFirst = true,
      demoteAfter = 2, reprobeBackoffStart = 1)
    try {
      def last(o: org.apache.spark.sql.connector.read.streaming.Offset) =
        o.asInstanceOf[KeysetMultiOffset].last
      val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
      assert(last(o1) === Map("h1" -> Some("3"), "h2" -> Some("3")))
      // transient outage that OUTLASTS demoteAfter cycles (grant flap /
      // lock storm class): full-row read breaks while the poll succeeds
      exec("ALTER TABLE mt_h1 DROP COLUMN b")
      (4 to 6).foreach { i =>
        exec(s"INSERT INTO mt_h1 (id, a) VALUES ($i, 'a$i')")
        exec(s"INSERT INTO mt_h2 VALUES ($i, 'w$i')")
      }
      val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())  // fail 1/2
      val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())  // fail 2/2 -> demoted
      assert(stream.demoted.contains("h1"), s"demoted=${stream.demoted}")
      assert(last(o3)("h1") === Some("3") && last(o3)("h2") === Some("6"))
      // backoff=1 -> eligible next cycle; still broken -> re-arm doubles to 2
      val o4 = stream.latestOffset(o3, ReadLimit.allAvailable())
      assert(stream.demoted("h1").backoff === 2,
        s"failed re-probe must double the backoff: ${stream.demoted}")
      assert(last(o4)("h1") === Some("3"))
      // table recovers while a backoff window is pending
      exec("ALTER TABLE mt_h1 ADD COLUMN b VARCHAR(10)")
      val o5 = stream.latestOffset(o4, ReadLimit.allAvailable())
      assert(last(o5)("h1") === Some("3"), "inside the backoff window: not yet re-probed")
      // next eligible cycle: probe succeeds -> RE-PROMOTED, no restart,
      // boundary advances FROM THE HELD OFFSET (3), not from scratch
      val o6 = stream.latestOffset(o5, ReadLimit.allAvailable())
      assert(!stream.demoted.contains("h1"),
        s"recovered table must re-promote: ${stream.demoted}")
      assert(last(o6)("h1") === Some("6"))
      val part = stream.planInputPartitions(o5, o6).collectFirst {
        case p: graft.streaming.KeysetMultiPartition if p.tag == "h1" => p }
      assert(part.exists(_.lo === Some("3")),
        s"must resume from the held offset, not replay 1..3: $part")
      // rows actually flow through the recovered reader
      val rdr = new KeysetMultiReaderFactory().createReader(part.get)
      val ids = scala.collection.mutable.Set.empty[String]
      try while (rdr.next())
        ids += rdr.get().getMap(1).keyArray().array.map(_.toString)
          .zip(rdr.get().getMap(1).valueArray().array.map(_.toString))
          .toMap.apply("ID")
      finally rdr.close()
      assert(ids === Set("4", "5", "6"))
    } finally stream.stop()
  }

  test("tie inflation past the page bound is counted at the reader and WARNED (coarse update column); offsets stay exact") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetMultiOffset, KeysetMultiReader, KeysetMultiReaderFactory, KeysetTailMulti}
    exec("CREATE TABLE mt_tie (upd BIGINT NOT NULL, v VARCHAR(10))")
    (1 to 50).foreach(i => exec(s"INSERT INTO mt_tie VALUES (1, 'v$i')"))
    val stream = new KeysetMultiMicroBatchStream(url, Map.empty,
      Seq(KeysetTailMulti.TableSpec("tie", "mt_tie", "upd",
        graft.core.RubyStrftime.DefaultRubyFormat)),
      maxRowsPerBatch = 10, fetchFirst = true)
    try {
      val o0 = stream.initialOffset()
      val o1 = stream.latestOffset(o0, ReadLimit.allAvailable())
      // the VALUE-based page bound lands on the tie value: all 50 rows of
      // the tie group travel in ONE batch against a bound of 10
      assert(o1.asInstanceOf[KeysetMultiOffset].last("tie") === Some("1"))
      val parts = stream.planInputPartitions(o0, o1)
      assert(parts.length === 1)
      val rdr = new KeysetMultiReaderFactory().createReader(parts(0))
      var n = 0
      try while (rdr.next()) n += 1 finally rdr.close()
      assert(n === 50, "whole tie group travels (strict-> contract, no split)")
      // the reader observed >2x the page bound and warned (the documented
      // coarse-update-column hazard, r13 verdict what's-wrong #2)
      assert(KeysetMultiReader.tieInflation.get("tie") === 50L,
        s"inflation must be recorded: ${KeysetMultiReader.tieInflation}")
      // offsets stay EXACT through the inflated batch: nothing re-emits,
      // and later fine-grained rows flow normally
      (1 to 5).foreach(i => exec(s"INSERT INTO mt_tie VALUES (2, 'w$i')"))
      val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
      assert(o2.asInstanceOf[KeysetMultiOffset].last("tie") === Some("2"))
      val p2 = stream.planInputPartitions(o1, o2)
      val rdr2 = new KeysetMultiReaderFactory().createReader(p2(0))
      var n2 = 0
      try while (rdr2.next()) n2 += 1 finally rdr2.close()
      assert(n2 === 5, "exactly the new rows — no duplicate, no loss")
    } finally stream.stop()
  }

  test("e2e: mid-stream column drop on one table never wedges the batch; the query stays live and other tables flow") {
    import graft.core.{ConnectionConfig, InputConfig, SourceTableConfig}
    exec("CREATE TABLE mt_e1 (id BIGINT NOT NULL PRIMARY KEY, a VARCHAR(10), b VARCHAR(10))")
    exec("CREATE TABLE mt_e2 (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(10))")
    (1 to 6).foreach { i =>
      exec(s"INSERT INTO mt_e1 VALUES ($i, 'a$i', 'b$i')")
      exec(s"INSERT INTO mt_e2 VALUES ($i, 'w$i')")
    }
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftmt12;create=true")
    val cfg = InputConfig(tables = Seq(
      SourceTableConfig("mt_e1", updateColumn = Some("id")),
      SourceTableConfig("mt_e2", updateColumn = Some("id"))),
      selectLimit = 3)
    val cp = java.nio.file.Files.createTempDirectory("graft_demote_cp").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = graft.streaming.KeysetTail.multiReader(spark, cc, cfg).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          got.add((r.getString(0), r.getMap[String, String](1).get("ID").orNull))
        }
      }
      .option("checkpointLocation", cp).start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      assert(got.asScala.count(_._1 == "mt_e1") === 6)
      // break mt_e1's read mid-stream (poll on id still succeeds); without
      // the read probe the planned partition would fail the micro-batch
      // into Spark's retry loop, wedging mt_e2 too
      exec("ALTER TABLE mt_e1 DROP COLUMN b")
      (7 to 12).foreach { i =>
        exec(s"INSERT INTO mt_e1 (id, a) VALUES ($i, 'a$i')")
        exec(s"INSERT INTO mt_e2 VALUES ($i, 'w$i')")
      }
      q.processAllAvailable()
      assert(got.asScala.count(_._1 == "mt_e2") === 12, "healthy table must keep flowing")
      assert(got.asScala.count(_._1 == "mt_e1") === 6, "broken table held, not partially emitted")
      assert(q.isActive && q.exception.isEmpty,
        s"query must stay live through the broken table: ${q.exception}")
    } finally q.stop()
  }

  test("config-time %z guard: timestamp update column + %z time_format on a zone-less dialect fails AT CONSTRUCTION naming table and fix") {
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetTailMulti}
    exec("CREATE TABLE mt_zg (upd TIMESTAMP NOT NULL, v VARCHAR(10))")
    exec("INSERT INTO mt_zg VALUES (TIMESTAMP('2024-01-01 00:00:01'), 'v1')")
    // multi provider: the reference DEFAULT time_format carries %z
    val e1 = intercept[IllegalArgumentException](
      new KeysetMultiMicroBatchStream(url, Map.empty,
        Seq(KeysetTailMulti.TableSpec("zg", "mt_zg", "upd",
          graft.core.RubyStrftime.DefaultRubyFormat)),
        maxRowsPerBatch = 100, fetchFirst = true))
    assert(e1.getMessage.contains("mt_zg") && e1.getMessage.contains("%z") &&
      e1.getMessage.contains("zone-less"), e1.getMessage)
    // single-table provider: same guard at stream construction
    val schema = spark.read.jdbc(url, "mt_zg", new java.util.Properties()).schema
    val e2 = intercept[IllegalArgumentException](
      new graft.streaming.KeysetMicroBatchStream(schema,
        graft.streaming.JdbcMode(url, "mt_zg", Map.empty, fetchFirst = true),
        "upd", 100, graft.core.RubyStrftime.DefaultRubyFormat))
    assert(e2.getMessage.contains("mt_zg") && e2.getMessage.contains("time_format"))
    // %Z (zone NAME -> 'zzz', e.g. ' UTC') is equally rejected by Derby's
    // timestamp cast — the guard must cover it too (ADVICE r13)
    val e3 = intercept[IllegalArgumentException](
      new KeysetMultiMicroBatchStream(url, Map.empty,
        Seq(KeysetTailMulti.TableSpec("zg", "mt_zg", "upd",
          "%Y-%m-%d %H:%M:%S %Z")),
        maxRowsPerBatch = 100, fetchFirst = true))
    assert(e3.getMessage.contains("mt_zg") && e3.getMessage.contains("zone"))
    // detection tokenizes like RubyStrftime: every %z variant and %Z hit;
    // an escaped '%%z' (literal percent + literal z) does not
    import graft.core.RubyStrftime.hasZoneDirective
    assert(hasZoneDirective("%z") && hasZoneDirective("%:z") &&
      hasZoneDirective("%::z") && hasZoneDirective("%Z") &&
      hasZoneDirective("%%%z"))
    assert(!hasZoneDirective("%%z") && !hasZoneDirective("%Y-%m-%d %H:%M:%S.%6N"))
    // a zone-less format on the same table constructs fine (and the
    // existing timestamp e2e proves it runs)
    new KeysetMultiMicroBatchStream(url, Map.empty,
      Seq(KeysetTailMulti.TableSpec("zg", "mt_zg", "upd",
        "%Y-%m-%d %H:%M:%S.%6N")),
      maxRowsPerBatch = 100, fetchFirst = true).stop()
  }

  test("at-least-once through crash + broken table: a skipped in-flight replay range ROLLS the boundary BACK instead of dropping rows") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.streaming.{KeysetMultiMicroBatchStream, KeysetMultiOffset, KeysetTailMulti}
    exec("CREATE TABLE mt_r1 (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(10))")
    exec("CREATE TABLE mt_r2 (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(10))")
    (1 to 5).foreach { i =>
      exec(s"INSERT INTO mt_r1 VALUES ($i, 'v$i')")
      exec(s"INSERT INTO mt_r2 VALUES ($i, 'w$i')")
    }
    def specs = Seq(
      KeysetTailMulti.TableSpec("r1", "mt_r1", "id", graft.core.RubyStrftime.DefaultRubyFormat),
      KeysetTailMulti.TableSpec("r2", "mt_r2", "id", graft.core.RubyStrftime.DefaultRubyFormat))
    def mkStream() = new KeysetMultiMicroBatchStream(url, Map.empty, specs,
      maxRowsPerBatch = 100, fetchFirst = true)
    // incarnation 1: both tables advance to 5; the engine logs this offset
    // to the WAL, then "crashes" before the batch completes
    val s1 = mkStream()
    val o0 = s1.initialOffset()
    val o1 = s1.latestOffset(o0, ReadLimit.allAvailable())
    assert(o1.asInstanceOf[KeysetMultiOffset].last ===
      Map("r1" -> Some("5"), "r2" -> Some("5")))
    s1.stop()
    // mt_r1 breaks while the stream is down
    exec("DROP TABLE mt_r1")
    // incarnation 2: r1 fails init (dropped); the engine REPLAYS (o0, o1]
    val s2 = mkStream()
    try {
      val parts = s2.planInputPartitions(o0, o1)
      assert(parts.length === 1, "only the readable table's range is planned")
      // the next offset commit must REWIND r1 to the skipped range's start
      // (a quiet cycle — no new rows anywhere — must still commit it)
      val o2 = s2.latestOffset(o1, ReadLimit.allAvailable())
      val m2 = o2.asInstanceOf[KeysetMultiOffset].last
      assert(m2("r1") === None, s"boundary must roll back to range start: $m2")
      assert(m2("r2") === Some("5"))
      // Spark now plans the rollback COMMIT itself as a batch (o1 -> o2):
      // r1's range reads as non-live with lo=5, hi=None. Without the
      // run-scoped rolled-back record this would queue ANOTHER rollback to
      // lo — RE-ADVANCING r1 to the unread 5 on the next commit, and the
      // boundary would ping-pong None<->5 forever (one spurious batch per
      // trigger; a restart on the wrong parity LOSES the range) — ADVICE
      // r14 high. The planned batch must be empty and the boundary must
      // STAY at the rewound start across further cycles.
      assert(s2.planInputPartitions(o1, o2).isEmpty,
        "the rollback's own batch has no readable ranges")
      val o2b = s2.latestOffset(o2, ReadLimit.allAvailable())
      assert(o2b.asInstanceOf[KeysetMultiOffset].last("r1") === None,
        s"no ping-pong re-advance: ${o2b.asInstanceOf[KeysetMultiOffset].last}")
      assert(s2.planInputPartitions(o2, o2b).isEmpty)
      val o2c = s2.latestOffset(o2b, ReadLimit.allAvailable())
      assert(o2c.asInstanceOf[KeysetMultiOffset].last("r1") === None,
        "rewound boundary stays put on every later cycle")
      // recovery: mt_r1 back with its rows (+1 new); a fresh incarnation
      // resumes from the REWOUND boundary and re-emits the whole skipped
      // range — duplicates, never loss
      exec("CREATE TABLE mt_r1 (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(10))")
      (1 to 6).foreach(i => exec(s"INSERT INTO mt_r1 VALUES ($i, 'v$i')"))
      val s3 = mkStream()
      try {
        val o3 = s3.latestOffset(o2, ReadLimit.allAvailable())
        assert(o3.asInstanceOf[KeysetMultiOffset].last("r1") === Some("6"))
        val replay = s3.planInputPartitions(o2, o3)
        val r1Part = replay.collectFirst {
          case p: graft.streaming.KeysetMultiPartition if p.tag == "r1" => p }
        assert(r1Part.exists(_.lo.isEmpty),
          s"recovered table must re-read from the rewound start: $r1Part")
      } finally s3.stop()
    } finally s2.stop()
  }

  test("all_tables discovery feeds the ONE multi stream: schema_migrations skipped, PK-defaulted update columns, PK-less/composite dropped (in_sql.rb:214-230)") {
    import graft.core.{ConnectionConfig, InputConfig}
    val dUrl = "jdbc:derby:memory:graftdisc;create=true"
    def execAt(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(dUrl)
      try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
      finally c.close()
    }
    execAt("CREATE TABLE disc_one (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(10))")
    execAt("CREATE TABLE disc_two (id BIGINT NOT NULL PRIMARY KEY, w VARCHAR(10))")
    execAt("CREATE TABLE schema_migrations (version VARCHAR(20) NOT NULL PRIMARY KEY)")
    execAt("CREATE TABLE disc_nopk (a BIGINT)")
    execAt("CREATE TABLE disc_comp (a BIGINT NOT NULL, b BIGINT NOT NULL, PRIMARY KEY (a, b))")
    (1 to 7).foreach(i => execAt(s"INSERT INTO disc_one VALUES ($i, 'v$i')"))
    (1 to 4).foreach(i => execAt(s"INSERT INTO disc_two VALUES ($i, 'w$i')"))
    execAt("INSERT INTO schema_migrations VALUES ('20240101')")
    val cc = ConnectionConfig(adapter = "derby",
      database = "memory:graftdisc;create=true")
    // the reference's all_tables REPLACES configured <table> blocks whole
    val cfg = InputConfig(tables = Nil, allTables = true, selectLimit = 3)
    val cp = java.nio.file.Files.createTempDirectory("graft_disc_cp").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = graft.streaming.KeysetTail.discoveredMultiReader(spark, cc, cfg).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          r.getMap[String, String](1) // shape check: serialized record map
          got.add((r.getString(0), r.getMap[String, String](1).head._2))
        }
      }
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val byTag = got.asScala.toSeq.groupBy(_._1)
    // only the PK-tailable user tables survive discovery: the framework
    // system table and the PK-less/composite-PK tables never appear
    assert(byTag.keySet === Set("DISC_ONE", "DISC_TWO"), byTag.keySet)
    assert(byTag("DISC_ONE").size === 7)
    assert(byTag("DISC_TWO").size === 4)
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
