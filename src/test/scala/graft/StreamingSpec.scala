package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{InputConfig, SourceTableConfig}
import graft.sources.{FileStateStore, KeysetTailRunner, MemoryStateStore, Tables}

class StreamingSpec extends SparkSpecBase {

  private lazy val eventsMicro = {
    // keyset-tail reads raw parquet; stage the ns→µs-normalized events once
    val dir = Files.createTempDirectory("graft_events_us").toString
    Tables.events(spark, sf0001).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("keyset-tail micro-batch source drains the table in limit-sized pages") {
    val out = spark.readStream
      .format("graft.streaming.KeysetTailProvider")
      .option("path", eventsMicro)
      .option("updateColumn", "event_id")
      .option("maxRowsPerBatch", "300")
      .load()
    val q = out.writeStream
      .format("memory").queryName("tail_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT count(*) c, count(distinct event_id) d FROM tail_out").collect().head
      assert(got.getLong(0) === 1000)
      assert(got.getLong(1) === 1000) // each page picked up exactly once
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4) // ceil(1000/300) pages
    } finally q.stop()
  }

  test("timestamp update column: offsets round-trip through serialized strings") {
    val out = spark.readStream
      .format("graft.streaming.KeysetTailProvider")
      .option("path", eventsMicro)
      .option("updateColumn", "ts")
      .option("maxRowsPerBatch", "400")
      .load()
    val q = out.writeStream.format("memory").queryName("tail_ts")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // strict > on a non-unique timestamp may legally skip same-µs rows at
      // page boundaries (reference behavior, SURVEY §2.1); no duplicates ever
      val got = spark.sql("SELECT count(*) c, count(distinct event_id) d FROM tail_ts").collect().head
      assert(got.getLong(0) === got.getLong(1))
      assert(got.getLong(0) >= 990 && got.getLong(0) <= 1000)
    } finally q.stop()
  }

  test("non-string/timestamp columns (date, decimal, binary, array) survive the tail") {
    val dir = Files.createTempDirectory("graft_typed").toString
    spark.sql(
      """SELECT id,
        |  DATE'2024-01-01' + make_interval(0,0,0,CAST(id AS INT)) AS d,
        |  CAST(id AS DECIMAL(10,2)) / 3 AS m,
        |  encode(CAST(id AS STRING), 'UTF-8') AS payload,
        |  array(id, id * 2) AS arr
        |FROM range(0, 50)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = spark.readStream
      .format("graft.streaming.KeysetTailProvider")
      .option("path", dir)
      .option("updateColumn", "id")
      .option("maxRowsPerBatch", "20")
      .load()
    val q = out.writeStream.format("memory").queryName("tail_typed")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT count(*) c, count(distinct id) u,
          |  sum(CAST(decode(payload, 'UTF-8') AS LONG)) pay_sum,
          |  max(d) dmax, sum(m) msum, sum(arr[1]) arr_sum
          |FROM tail_typed""".stripMargin).collect().head
      assert(got.getLong(0) === 50 && got.getLong(1) === 50)
      assert(got.getLong(2) === (0 until 50).sum)
      assert(got.getDate(3).toString === "2024-02-19")
      assert(got.getDecimal(4).compareTo(new java.math.BigDecimal("408.333333")) === 0)
      assert(got.getLong(5) === (0 until 50).map(_ * 2).sum)
    } finally q.stop()
  }

  test("checkpoint recovery resumes from the committed offset (at-least-once)") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_sink").toString
    def run(): Unit = {
      val out = spark.readStream
        .format("graft.streaming.KeysetTailProvider")
        .option("path", eventsMicro)
        .option("updateColumn", "event_id")
        .option("maxRowsPerBatch", "250")
        .load()
      val q = out.writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // full drain
    run() // restart: must resume at the end, not re-emit
    val got = spark.read.parquet(outDir)
    assert(got.count() === 1000)
    assert(got.select("event_id").distinct().count() === 1000)
  }

  test("mid-stream kill + restart: resumes from the offset log, no gaps, source growth picked up") {
    // own staged table so appending growth can't disturb other tests
    val srcDir = Files.createTempDirectory("graft_grow").toString
    spark.range(0, 1000).selectExpr("id AS event_id", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_ckpt2").toString
    val outDir = Files.createTempDirectory("graft_sink2").toString
    def stream() = spark.readStream
      .format("graft.streaming.KeysetTailProvider")
      .option("path", srcDir)
      .option("updateColumn", "event_id")
      .option("maxRowsPerBatch", "100")
      .load()
    // slow trigger so the query is reliably mid-stream when killed
    val q1 = stream().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(500)).start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!q1.recentProgress.exists(_.numInputRows > 0) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(q1.recentProgress.exists(_.numInputRows > 0), "no batch committed before kill")
    } finally q1.stop() // kill mid-stream: offset log holds a partial position
    val sofar = spark.read.parquet(outDir).count()
    assert(sofar >= 100, s"expected at least one 100-row page, got $sofar")
    // the table keeps growing while the consumer is down (tail semantics)
    spark.range(1000, 1200).selectExpr("id AS event_id", "id * 2 AS v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = stream().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir)
    // no gaps: every id delivered exactly once through the recovered offset
    // (file sink + offset log give effective exactly-once here; the source
    // contract itself is at-least-once)
    assert(got.select("event_id").distinct().count() === 1200)
    assert(got.count() === 1200)
  }

  test("kill at a page boundary inside a tie group: value-delimited batches lose NOTHING on restart") {
    // NON-UNIQUE update column with the page boundary splitting a tie
    // group: upd values 1,2,2,2,3,4 and a 2-row page limit put the
    // serialized boundary ("2") in the middle of three upd=2 rows. The
    // reference's row-limit paging would SKIP the other two on resume
    // (see the RunnerSpec twin below — the batch runner mirrors that
    // contract faithfully). The streaming provider instead delimits each
    // micro-batch by the boundary VALUE — planInputPartitions takes every
    // row in (start, end] — so a tie group always travels whole and a
    // crash-restart at the boundary is exactly-once with NO skipped rows:
    // the deliberate improvement over the reference, pinned here.
    val srcDir = Files.createTempDirectory("graft_ties").toString
    spark.createDataFrame(Seq(
        (10L, 1L), (20L, 2L), (21L, 2L), (22L, 2L), (30L, 3L), (40L, 4L)))
      .toDF("id", "upd")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_ckpt3").toString
    val outDir = Files.createTempDirectory("graft_sink3").toString
    def stream() = spark.readStream
      .format("graft.streaming.KeysetTailProvider")
      .option("path", srcDir)
      .option("updateColumn", "upd")
      .option("maxRowsPerBatch", "2")
      .load()
    // Trigger.Once = exactly one micro-batch, then the query dies — the
    // controlled stand-in for a crash right after batch 0's offset commit
    val q1 = stream().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q1.awaitTermination(30000)
    val afterKill = spark.read.parquet(outDir).select("id", "upd").collect()
    // the 2-row PAGE chose boundary "2"; the BATCH carries the whole
    // <= 2 value range, so all three tie rows arrive together
    assert(afterKill.length === 4, afterKill.mkString(","))
    assert(afterKill.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 2L, 2L))
    // the offset log carries the boundary as the SERIALIZED STRING "2" —
    // the reference's state-file form, not a binary value
    val offset0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "offsets", "0")))
    assert(offset0.contains("\"last\":\"2\""), offset0)
    // restart from the offset log: strict > '2' resumes at upd=3; nothing
    // is replayed and nothing was lost
    val q2 = stream().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir).select("id", "upd").collect()
    assert(got.length === 6, got.mkString(","))
    assert(got.map(_.getLong(0)).distinct.length === 6)
    assert(got.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 2L, 2L, 3L, 4L))
  }
}

class RunnerSpec extends SparkSpecBase {
  private def cfg(tables: SourceTableConfig*) =
    InputConfig(tables.toSeq, tagPrefix = Some("db"), selectLimit = 300)

  test("poll cycle: page, emit, then state update; drain to exhaustion") {
    val store = new MemoryStateStore
    val runner = new KeysetTailRunner(spark, cfg(
      SourceTableConfig("events", updateColumn = Some("event_id"))),
      (s, t) => Tables.table(s, t match { case "events" => sf0001 }, t), store)
    var emitted = 0L
    var tags = Set.empty[String]
    val total = runner.drain((tag, df) => { emitted += df.count(); tags += tag })
    assert(total === 1000 && emitted === 1000)
    assert(tags === Set("db.events"))
    assert(store.lastRecord("events").get("event_id") === "999")
  }

  test("state file persists across runners (in_sql.rb:280-307) — resume, not replay") {
    val f = Files.createTempFile("graft_runner_state", ".json").toString
    val load = (s: org.apache.spark.sql.SparkSession, t: String) => Tables.table(s, sf0001, t)
    val c = cfg(SourceTableConfig("events", updateColumn = Some("event_id")))
    val r1 = new KeysetTailRunner(spark, c, load, new FileStateStore(f))
    r1.pollOnce((_, _) => ()) // first page: 300 rows
    val r2 = new KeysetTailRunner(spark, c, load, new FileStateStore(f))
    var firstId = -1L
    r2.pollOnce((_, df) => firstId = df.agg(min("event_id")).collect().head.getLong(0))
    assert(firstId === 300) // resumed strictly after the persisted boundary
  }

  test("all_tables discovery: tag = table name, unresolvable tables dropped (in_sql.rb:214-230)") {
    val store = new MemoryStateStore
    val updFor = Map("events" -> "event_id", "orders" -> "o_orderkey").get _
    val runner = KeysetTailRunner.discovering(spark, sf0001, store, updFor,
      tagPrefix = Some("db"), selectLimit = 400)
    // all 10 parquet tables discovered; only the two resolvable ones survive
    assert(runner.activeTables.map(_.table).sorted === Seq("events", "orders"))
    var tags = Set.empty[String]
    val counts = runner.pollOnce((tag, _) => tags += tag)
    assert(counts === Map("events" -> 400L, "orders" -> 400L))
    assert(tags === Set("db.events", "db.orders"))
  }

  test("crash at a page boundary inside a tie group: strict-> resume SKIPS the rest of the group (in_sql.rb:131, SURVEY §2.1)") {
    // The batch runner mirrors the reference's ROW-LIMIT paging exactly,
    // so the documented skip semantics are observable here: upd values
    // 1,2,2,2,3,4 with select_limit=2 put the page boundary at the first
    // of three upd=2 rows; the persisted resume value is the SERIALIZED
    // STRING "2" and the next poll's strict `upd > '2'` never sees the
    // other two tie rows — skipped, not replayed, not duplicated. (The
    // streaming provider deliberately improves on this with value-
    // delimited batches — see the StreamingSpec tie-group test.)
    val dir = Files.createTempDirectory("graft_runner_ties").toString
    spark.createDataFrame(Seq(
        (10L, 1L), (20L, 2L), (21L, 2L), (22L, 2L), (30L, 3L), (40L, 4L)))
      .toDF("id", "upd")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val f = Files.createTempFile("graft_ties_state", ".json").toString
    val load = (s: org.apache.spark.sql.SparkSession, t: String) =>
      s.read.parquet(dir)
    val c = InputConfig(Seq(SourceTableConfig("ties", updateColumn = Some("upd"))),
      selectLimit = 2)
    var seen = Vector.empty[(Long, Long)]
    val collect = (tag: String, df: org.apache.spark.sql.DataFrame) =>
      seen = seen ++ df.select("id", "upd").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    val r1 = new KeysetTailRunner(spark, c, load, new FileStateStore(f))
    assert(r1.pollOnce(collect) === Map("ties" -> 2L)) // page 1: upd 1, 2(first)
    assert(seen.map(_._2) === Vector(1L, 2L))
    // "crash": the runner dies after the state write; the persisted resume
    // value is the serialized STRING boundary, exactly like the YAML file
    val persisted = new FileStateStore(f).lastRecord("ties").get("upd")
    assert(persisted === "2")
    // restart from the state file: strict > '2' → upd 3, 4. The two
    // remaining upd=2 rows are SKIPPED — the reference contract
    val r2 = new KeysetTailRunner(spark, c, load, new FileStateStore(f))
    assert(r2.pollOnce(collect) === Map("ties" -> 2L))
    assert(seen.map(_._2) === Vector(1L, 2L, 3L, 4L))
    assert(seen.map(_._1).count(Set(20L, 21L, 22L)) === 1) // 2 of 3 ties skipped
    // drained: nothing left, the skipped rows never arrive
    assert(r2.pollOnce(collect).getOrElse("ties", 0L) === 0L)
    assert(seen.length === 4)
  }

  test("per-table fault isolation (in_sql.rb:233-243, 272-275)") {
    val store = new MemoryStateStore
    val c = cfg(
      SourceTableConfig("nope", updateColumn = Some("missing")),     // init failure → dropped
      SourceTableConfig("events", updateColumn = Some("event_id")))
    val runner = new KeysetTailRunner(spark, c,
      (s, t) => Tables.table(s, sf0001, t), store)
    assert(runner.activeTables.map(_.table) === Seq("events")) // bad table dropped
    val counts = runner.pollOnce((_, _) => ())
    assert(counts("events") === 300) // healthy table unaffected
  }
}
