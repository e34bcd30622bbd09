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
