package graft.tools

import org.apache.spark.sql.{Dataset, Row, SparkSession}

/** Coordination-overhead probe for the round-12 multi-table stream: drain
  * the SAME N Derby tables once as ONE `keyset-tail-multi` query and once
  * as N independent single-table `keyset-tail` queries (the pre-r12
  * shape), and report wall + checkpoint count for each. The semantics are
  * spec-proven elsewhere (MultiTailSpec); this measures what a user with
  * the reference's many-tables config actually pays per shape.
  *
  * `runMain graft.tools.ProbeMultiTail [nTables] [rowsPerTable] [pageSize]`
  * prints one JSON line; recorded in BASELINE.md. */
object ProbeMultiTail {
  def main(args: Array[String]): Unit = {
    val nTables = args.lift(0).map(_.toInt).getOrElse(8)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(5000)
    val page = args.lift(2).map(_.toInt).getOrElse(500) // the reference default
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val url = "jdbc:derby:memory:graftmulti;create=true"

    def exec(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
      finally c.close()
    }
    (0 until nTables).foreach { t =>
      exec(s"CREATE TABLE mt_$t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      val c = java.sql.DriverManager.getConnection(url)
      try {
        c.setAutoCommit(false)
        val st = c.prepareStatement(s"INSERT INTO mt_$t VALUES (?, ?)")
        (1 to rowsPer).foreach { i =>
          st.setLong(1, i.toLong); st.setString(2, s"v$i"); st.addBatch()
          if (i % 1000 == 0) st.executeBatch()
        }
        st.executeBatch(); c.commit(); st.close()
      } finally c.close()
    }

    val total = new java.util.concurrent.atomic.AtomicLong()
    def sinkTo(b: Dataset[Row]): Unit = total.addAndGet(b.count())

    // ONE coordinated query over all tables
    def drainMulti(): Double = {
      total.set(0L)
      val cp = java.nio.file.Files.createTempDirectory("multi_cp").toString
      var r = spark.readStream.format("keyset-tail-multi")
        .option("url", url).option("maxRowsPerBatch", page.toString)
      (0 until nTables).foreach { t =>
        r = r.option(s"tables.$t.tag", s"t$t")
          .option(s"tables.$t.dbtable", s"mt_$t")
          .option(s"tables.$t.updateColumn", "id")
      }
      val t0 = System.nanoTime()
      val q = r.load().writeStream
        .foreachBatch((b: Dataset[Row], _: Long) => sinkTo(b))
        .option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
      require(total.get() == nTables.toLong * rowsPer,
        s"multi drained ${total.get()} != ${nTables * rowsPer}")
      (System.nanoTime() - t0) / 1e9
    }

    // N independent queries (the pre-r12 `readers` shape), started together
    def drainIndependent(): Double = {
      total.set(0L)
      val t0 = System.nanoTime()
      val qs = (0 until nTables).map { t =>
        val cp = java.nio.file.Files.createTempDirectory(s"ind_cp_$t").toString
        spark.readStream.format("keyset-tail")
          .option("url", url).option("dbtable", s"mt_$t")
          .option("updateColumn", "id").option("maxRowsPerBatch", page.toString)
          .load().writeStream
          .foreachBatch((b: Dataset[Row], _: Long) => sinkTo(b))
          .option("checkpointLocation", cp).start()
      }
      try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
      require(total.get() == nTables.toLong * rowsPer,
        s"independent drained ${total.get()} != ${nTables * rowsPer}")
      (System.nanoTime() - t0) / 1e9
    }

    // multi first, then independent (each drains from scratch — fresh
    // checkpoints; table contents identical)
    val multiSec = drainMulti()
    val indSec = drainIndependent()

    // pure poll-overhead phase (r13): M empty trigger cycles on drained
    // tables through ONE multi stream, driver-side only — what a short
    // `select_interval` pays per trigger when nothing changed. The cached
    // connection makes this 0 connects/cycle; the round-12 shape paid
    // nTables connects per cycle (JdbcSource.connectCount is the witness).
    val pollCycles = 200
    val (pollSec, connects) = {
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      val specs = (0 until nTables).map(t => graft.streaming.KeysetTailMulti
        .TableSpec(s"t$t", s"mt_$t", "id", graft.core.RubyStrftime.DefaultRubyFormat))
      val stream = new graft.streaming.KeysetMultiMicroBatchStream(
        url, Map.empty, specs, page, fetchFirst = true)
      try {
        var o = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
        val c0 = graft.sources.JdbcSource.connectCount.get()
        val t0 = System.nanoTime()
        (1 to pollCycles).foreach { _ =>
          o = stream.latestOffset(o, ReadLimit.allAvailable())
        }
        ((System.nanoTime() - t0) / 1e9,
          graft.sources.JdbcSource.connectCount.get() - c0)
      } finally stream.stop()
    }

    val rows = nTables.toLong * rowsPer
    println(s"""{"metric":"multi_tail_drain","tables":$nTables,"rows":$rows,""" +
      s""""page":$page,"multi_sec":${f"$multiSec%.2f"},""" +
      s""""independent_sec":${f"$indSec%.2f"},""" +
      s""""multi_rows_per_sec":${(rows / multiSec).round},""" +
      s""""independent_rows_per_sec":${(rows / indSec).round},""" +
      s""""checkpoints":{"multi":1,"independent":$nTables},""" +
      s""""empty_poll":{"cycles":$pollCycles,""" +
      s""""per_cycle_ms":${f"${pollSec * 1000 / pollCycles}%.2f"},""" +
      s""""connects_during_polls":$connects,""" +
      s""""r12_shape_connects_would_be":${nTables.toLong * pollCycles}}}""")
    spark.stop()
  }
}
