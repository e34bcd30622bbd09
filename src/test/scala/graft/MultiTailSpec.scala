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
