package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.core.ConnectionConfig
import graft.sinks.JdbcSink
import graft.sources.JdbcSource
import graft.testdb.PgShimDriver

/** Second-dialect JDBC e2e (r11 verdict #5): the PostgreSQL-only branches
  * — `currentSchema`/`SET search_path` session init, `timeout` mapped to
  * SECONDS, LIMIT-style paging, PostgresDialect quoted identifiers —
  * driven end-to-end through [[graft.testdb.PgShimDriver]] (Derby behind a
  * `jdbc:postgresql://` URL, so Spark resolves its real PostgresDialect).
  * Connect / page / upsert / tail matrix, mirroring JdbcSpec's Derby rows. */
class PgDialectSpec extends SparkSpecBase {
  PgShimDriver.ensureRegistered()

  private val cc = ConnectionConfig(adapter = "postgresql", host = "localhost",
    database = "pgdb", schemaSearchPath = Some("pgapp"), timeoutMs = Some(4200))
  private val url = cc.jdbcUrl

  private def execPlain(sql: String): Unit = {
    val c = DriverManager.getConnection(url) // no currentSchema: default schema
    try { val s = c.createStatement(); try s.execute(sql) finally s.close() }
    finally c.close()
  }

  // one-time schema + tables (the search path's target must exist first)
  private lazy val fixture: Unit = {
    assert(url === "jdbc:postgresql://localhost/pgdb") // the PG branch of jdbcUrl
    execPlain("CREATE SCHEMA pgapp")
    execPlain("CREATE TABLE pgapp.pgt (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    (1 to 30).foreach(i => execPlain(s"INSERT INTO pgapp.pgt VALUES ($i, 'v$i')"))
  }

  test("connect: currentSchema + SET search_path land in the schema; timeout arrives in SECONDS") {
    fixture
    val conn = JdbcSource.connect(url, cc.properties)
    try {
      // pgjdbc takes connect timeouts in seconds: 4200 ms must arrive as 5
      assert(PgShimDriver.lastConnectTimeout === Some("5"))
      assert(PgShimDriver.lastLoginTimeout === Some("5"))
      assert(PgShimDriver.lastCurrentSchema === Some("pgapp"))
      // UNQUALIFIED name resolves through the applied search path
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM pgt")
      assert(rs.next() && rs.getLong(1) === 30L)
    } finally conn.close()
  }

  test("page: keyset pages through the PG LIMIT branch (translated at the shim), strict > resume") {
    fixture
    val p1 = JdbcSource.keysetPage(spark, url, cc.qualify("pgt"), "id", None, 12,
      cc.properties, fetchFirstSyntax = false).collect()
    assert(p1.length === 12)
    val boundary = p1.map(_.getLong(0)).max
    val p2 = JdbcSource.keysetPage(spark, url, cc.qualify("pgt"), "id",
      Some(boundary.toString), 12, cc.properties, fetchFirstSyntax = false).collect()
    assert(p2.map(_.getLong(0)).min === boundary + 1) // strict >
    assert(p2.length === 12)
  }

  test("upsert: idempotent keyed upsert against the PG URL, replay is a no-op") {
    fixture
    execPlain("CREATE TABLE pgapp.ups_pg (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    import spark.implicits._
    val b = Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
    def snap() = spark.read.jdbc(url, cc.qualify("ups_pg"), cc.properties)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    JdbcSink.idempotentUpsert(b, url, cc.qualify("ups_pg"), Seq("id"))
    assert(snap() === Seq((1L, "a"), (2L, "b")))
    JdbcSink.idempotentUpsert(b, url, cc.qualify("ups_pg"), Seq("id"))
    assert(snap() === Seq((1L, "a"), (2L, "b")))
    JdbcSink.idempotentUpsert(
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), url, cc.qualify("ups_pg"), Seq("id"))
    assert(snap() === Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("tail: streaming keyset-tail over the PG URL — PostgresDialect quoting, LIMIT paging, resume") {
    fixture
    execPlain("CREATE TABLE pgapp.tail_pg (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
    (1 to 20).foreach(i => execPlain(s"INSERT INTO pgapp.tail_pg VALUES ($i, 't$i')"))
    val cp = java.nio.file.Files.createTempDirectory("graft_pg_cp").toString
    // foreachBatch sink: the memory sink refuses checkpoint recovery,
    // which the restart half of this test exercises
    def startQuery(sink: java.util.Queue[Long]) =
      spark.readStream.format("keyset-tail")
        .option("url", url).option("dbtable", cc.qualify("tail_pg"))
        .option("updateColumn", "id").option("maxRowsPerBatch", "7")
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => sink.add(r.getLong(0)))
        }
        .option("checkpointLocation", cp).start()
    val got1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q1 = startQuery(got1)
    try {
      q1.processAllAvailable()
      assert(got1.size === 20)
    } finally q1.stop()
    // new rows + restart from the same checkpoint: only the delta arrives
    (21 to 25).foreach(i => execPlain(s"INSERT INTO pgapp.tail_pg VALUES ($i, 't$i')"))
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = startQuery(got2)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got2.asScala.toSet === (21L to 25L).toSet)
    } finally q2.stop()
  }
}
