package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ConfigText

/** Config-text parity: a fluent-plugin-sql deployment's config (shapes per
  * the reference README's input/output examples) parses into our model. */
class ConfigTextSpec extends AnyFunSuite {

  private val inputConf = """
    |<source>
    |  @type sql
    |  host db.local
    |  database my_db
    |  tag_prefix my.rdb
    |  select_interval 75s
    |  select_limit 800
    |  state_file /var/run/fluentd/sql_state
    |  <table>
    |    table logs_a
    |    tag logs
    |    update_column updated_at
    |    time_column updated_at
    |  </table>
    |  <table>
    |    table views
    |    update_column id
    |    primary_key view_id
    |  </table>
    |</source>""".stripMargin

  test("input config: tables, tag prefix, interval units, state file") {
    val cfg = ConfigText.parseInput(inputConf)
    assert(cfg.tagPrefix === Some("my.rdb"))
    assert(cfg.selectIntervalSec === 75)
    assert(cfg.selectLimit === 800)
    assert(cfg.stateFile === Some("/var/run/fluentd/sql_state"))
    assert(cfg.tables.map(_.table) === Seq("logs_a", "views"))
    val t0 = cfg.tables.head
    assert(t0.tag === Some("logs") && t0.updateColumn === Some("updated_at")
      && t0.timeColumn === Some("updated_at"))
    val t1 = cfg.tables(1)
    assert(t1.tag === None && t1.primaryKey === Some("view_id"))
    // README-documented tag defaulting: table name when unset
    assert(t1.resolvedTag(cfg.tagPrefix) === "my.rdb.views")
  }

  test("all_tables flag (bare key = true)") {
    val cfg = ConfigText.parseInput("<source>\n  all_tables\n  <table>\n  table t\n  </table>\n</source>")
    assert(cfg.allTables)
  }

  private val outputConf = """
    |<match my.rdb.*>
    |  @type sql
    |  remove_tag_prefix my.rdb
    |  <table>
    |    table logs_default
    |    column_mapping timestamp:created_at,id,message
    |  </table>
    |  <table logs.money>
    |    table logs_money
    |    column_mapping timestamp:created_at,amount
    |  </table>
    |  <table logs.{click,view}>
    |    table logs_traffic
    |    column_mapping timestamp:created_at,id
    |  </table>
    |</match>""".stripMargin

  test("output config: default table, ordered patterned routes, prefix strip") {
    val cfg = ConfigText.parseOutput(outputConf)
    assert(cfg.defaultTable.table === "logs_default")
    assert(cfg.routes.map(_.table) === Seq("logs_money", "logs_traffic"))
    assert(cfg.removeTagPrefix === Some("my.rdb"))
    assert(cfg.stripPrefix("my.rdb.logs.click") === "logs.click")
    assert(cfg.routeFor("logs.money").table === "logs_money")
    assert(cfg.routeFor("logs.view").table === "logs_traffic")
    assert(cfg.routeFor("logs.other").table === "logs_default")
    assert(cfg.defaultTable.mapping.pairs ===
      Seq(("timestamp", "created_at"), ("id", "id"), ("message", "message")))
  }

  test("enable_fallback parses with :bool semantics (out_sql.rb:31)") {
    assert(ConfigText.parseOutput(outputConf).enableFallback) // absent -> true
    val off = outputConf.replace("@type sql", "@type sql\n  enable_fallback false")
    assert(!ConfigText.parseOutput(off).enableFallback)
    val on = outputConf.replace("@type sql", "@type sql\n  enable_fallback true")
    assert(ConfigText.parseOutput(on).enableFallback)
  }

  test("duplicate pattern-less <table>s: the LAST wins (out_sql.rb:171-173)") {
    // the reference warns on each duplicate but reassigns @default_table
    // every time, so the final pattern-less section receives the route
    val cfg = ConfigText.parseOutput("""
      |<match x>
      |  <table>
      |    table first_default
      |    column_mapping a
      |  </table>
      |  <table>
      |    table second_default
      |    column_mapping b
      |  </table>
      |</match>""".stripMargin)
    assert(cfg.defaultTable.table === "second_default")
    assert(cfg.routeFor("anything.unmatched").table === "second_default")
  }

  test("connection timeout plumbs to the dialect's connect-timeout property (out_sql.rb:34-35)") {
    def conn(adapter: String, extra: String = "") = ConfigText.parseOutputConnection(
      s"<match x>\n  adapter $adapter\n  database d\n$extra</match>")
    // reference default 5000 ms when unset
    assert(conn("postgresql").timeoutMs === Some(5000))
    val pg = conn("postgresql", "  timeout 12500\n").properties
    assert(pg.getProperty("connectTimeout") === "13") // ceil(12500 ms / 1000)
    assert(pg.getProperty("loginTimeout") === "13")
    val my = conn("mysql2", "  timeout 12500\n").properties
    assert(my.getProperty("connectTimeout") === "12500") // Connector/J takes ms
    // dialects without a documented property get none (embedded Derby)
    assert(conn("derby").properties.getProperty("connectTimeout") === null)
  }

  test("pool parses with the reference default and bounds write parallelism (out_sql.rb:32-33, 179-181)") {
    def conn(extra: String = "") = ConfigText.parseOutputConnection(
      s"<match x>\n  adapter postgresql\n  database d\n$extra</match>")
    assert(conn().pool === 5) // reference default
    assert(conn("  pool 2\n").pool === 2)
    intercept[IllegalArgumentException](conn("  pool 0\n"))
    // the sink ENFORCES the bound the reference could only warn about:
    // a 16-partition batch writes through <= pool concurrent connections
    val df = SparkSpecBase.session.range(0, 160).repartition(16)
    assert(graft.sinks.JdbcSink.capToPool(df.toDF(), 2).rdd.getNumPartitions === 2)
    // never INCREASES parallelism (coalesce semantics)
    assert(graft.sinks.JdbcSink.capToPool(df.toDF(), 64).rdd.getNumPartitions === 16)
  }

  test("missing default table is a config error (out_sql.rb:183-185)") {
    intercept[IllegalArgumentException] {
      ConfigText.parseOutput(
        "<match x>\n  <table p>\n  table t\n  column_mapping a\n  </table>\n</match>")
    }
  }

  test("connection params: socket + schema_search_path (in_sql.rb:28-43, out_sql.rb:14-27)") {
    val cc = ConfigText.parseInputConnection("""
      |<source>
      |  @type sql
      |  host db.example.com
      |  port 5432
      |  adapter postgresql
      |  database corpus
      |  username fluent
      |  password secret
      |  schema_search_path ingest,public
      |  <table>
      |    table logs
      |  </table>
      |</source>""".stripMargin)
    assert(cc.jdbcUrl === "jdbc:postgresql://db.example.com:5432/corpus")
    // pgjdbc's currentSchema IS the search path (reads and writes)...
    assert(cc.properties.getProperty("currentSchema") === "ingest,public")
    // ...and the read path also gets the explicit statement
    assert(cc.properties.getProperty("sessionInitStatement")
      === "SET search_path TO ingest,public")
    assert(cc.primarySchema === Some("ingest"))
    assert(cc.qualify("logs") === "ingest.logs")
    assert(cc.qualify("other.logs") === "other.logs") // already qualified
    assert(cc.properties.getProperty("user") === "fluent")

    // ActiveRecord adapter aliases + the mysql unix-socket URL form
    val my = graft.core.ConnectionConfig(adapter = "mysql2", database = "d",
      socket = Some("/var/run/mysqld/mysqld.sock"))
    assert(my.jdbcUrl === "jdbc:mysql://localhost/d?localSocket=/var/run/mysqld/mysqld.sock")
    // adapters without a public URL socket syntax must fail loudly
    intercept[IllegalArgumentException] {
      graft.core.ConnectionConfig(adapter = "postgresql", database = "d",
        socket = Some("/tmp/.s.PGSQL.5432")).jdbcUrl
    }
    // <match> side parses the same fields (out_sql.rb:14-27)
    val out = ConfigText.parseOutputConnection("""
      |<match **>
      |  @type sql
      |  host h
      |  adapter postgresql
      |  database d
      |  schema_search_path audit
      |  <table>
      |    table t
      |    column_mapping id:id
      |  </table>
      |</match>""".stripMargin)
    assert(out.qualify("t") === "audit.t")
  }

  test("duration units parse like the reference's :time type") {
    assert(ConfigText.parseSeconds("500") === 500)
    assert(ConfigText.parseSeconds("75s") === 75)
    assert(ConfigText.parseSeconds("2m") === 120)
    assert(ConfigText.parseSeconds("1h") === 3600)
  }
}
