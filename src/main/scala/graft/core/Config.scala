package graft.core

/** Engine configuration model, mirroring the reference's plugin config
  * surface (reference `in_sql.rb:43-66`, `out_sql.rb:22-56`) with eager
  * validation at construction (the reference validates in `#configure`).
  */

/** RDBMS connection settings shared by source and sink (`in_sql.rb:28-43`,
  * `out_sql.rb:14-27`): host/port/adapter/database/credentials plus the two
  * PostgreSQL-centric extras — `socket` (unix-domain socket path) and
  * `schema_search_path`. The Spark mapping: everything URL-expressible goes
  * into [[jdbcUrl]]; credentials and the search path ride [[properties]]
  * (pgjdbc's `currentSchema` IS the search path and applies to reads and
  * writes; `sessionInitStatement` covers Spark's read path on dialects
  * without such a property, e.g. `SET SCHEMA` on Derby — the embedded e2e
  * engine). Adapter names accept the reference's ActiveRecord spellings
  * (`mysql2`, `postgresql`). */
final case class ConnectionConfig(
    adapter: String,
    host: String = "localhost",
    port: Option[Int] = None,
    database: String = "",
    username: Option[String] = None,
    password: Option[String] = None,
    socket: Option[String] = None,            // in_sql.rb:38-39
    schemaSearchPath: Option[String] = None,  // in_sql.rb:40-41
    /** Connection-establishment timeout in MILLISECONDS (`out_sql.rb:34-35`,
      * reference default 5000 ms — applied by [[ConfigText.parseConnection]];
      * None here means "driver default" for programmatic construction). */
    timeoutMs: Option[Int] = None,
    /** Connection-pool size (`out_sql.rb:32-33`, default 5). The reference
      * can only WARN when writer threads outnumber the pool
      * (`out_sql.rb:179-181` — ActiveRecord then blocks on checkout); Spark
      * picks its own write parallelism, so the sink ENFORCES the bound
      * instead: routed writes coalesce to ≤ `pool` partitions ≙ concurrent
      * connections ([[graft.sinks.JdbcSink.capToPool]]). */
    pool: Int = 5
) {
  require(pool > 0, s"pool must be positive, got $pool (out_sql.rb:32-33)")
  /** ActiveRecord adapter name → JDBC subprotocol. */
  val subprotocol: String = adapter match {
    case "mysql2" | "mysql"        => "mysql"
    case "postgresql" | "postgres" => "postgresql"
    case other                     => other
  }

  /** First schema of the search path — the one unqualified DDL/DML writes
    * into (PostgreSQL semantics); used to qualify sink tables on dialects
    * where the write path can't carry a session property. */
  def primarySchema: Option[String] =
    schemaSearchPath.map(_.split(",")(0).trim).filter(_.nonEmpty)

  /** Per-dialect statement run after a session opens, the read-path twin
    * of the `currentSchema` property. */
  def sessionInitStatement: Option[String] = schemaSearchPath.flatMap { p =>
    subprotocol match {
      case "postgresql" => Some(s"SET search_path TO $p")
      case "derby"      => primarySchema.map(s => s"SET SCHEMA $s")
      case _            => None // dialects without schema search paths
    }
  }

  def jdbcUrl: String = subprotocol match {
    // embedded engines take a path, not host/port
    case "derby" | "sqlite" | "h2" => s"jdbc:$subprotocol:$database"
    case sp =>
      val portPart = port.map(p => s":$p").getOrElse("")
      val socketPart = socket.map { s =>
        sp match {
          // public driver syntaxes for unix-domain sockets
          case "mysql" | "mariadb" => s"?localSocket=$s"
          case _ => throw new IllegalArgumentException(
            s"socket is not URL-expressible for adapter $adapter — " +
              "use the driver's socket-factory properties instead")
        }
      }.getOrElse("")
      s"jdbc:$sp://$host$portPart/$database$socketPart"
  }

  /** JDBC properties for Spark's reader/writer AND raw DriverManager
    * connections: credentials, the pgjdbc `currentSchema` search path
    * (read+write), and `sessionInitStatement` (Spark read path). */
  def properties: java.util.Properties = {
    val p = new java.util.Properties()
    username.foreach(p.put("user", _))
    password.foreach(p.put("password", _))
    if (subprotocol == "postgresql")
      schemaSearchPath.foreach(p.put("currentSchema", _))
    sessionInitStatement.foreach(p.put("sessionInitStatement", _))
    // `timeout` (out_sql.rb:34-35) → the dialect's connect-timeout property.
    // pgjdbc takes SECONDS (connectTimeout/loginTimeout); MySQL Connector/J
    // takes MILLISECONDS (connectTimeout). Dialects without a documented
    // property (e.g. embedded Derby, which has no network connect phase)
    // get none — noted divergence rather than a guessed property name.
    timeoutMs.foreach { ms =>
      val secs = math.max(1, (ms + 999) / 1000).toString
      subprotocol match {
        case "postgresql" =>
          p.put("connectTimeout", secs); p.put("loginTimeout", secs)
        case "mysql" | "mariadb" =>
          p.put("connectTimeout", ms.toString)
        case _ => ()
      }
    }
    p
  }

  /** Qualify an unqualified table with the primary schema (no-op when the
    * name is already qualified or no search path is set). */
  def qualify(table: String): String =
    if (table.contains(".")) table
    else primarySchema.map(s => s"$s.$table").getOrElse(table)
}

/** One tailed source table (reference `<table>` section, `in_sql.rb:55-66`). */
final case class SourceTableConfig(
    table: String,
    tag: Option[String] = None,
    updateColumn: Option[String] = None,
    timeColumn: Option[String] = None,
    primaryKey: Option[String] = None,
    timeFormat: String = RubyStrftime.DefaultRubyFormat
) {
  /** README-documented behavior: tag defaults to the table name. (The
    * reference code leaves explicit-section tags nil — `in_sql.rb:58,71` —
    * but its README.md:93 documents table-name defaulting, which `all_tables`
    * discovery also applies, `in_sql.rb:224`. We implement the documented
    * behavior; divergence noted in SURVEY §2.1.) */
  def resolvedTag(tagPrefix: Option[String]): String =
    (tagPrefix.toSeq :+ tag.getOrElse(table)).mkString(".")
}

/** Input plugin config (`in_sql.rb:43-66`). */
final case class InputConfig(
    tables: Seq[SourceTableConfig],
    tagPrefix: Option[String] = None,
    selectIntervalSec: Long = 60,   // in_sql.rb:49-50
    selectLimit: Int = 500,         // in_sql.rb:51-52; <=0 disables the LIMIT
    stateFile: Option[String] = None,
    allTables: Boolean = false      // in_sql.rb:53-54
) {
  require(tables.nonEmpty || allTables, "at least one <table> or all_tables required")
}

/** One sink route (reference `<table pattern>` section, `out_sql.rb:44-56`). */
final case class SinkTableConfig(
    pattern: String,
    table: String,
    columnMapping: String
) {
  val compiledPattern: TagPattern = TagPattern(pattern)
  val mapping: ColumnMapping = ColumnMapping.parse(columnMapping)
}

/** Output plugin config (`out_sql.rb:22-56`). A pattern-less default table is
  * required (`out_sql.rb:183-185`); first matching pattern wins, top to
  * bottom (`out_sql.rb:226-237`). */
final case class OutputConfig(
    routes: Seq[SinkTableConfig],
    defaultTable: SinkTableConfig,
    removeTagPrefix: Option[String] = None,
    /** `enable_fallback` (`out_sql.rb:31`): true (default) degrades a
      * deterministic bulk failure to the row-wise path; false re-raises so
      * the buffer's retry mechanism owns the chunk (`out_sql.rb:107-113`). */
    enableFallback: Boolean = true
) {
  /** Anchored prefix strip, dual of the input's tag_prefix
    * (`out_sql.rb:160-162, 253-259`). */
  def stripPrefix(tag: String): String = removeTagPrefix match {
    case Some(p) if tag == p              => ""
    case Some(p) if tag.startsWith(p + ".") => tag.substring(p.length + 1)
    case _                                => tag
  }

  def routeFor(tag: String): SinkTableConfig =
    routes.collectFirst { case r if r.compiledPattern.matches(tag) => r }
      .getOrElse(defaultTable)
}

object SystemTables {
  /** Discovery skips framework system tables (`in_sql.rb:183, 217-219`). */
  private val SkipRe = "(?i)^schema_migrations$".r
  def isSystemTable(name: String): Boolean = SkipRe.matches(name)
}
