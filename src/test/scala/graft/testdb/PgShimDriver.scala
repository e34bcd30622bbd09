package graft.testdb

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, Statement}
import java.util.Properties
import java.util.logging.Logger

/** TEST DOUBLE: a JDBC driver that answers `jdbc:postgresql://…` URLs with
  * an embedded Derby database behind a thin PG-surface shim — the
  * offline-sandbox stand-in for a second JDBC dialect (r11 verdict #5; no
  * H2/pg jar is resolvable with zero egress). It exists to drive the
  * repo's PostgreSQL-only branches end-to-end, which Derby alone never
  * exercises:
  *
  *   - Spark resolves `JdbcDialects.get` by URL, so every read/write/quote
  *     against this driver goes through Spark's REAL `PostgresDialect`
  *     (quoted lower-case identifiers, PG type mapping);
  *   - `ConnectionConfig` emits its PG property set — `currentSchema`,
  *     `SET search_path TO …` sessionInit, `connectTimeout`/`loginTimeout`
  *     in SECONDS — all consumed or recorded here;
  *   - LIMIT-style paging (`fetchFirst = false`, the PG default in
  *     `KeysetTail`/`keysetPage`) is translated to Derby's
  *     `FETCH FIRST n ROWS ONLY` at execute time, so the LIMIT branch of
  *     the page SQL is what actually runs.
  *
  * Translation is intentionally minimal (the shim is a dialect-surface
  * exerciser, not a PostgreSQL emulator): `SET search_path TO a[, b…]` →
  * `SET SCHEMA a`, and integer `LIMIT n` → `FETCH FIRST n ROWS ONLY`.
  */
final class PgShimDriver extends Driver {
  import PgShimDriver._

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    lastConnectTimeout = Option(info.getProperty("connectTimeout"))
    lastLoginTimeout = Option(info.getProperty("loginTimeout"))
    lastCurrentSchema = Option(info.getProperty("currentSchema"))
    // jdbc:postgresql://host[:port]/db  (or jdbc:postgresql:db)
    val tail = url.stripPrefix("jdbc:postgresql:")
    val db = tail.stripPrefix("//").split("/").last.takeWhile(_ != '?')
    require(db.nonEmpty, s"pg-shim: no database in $url")
    val derby = DriverManager.getConnection(s"jdbc:derby:memory:pgshim_$db;create=true")
    // pgjdbc applies currentSchema as the session's first search-path
    // entry; SET SCHEMA is Derby's equivalent
    lastCurrentSchema.map(_.split(",")(0).trim).filter(_.nonEmpty).foreach { s =>
      val st = derby.createStatement()
      try st.execute(s"SET SCHEMA $s") finally st.close()
    }
    wrapConnection(derby)
  }

  override def getMajorVersion: Int = 42
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

object PgShimDriver {
  /** Last connect's recorded PG-dialect properties — the spec's assertion
    * surface for the `timeout` → seconds mapping (`Config.scala`). */
  @volatile var lastConnectTimeout: Option[String] = None
  @volatile var lastLoginTimeout: Option[String] = None
  @volatile var lastCurrentSchema: Option[String] = None

  private lazy val registered: Unit =
    DriverManager.registerDriver(new PgShimDriver)
  /** Idempotent JVM-wide registration (local-mode executors share it). */
  def ensureRegistered(): Unit = registered

  private val SearchPath = "(?is)\\s*SET\\s+search_path\\s+TO\\s+(.+?)\\s*".r

  private[testdb] def translate(sql: String): String = sql match {
    case SearchPath(path) => s"SET SCHEMA ${path.split(",")(0).trim}"
    case _ => sql.replaceAll("(?i)\\bLIMIT\\s+(\\d+)\\b", "FETCH FIRST $1 ROWS ONLY")
  }

  private def reflective[T](iface: Class[T], target: AnyRef,
      intercept: PartialFunction[(String, Array[AnyRef]), AnyRef]): T = {
    val h = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
        val a = if (args == null) Array.empty[AnyRef] else args
        if (intercept.isDefinedAt((m.getName, a))) intercept((m.getName, a))
        else try m.invoke(target, args: _*)
        catch { case e: InvocationTargetException => throw e.getCause }
      }
    }
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), h).asInstanceOf[T]
  }

  /** Delegate everything to Derby; intercept the SQL-carrying calls and
    * translate. `prepareStatement`/`prepareCall` translate the SQL up
    * front (the returned statement needs no wrapping); plain `Statement`s
    * are wrapped so `execute*`/`addBatch` translate per call. */
  private def wrapConnection(derby: Connection): Connection =
    reflective(classOf[Connection], derby, {
      case ("nativeSQL", Array(sql: String)) => translate(sql)
      case (n, args) if n.startsWith("prepare") && args.nonEmpty &&
          args(0).isInstanceOf[String] =>
        val newArgs = args.clone()
        newArgs(0) = translate(args(0).asInstanceOf[String])
        val method = classOf[Connection].getMethods
          .find(mm => mm.getName == n && mm.getParameterCount == args.length &&
            mm.getParameterTypes()(0) == classOf[String]).get
        try method.invoke(derby, newArgs: _*)
        catch { case e: InvocationTargetException => throw e.getCause }
      case ("createStatement", args) =>
        val method = classOf[Connection].getMethods
          .find(mm => mm.getName == "createStatement" &&
            mm.getParameterCount == args.length).get
        val st = (try method.invoke(derby, args: _*)
          catch { case e: InvocationTargetException => throw e.getCause })
          .asInstanceOf[Statement]
        wrapStatement(st)
    })

  private def wrapStatement(st: Statement): Statement =
    reflective(classOf[Statement], st, {
      case (n, args) if Set("execute", "executeQuery", "executeUpdate",
          "executeLargeUpdate", "addBatch").contains(n) &&
          args.nonEmpty && args(0).isInstanceOf[String] =>
        val newArgs = args.clone()
        newArgs(0) = translate(args(0).asInstanceOf[String])
        val method = classOf[Statement].getMethods
          .find(mm => mm.getName == n && mm.getParameterCount == args.length &&
            mm.getParameterTypes()(0) == classOf[String]).get
        try method.invoke(st, newArgs: _*)
        catch { case e: InvocationTargetException => throw e.getCause }
    })
}
