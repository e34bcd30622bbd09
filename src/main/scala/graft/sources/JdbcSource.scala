package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import scala.collection.mutable
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SystemTables

/** JDBC input shell — the reference's ActiveRecord connection + reflection
  * surface (`in_sql.rb:188-230`) on Spark's JDBC source.
  *
  * The keyset page is pushed down INSIDE the dbtable subquery so the
  * database (with its index on the update column, `README.md:100-102`)
  * does the WHERE/ORDER/LIMIT — Spark never scans the full table.
  */
object JdbcSource {

  /** `SELECT * FROM t WHERE upd > ? ORDER BY upd ASC LIMIT n` pushed into
    * the remote DB (`in_sql.rb:129-135`). `fetchFirstSyntax` covers
    * LIMIT-less dialects (Derby/Oracle/DB2: FETCH FIRST n ROWS ONLY). */
  /** A serialized keyset resume value as a SQL literal. Numeric values go
    * unquoted (strict engines like Derby refuse BIGINT > CHAR); everything
    * else stays a quoted string and round-trips through the DB's cast,
    * exactly like the reference's serialized resume (`in_sql.rb:131, 141`).
    * The ONE literal form used by the page query and the streaming
    * sub-range readers, so boundary semantics can never diverge. */
  def sqlLiteral(v: String): String =
    if (v.matches("-?\\d+(\\.\\d+)?")) v else "'" + v.replace("'", "''") + "'"

  def keysetPage(spark: SparkSession, url: String, table: String, updateColumn: String,
                 last: Option[String], limit: Int, props: Properties = new Properties(),
                 fetchFirstSyntax: Boolean = false): DataFrame = {
    val where = last.map(v => s"WHERE $updateColumn > ${sqlLiteral(v)}").getOrElse("")
    // ORDER BY only when a LIMIT defines the page through it: an unbounded
    // page (`limit <= 0` disables the LIMIT, in_sql.rb:52) is the whole
    // remaining range, and its aggregation/sub-range consumers don't need
    // order — leaving the ORDER BY in would make unindexed databases sort
    // the full remainder per poll for nothing (planners are NOT guaranteed
    // to elide a subquery ORDER BY).
    val sub =
      if (limit <= 0) s"(SELECT * FROM $table $where) page"
      else {
        val limitClause =
          if (fetchFirstSyntax) s"FETCH FIRST $limit ROWS ONLY" else s"LIMIT $limit"
        s"(SELECT * FROM $table $where ORDER BY $updateColumn ASC $limitClause) page"
      }
    spark.read.jdbc(url, sub, props)
  }

  /** `all_tables` discovery via JDBC catalog metadata, skipping system
    * tables (`in_sql.rb:214-230`, skip `in_sql.rb:183`). Catalog listing is
    * schema-wide by default; a `schema_search_path` (carried as
    * `sessionInitStatement` in props and applied by [[connect]]) narrows
    * discovery to the session's current schema, matching the reference's
    * PostgreSQL behavior where `connection.tables` sees the search path. */
  def discoverTables(url: String, props: Properties = new Properties()): Seq[String] =
    Using.resource(connect(url, props)) { conn =>
      val schema = Option(conn.getSchema).filter(_ => hasSessionInit(props)).orNull
      val rs = conn.getMetaData.getTables(null, schema, "%", Array("TABLE"))
      val out = mutable.ListBuffer.empty[String]
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.filterNot(t => SystemTables.isSystemTable(t)).sorted.toSeq
    }

  /** PK introspection for update-column defaulting: composite PK is a hard
    * error, `primary_key` overrides for PK-less views (`in_sql.rb:107-114`). */
  def primaryKey(url: String, table: String,
                 props: Properties = new Properties()): Option[String] =
    Using.resource(connect(url, props)) { conn =>
      val schema = Option(conn.getSchema).filter(_ => hasSessionInit(props)).orNull
      val rs = conn.getMetaData.getPrimaryKeys(null, schema, table)
      val pks = mutable.ListBuffer.empty[String]
      while (rs.next()) pks += rs.getString("COLUMN_NAME")
      if (pks.size > 1)
        throw new IllegalStateException(
          s"composite primary key detected for $table: ${pks.mkString(",")} — set primary_key explicitly")
      pks.headOption
    }

  /** Is `column` the LEADING column of some index on `table`? The keyset
    * page (`WHERE upd > ? ORDER BY upd LIMIT n`) is an index range scan
    * exactly when such an index exists — the reference's documented
    * prerequisite (`README.md:100-102`); without it every poll is a
    * full-table sort in the database. None when the catalog cannot answer
    * (views, subqueries, permission-restricted metadata). */
  def hasIndexOn(url: String, table: String, column: String,
                 props: Properties = new Properties()): Option[Boolean] =
    scala.util.Try(Using.resource(connect(url, props)) { conn =>
      val schema = Option(conn.getSchema).filter(_ => hasSessionInit(props)).orNull
      val rs = conn.getMetaData.getIndexInfo(null, schema, table, false, true)
      var found = false
      while (rs.next() && !found) {
        found = rs.getShort("ORDINAL_POSITION") == 1 &&
          Option(rs.getString("COLUMN_NAME")).exists(_.equalsIgnoreCase(column))
      }
      found
    }).toOption

  private def hasSessionInit(props: Properties): Boolean =
    props.getProperty("sessionInitStatement") != null

  /** Raw connection honoring the Spark-style `sessionInitStatement`
    * property — Spark's JDBC reader runs it after opening a session; the
    * metadata/sink paths open their own connections, so the same statement
    * (e.g. `SET search_path TO ...` / `SET SCHEMA ...` from
    * `ConnectionConfig.schemaSearchPath`) is applied here too. */
  /** Diagnostic counter: connections opened through [[connect]] in this
    * JVM. Read by ProbeMultiTail to show the pooled driver connection's
    * per-trigger overhead drop (r12 verdict #2); costs one atomic add. */
  private[graft] val connectCount = new java.util.concurrent.atomic.AtomicLong()

  private[graft] def connect(url: String, props: Properties): Connection = {
    connectCount.incrementAndGet()
    val conn = DriverManager.getConnection(url, props)
    Option(props.getProperty("sessionInitStatement")).foreach { stmt =>
      Using.resource(conn.createStatement())(_.execute(stmt))
    }
    conn
  }
}
