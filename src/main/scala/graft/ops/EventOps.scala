package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{OutputConfig, RubyStrftime, TagPattern}

/** The event-pipeline projections: serialization/coercion, event-time
  * normalization, tag assignment/routing, and tag/time injection. All are
  * pure `DataFrame → DataFrame` column projections — fully codegen'd,
  * collapsible into the scan by Catalyst, shuffle-free.
  */
object EventOps {

  /** Row serialization (reference `in_sql.rb:87-96`): msgpack-native values
    * (ints, floats, strings, booleans, arrays, maps, null) pass through
    * natively; `Time` values format with the table's strftime pattern
    * (default µs precision + numeric zone, `in_sql.rb:62, 91-92`); everything
    * else stringifies (`to_s`, `in_sql.rb:93-94`) — decimals, dates, UUIDs.
    */
  def serializeRecord(df: DataFrame,
                      rubyTimeFormat: String = RubyStrftime.DefaultRubyFormat): DataFrame = {
    val pat = RubyStrftime.toSparkPattern(rubyTimeFormat)
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          date_format(col(f.name), pat).as(f.name)
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | BooleanType | _: ArrayType |
             _: MapType | NullType =>
          col(f.name) // msgpack-native → pass through
        case _ =>
          col(f.name).cast(StringType).as(f.name) // to_s catch-all
      }
    }: _*)
  }

  /** Event-time extraction + normalization (reference `in_sql.rb:117-126,
    * 143-148`): a parseable time_column value becomes the event time;
    * NULL or unparseable values fall back (reference: "now"; here the
    * fallback Column is explicit — pass a fixed literal for deterministic
    * verification, `current_timestamp()` for production parity). */
  def normalizeEventTime(df: DataFrame, timeColumn: String, fallback: Column,
                         parsePattern: Option[String] = None,
                         as: String = "event_time"): DataFrame = {
    val parsed = df.schema(timeColumn).dataType match {
      case TimestampType => col(timeColumn)
      case _ => parsePattern match {
        case Some(p) => try_to_timestamp(col(timeColumn), lit(p))
        case None    => try_to_timestamp(col(timeColumn))
      }
    }
    df.withColumn(as, coalesce(parsed, fallback))
  }

  /** Tag assignment (reference `in_sql.rb:69-71`): `tag_prefix.table_tag`. */
  def assignTag(df: DataFrame, tagPrefix: Option[String], tableTag: String): DataFrame =
    df.withColumn("tag", lit((tagPrefix.toSeq :+ tableTag).mkString(".")))

  /** Tag-prefix strip (reference `out_sql.rb:160-162, 253-259`): anchored
    * removal of `remove_tag_prefix` plus its separating dot. */
  def stripTagPrefix(tagCol: Column, prefix: String): Column = {
    val quoted = java.util.regex.Pattern.quote(prefix)
    regexp_replace(tagCol, s"^(?:$quoted\\.|$quoted$$)", "")
  }

  /** First-match-wins tag routing (reference `out_sql.rb:226-237`): an
    * ordered `when` chain over compiled patterns with the required default
    * table as `otherwise` (`out_sql.rb:183-185, 235`). Codegen'd regex
    * matches — no per-row Scala. */
  def routeColumn(tagCol: Column, routes: Seq[(TagPattern, String)], default: String): Column =
    routes.foldRight(lit(default): Column) { case ((p, table), acc) =>
      when(tagCol.rlike(p.regexString), lit(table)).otherwise(acc)
    }

  /** Route and write each chunk to its table (batch shape of the reference's
    * per-chunk flush). Returns per-table DataFrames, pruned through each
    * route's column mapping. */
  def routedTables(df: DataFrame, cfg: OutputConfig): Map[String, DataFrame] = {
    val stripped = df.withColumn("tag",
      cfg.removeTagPrefix.map(p => stripTagPrefix(col("tag"), p)).getOrElse(col("tag")))
    val all = cfg.routes :+ cfg.defaultTable
    val routed = stripped.withColumn("__route",
      routeColumn(col("tag"), cfg.routes.map(r => (r.compiledPattern, r.table)), cfg.defaultTable.table))
    all.groupBy(_.table).map { case (tableName, rs) =>
      val sub = routed.filter(col("__route") === tableName).drop("__route")
      tableName -> rs.head.mapping(sub)
    }
  }

  /** Inject tag/time into the record before mapping (Fluentd `inject`,
    * reference `out_sql.rb:10, 96, 156`). */
  def injectTagTime(df: DataFrame, tagCol: Column, timeCol: Column): DataFrame =
    df.withColumn("tag", tagCol).withColumn("timestamp", timeCol)
}
