package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.RubyStrftime

/** Row → serialized-string map, the reference's `serializable_hash` shape
  * (`in_sql.rb:87-96, 141`): the keyset resume value is taken from THIS
  * serialized form, so timestamps resume from their formatted string. */
object Serialize {

  def serializedCol(df: DataFrame, name: String,
                    rubyTimeFormat: String = RubyStrftime.DefaultRubyFormat): Column =
    df.schema(name).dataType match {
      case TimestampType | TimestampNTZType =>
        date_format(col(name), RubyStrftime.toSparkPattern(rubyTimeFormat))
      case _ => col(name).cast(StringType)
    }

  /** Zone used for driver-side timestamp rendering — must agree with the
    * Spark-side `date_format` path (which uses the session timezone), or
    * resume boundaries diverge between driver- and executor-serialized
    * values at page boundaries. */
  private def sessionZone: java.time.ZoneId =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(s => java.time.ZoneId.of(s.conf.get("spark.sql.session.timeZone")))
      .getOrElse(java.time.ZoneOffset.UTC)

  /** Serialize ONE external value (a collected scalar — an offset boundary,
    * a sub-range cut) to its resume-string form: the same rendering
    * [[rowToStringMap]] applies per field, so a boundary serialized from an
    * aggregate is byte-identical to one serialized from a collected row. */
  def valueToString(dt: DataType, v: Any,
                    rubyTimeFormat: String = RubyStrftime.DefaultRubyFormat): String =
    dt match {
      case TimestampType =>
        // Locale.US to match Spark's own DateTimeFormatter locale — month/
        // day NAMES must render identically on both serialization paths
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern(RubyStrftime.toSparkPattern(rubyTimeFormat), java.util.Locale.US)
          .withZone(sessionZone)
        v match {
          case t: java.sql.Timestamp  => fmt.format(t.toInstant)
          case i: java.time.Instant   => fmt.format(i)
          case other                  => fmt.format(java.time.Instant.parse(other.toString))
        }
      case _ => v.toString
    }

  /** Serialize every column of a local Row (already collected; bounded by
    * select_limit) to the string map persisted in the state store. */
  def rowToStringMap(schema: StructType, row: Row,
                     rubyTimeFormat: String = RubyStrftime.DefaultRubyFormat): Map[String, String] = {
    schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else Some(f.name -> valueToString(f.dataType, row.get(i), rubyTimeFormat))
    }.toMap
  }
}
