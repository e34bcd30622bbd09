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

  /** Serialize every column of a local Row (already collected; bounded by
    * select_limit) to the string map persisted in the state store. */
  def rowToStringMap(schema: StructType, row: Row,
                     rubyTimeFormat: String = RubyStrftime.DefaultRubyFormat): Map[String, String] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern(RubyStrftime.toSparkPattern(rubyTimeFormat))
      .withZone(sessionZone)
    schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else Some(f.name -> (f.dataType match {
        case TimestampType => fmt.format(row.getTimestamp(i).toInstant)
        case _ => row.get(i).toString
      }))
    }.toMap
  }
}
