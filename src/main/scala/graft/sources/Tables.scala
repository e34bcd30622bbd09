package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

import graft.core.SystemTables

/** Parquet-backed table loading for the driver testdata, plus the catalog
  * discovery semantics the reference applies to a live database
  * (`all_tables`, `in_sql.rb:178-180, 214-230`).
  *
  * Scale notes: everything returns a lazy DataFrame straight off the parquet
  * scan — filters/projections composed on top reach the scan via Catalyst
  * (PushedFilters/ReadSchema), so the same code path works against a
  * 100 TB partitioned table as against the local testdata.
  */
object Tables {

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. `events.ts` has shipped under multiple physical
    * encodings across fixture generations (TIMESTAMP(NANOS), then
    * timestamp[us] without UTC adjustment); a real lake mixes encodings the
    * same way, so the loader branches on the schema it actually read instead
    * of hard-coding one:
    *
    *   - `LongType` — a TIMESTAMP(NANOS) fixture read under
    *     `spark.sql.legacy.parquet.nanosAsLong`; truncate ns→µs into
    *     TimestampType, the same truncation DuckDB's `CAST(ts AS TIMESTAMP)`
    *     performs.
    *   - `TimestampNTZType` — a timestamp[us] (isAdjustedToUTC=false)
    *     fixture; cast to TimestampType, a pure re-tag under the UTC session
    *     zone (wall clock preserved — identical to DuckDB's read).
    *   - `TimestampType` — already Spark's µs instant; pass through.
    *
    * Anything else is fixture drift and fails with one named error rather
    * than 25 scattered analysis exceptions downstream. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanosAsLong must be on BEFORE the footer is read or a NANOS fixture
      // throws at schema conversion; it is a no-op for µs fixtures. Sessions
      // we build set it at construction; this guarded set is a safety net for
      // externally-built sessions (e.g. the driver's smoke check) — parquet
      // has no per-read option for it (SQLConf-only, schema-converter level).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      adaptEventTs(raw, raw.schema("ts").dataType)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Normalize an events-shaped frame's `ts` to TimestampType (see
    * [[table]] for the encoding contract). Exposed so other events readers
    * (streaming provider inputs, specs) share one adaptive path. */
  def adaptEventTs(df: DataFrame, tsType: DataType): DataFrame = tsType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other => throw new IllegalStateException(
      s"fixture schema changed: events.ts is now ${other.simpleString} " +
        "(expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `all_tables` discovery over a directory of parquet tables, skipping
    * system tables (`in_sql.rb:214-230`). For a JDBC catalog the same
    * filter applies over `information_schema.tables`. */
  def discover(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .filterNot(SystemTables.isSystemTable)
      .sorted
      .toSeq
  }
}
