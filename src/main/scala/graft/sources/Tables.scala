package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Load one table. `events.ts` is stored as parquet TIMESTAMP(NANOS),
    * which Spark does not model; we read it as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to Spark's
    * microsecond TimestampType — the same truncation DuckDB's
    * `CAST(ts AS TIMESTAMP)` performs, keeping both engines bit-identical. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Sessions we build (Verify/Bench/specs) set this at construction;
      // this guarded set is a safety net for externally-built sessions
      // (e.g. the driver's smoke check) and is a no-op on ours — parquet
      // has no per-read option for it (SQLConf-only, schema-converter level).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
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
