package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format ingestion for training-data pipelines beyond parquet: JSONL
  * and CSV with explicit schemas and corrupt-record dead-lettering — the
  * file-side analogue of the JDBC source's per-record fault isolation
  * (reference `out_sql.rb:117-123`: bad records are isolated and reported,
  * never silently dropped and never fatal to the batch).
  *
  * Scale notes: both readers are plain `spark.read` scans — splittable,
  * predicate/projection composable via Catalyst, and schema-explicit
  * (schema inference would scan the data twice and is banned here).
  * `PERMISSIVE` + `columnNameOfCorruptRecord` keeps malformed lines as rows
  * with the raw text in the corrupt column, so `split` can route them to a
  * dead-letter output instead of failing the job (FAILFAST) or silently
  * dropping them (DROPMALFORMED).
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  /** JSON-lines reader with explicit schema; malformed lines survive as
    * rows with the raw line in [[CorruptCol]]. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV reader (header, explicit schema), same corrupt-record contract. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("sep", delimiter)
      .csv(path)

  /** ORC reader/writer pair: the other splittable columnar format Spark
    * ships natively (predicate pushdown, column pruning, and min/max
    * row-group skipping all work as with parquet). ORC is binary and
    * self-describing, so there is no corrupt-record lane — schema is
    * still explicit to keep reads single-pass and layout-checked. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String,
               sortCols: Seq[String] = Nil): Unit = {
    val arranged =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    arranged.write.mode("overwrite").orc(path)
  }

  /** Split a permissive read into (clean rows without the corrupt column,
    * dead-letter rows carrying the raw record text). Mirrors the JDBC
    * sink's dead-letter contract: nothing is silently lost.
    *
    * The parsed read is cached: Spark refuses to answer queries that
    * reference ONLY the corrupt column against the raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the one
    * cached scan feeds both branches anyway. Caller owns unpersist. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
      cached.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("record_text")))
  }
}
