package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned parquet output for pipeline landing zones.
  *
  * Hive-style `partitionBy` directories are what make downstream reads
  * cheap at 100 TB: a day/event-type predicate prunes to the matching
  * directories before any file is opened (PartitionFilters in the scan),
  * and each partition's files are sorted on the sort keys so min/max
  * row-group statistics prune within files too.
  *
  * `maxRecordsPerFile` bounds file size without an extra shuffle;
  * `repartition(partitionCols)` before the write keeps one task per
  * output partition instead of every task writing every partition
  * (the small-files problem).
  */
object ParquetSink {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       maxRecordsPerFile: Long = 5000000L): Unit = {
    val arranged = df.repartition(partitionCols.map(col): _*)
    val sorted =
      if (sortCols.isEmpty) arranged
      else arranged.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    sorted.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
