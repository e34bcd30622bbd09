package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch result dumper (not part of the driver contract): run a named
  * declared query against an arbitrary fixture directory and print up to
  * `maxRows` result rows — the tool behind BASELINE.md's value-bearing
  * scale notes (e.g. measured dedup recall at sf0.1/sf1x, r11 verdict #7),
  * where the PROBE tools only record seconds.
  *
  * `runMain graft.tools.ShowQuery <sfDir> <query> [maxRows=20]` */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShowQuery <sfDir> <query> [maxRows]")
    val sfDir = args(0)
    val name = args(1)
    val maxRows = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.limit(maxRows + 1).collect()
    println(s"SHOWQUERY $name @ $sfDir cols=${df.columns.mkString(",")}")
    rows.take(maxRows).foreach(r => println(s"ROW ${r.toString}"))
    if (rows.length > maxRows) println(s"... (more than $maxRows rows)")
    spark.stop()
  }
}
