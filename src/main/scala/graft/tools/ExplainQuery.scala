package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch plan inspector: print the formatted physical plan of a named
  * declared query against a fixture dir (after one execution so AQE final
  * plans are visible). `runMain graft.tools.ExplainQuery <sfDir> <query>` */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ExplainQuery <sfDir> <query>")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(20000))
    spark.stop()
  }
}
