package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Batch `.explain("formatted")` capture for the r14 plan deliverables:
  * writes `<outDir>/<query>_<suffix>.txt` for each named declared query
  * (initial formatted plan + the executed plan after one noop-sink run so
  * AQE's final shape is visible too).
  *
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query> [...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        s"== explain(formatted) ==\n$formatted\n\n== executed plan (post-AQE) ==\n${executed.take(40000)}\n")
      System.err.println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
