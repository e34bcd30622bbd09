package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch stretch-probe runner (not part of the driver contract): time
  * named declared queries against an arbitrary fixture directory — the
  * BASELINE.md sf1x scale probes. `runMain graft.tools.ProbeQueries
  * <sfDir> <reps> <query> [<query> ...]`; prints min-of-reps per query
  * (min, not median: the probe asks for the contention-free shape). */
object ProbeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeQueries <sfDir> <reps> <query>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    // core count via SPARK_GRAFT_CPUS (default 32) so probes can measure
    // the same query at several widths — the r15 core-sweep deliverable
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm
    // SPARK_GRAFT_CLEAR=1: clear the PlanCache and the widen memo before
    // every rep so min-of-reps prices the FIRST-RUN build cost instead of
    // finding the previous rep's cached intermediates (the r13 discipline;
    // also the r14-verdict #8 A/B lever — run the probe both ways).
    val clearPerRep = sys.env.get("SPARK_GRAFT_CLEAR").contains("1")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        if (clearPerRep) {
          graft.ops.Dedup.clearCaches()
          graft.sources.Tables.clearWidenMemo()
        }
        val t0 = System.nanoTime()
        // noop sink materializes every output column (Bench methodology)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // median alongside min: cross-JVM probe mins drift ±0.4 s on this
      // host, so an A/B on mins alone can invert — the median of >=5 reps
      // is the decision number, the min stays for contention-free shape
      val med = times.sorted.apply((times.size - 1) / 2)
      println(f"PROBE $n%-28s min=${times.min}%7.2f s  med=$med%7.2f s  reps=$reps" +
        (if (clearPerRep) " clear=1" else ""))
    }
    spark.stop()
  }
}
