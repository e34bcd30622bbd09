package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch stage-isolate for the containment pair generation
  * ([[graft.ops.Dedup.containmentPairs]]): per-stage wall time and row
  * counts (ranked rows, sub-prefix rows, raw candidate join rows with each
  * residual toggled, distinct pairs, verified pairs) so the round-10
  * positional filter's cut is measured, not guessed.
  * `runMain graft.tools.ProbeContainment <sfDir>` */
object ProbeContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val n = 3
    val p = 9L; val q = 10L // threshold 0.9
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val arrays = docs.select(col("doc_id").as("id"),
      sort_array(transform(graft.ops.TextOps.shingles(col("text"), n), s => xxhash64(s))).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("arrays")(println(s"  docs=${arrays.count()}"))

    val sh = arrays.select(col("id"),
      size(col("hs")).cast("long").as("n_sh"), explode(col("hs")).as("h"))
    val freq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val ranked = sh.join(freq, "h")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("h").asc)))
      .select("id", "n_sh", "pos", "h")
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("ranked")(println(s"  rankedRows=${ranked.count()}"))
    val prefixLen = col("n_sh") - expr(s"(n_sh * $p + ${q - 1}) div $q") + 1
    val sketches = arrays.select(col("id"),
      graft.functions.HashRangeHist.hist(col("hs")).as("ct"))
    val subPrefix = ranked.filter(col("pos") <= prefixLen)
      .select(col("id").as("id_sub"), col("n_sh").as("n_sub"),
        col("pos").as("pos_sub"), col("h"))
      .join(sketches.select(col("id").as("id_sub"), col("ct").as("ct_sub")), Seq("id_sub"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("subPrefix")(println(s"  subPrefixRows=${subPrefix.count()}"))
    val supSide = ranked
      .select(col("id").as("id_sup"), col("n_sh").as("n_sup"),
        col("pos").as("pos_sup"), col("h"))
      .join(sketches.select(col("id").as("id_sup"), col("ct").as("ct_sup")), Seq("id_sup"))

    def baseCond = col("id_sub") =!= col("id_sup") &&
      col("n_sub") * p <= col("n_sup") * q
    def posCond = (lit(1L) + least(col("n_sub") - col("pos_sub"),
      col("n_sup") - col("pos_sup"))) * q >= col("n_sub") * p - q
    def histCond = graft.functions.HistMinSum.minSum(col("ct_sub"), col("ct_sup")) * q >=
      col("n_sub") * p - q

    timed("candLenOnly") {
      println(s"  candRows=${subPrefix.join(supSide, Seq("h")).filter(baseCond).count()}")
    }
    timed("candLenHist") {
      println(s"  candRows=${subPrefix.join(supSide, Seq("h"))
        .filter(baseCond && histCond).count()}")
    }
    timed("candLenPos") {
      println(s"  candRows=${subPrefix.join(supSide, Seq("h"))
        .filter(baseCond && posCond).count()}")
    }
    timed("candAll") {
      println(s"  candRows=${subPrefix.join(supSide, Seq("h"))
        .filter(baseCond && posCond && histCond).count()}")
    }
    val candidates = timed("distinct") {
      val d = subPrefix.join(supSide, Seq("h"))
        .filter(baseCond && posCond && histCond)
        .select("id_sub", "id_sup").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  distinctPairs=${d.count()}")
      d
    }
    timed("verify") {
      val v = candidates
        .join(arrays.select(col("id").as("id_sub"), col("hs").as("hs_sub")).hint("SHUFFLE_HASH"), Seq("id_sub"))
        .join(arrays.select(col("id").as("id_sup"), col("hs").as("hs_sup")).hint("SHUFFLE_HASH"), Seq("id_sup"))
        .withColumn("n_inter",
          graft.functions.SortedIntersectCount.count(col("hs_sub"), col("hs_sup")))
        .withColumn("containment",
          round(col("n_inter").cast("double") / size(col("hs_sub")), 6))
        .filter(col("containment") >= 0.9).count()
      println(s"  verified=$v")
    }
    timed("endToEnd") {
      graft.ops.Dedup.clearCaches()
      graft.ops.Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
