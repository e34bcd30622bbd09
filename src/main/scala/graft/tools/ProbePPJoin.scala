package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch stage-isolate for the PPJoin pair generation
  * ([[graft.ops.Dedup.ngramJaccardPairsPrefix]]): per-stage wall time and
  * row counts (prefix rows, index rows, raw candidate join rows, distinct
  * pairs, verified pairs) so optimization targets the measured bottleneck
  * instead of the suspected one. Replicates the op inline (its stages are
  * private by design). `runMain graft.tools.ProbePPJoin <sfDir>` */
object ProbePPJoin {
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
    val p = 1L; val q = 2L // threshold 0.5
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
    val prefixLen = col("n_sh") - expr(s"(n_sh * $p + ${q - 1}) div $q") + 1
    val indexLen = col("n_sh") -
      expr(s"(n_sh * 2 * $p + ${q + p - 1}) div ${q + p}") + 1
    val sketches = arrays.select(col("id"),
      graft.functions.HashRangeHist.hist(col("hs")).as("ct"))
    val prefix = ranked.filter(col("pos") <= prefixLen)
      .select("id", "n_sh", "pos", "h").withColumn("idx_len", indexLen)
      .join(sketches, "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("prefix")(println(s"  prefixRows=${prefix.count()}"))
    val index = prefix.filter(col("pos") <= col("idx_len"))
    timed("indexCount")(println(s"  indexRows=${index.count()}"))

    def joinCondNoHist = (col("a.h") === col("b.h") &&
      (col("a.n_sh") > col("b.n_sh") ||
        (col("a.n_sh") === col("b.n_sh") && col("a.id") > col("b.id"))) &&
      col("a.n_sh") * p <= col("b.n_sh") * q &&
      ((lit(1L) + least(col("a.n_sh") - col("a.pos"), col("b.n_sh") - col("b.pos")))
        * (q + p) >= (col("a.n_sh") + col("b.n_sh")) * p))
    def joinCond = (joinCondNoHist &&
      graft.functions.HistMinSum.minSum(col("a.ct"), col("b.ct")) * (q + p) >=
        (col("a.n_sh") + col("b.n_sh")) * p - (q + p))

    // raw candidate join rows (post-filter, pre-distinct)
    timed("candJoinRows") {
      val c = prefix.as("a").join(index.as("b"), joinCond).count()
      println(s"  candRows=$c")
    }
    timed("candNoHist") {
      val c = prefix.as("a").join(index.as("b"), joinCondNoHist).count()
      println(s"  candRowsNoHist=$c")
    }
    // candidate rows WITHOUT the positional filter (measures its cut)
    timed("candNoPositional") {
      val c = prefix.as("a").join(index.as("b"),
        col("a.h") === col("b.h") &&
          (col("a.n_sh") > col("b.n_sh") ||
            (col("a.n_sh") === col("b.n_sh") && col("a.id") > col("b.id"))) &&
          col("a.n_sh") * p <= col("b.n_sh") * q).count()
      println(s"  candRowsNoPos=$c")
    }
    val candidates = timed("distinct") {
      val d = prefix.as("a").join(index.as("b"), joinCond)
        .select(col("a.id").as("u"), col("b.id").as("v")).distinct()
        .select(least(col("u"), col("v")).as("id_a"),
          greatest(col("u"), col("v")).as("id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  distinctPairs=${d.count()}")
      d
    }
    timed("verify") {
      val v = candidates
        .join(arrays.select(col("id").as("id_a"), col("hs").as("hs_a")).hint("SHUFFLE_HASH"), Seq("id_a"))
        .join(arrays.select(col("id").as("id_b"), col("hs").as("hs_b")).hint("SHUFFLE_HASH"), Seq("id_b"))
        .withColumn("n_inter",
          graft.functions.SortedIntersectCount.count(col("hs_a"), col("hs_b")))
        .withColumn("jaccard", round(col("n_inter").cast("double")
          / (size(col("hs_a")) + size(col("hs_b")) - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.5).count()
      println(s"  verified=$v")
    }
    // end-to-end as declared (fresh caches via the real op)
    timed("endToEnd") {
      graft.ops.Dedup.clearCaches()
      graft.ops.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
