package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.sources.Tables

/** Op-level plan receipts for kernels whose consuming DECLARED queries
  * stage the tier eagerly (Materialize) — the declared-query dump then
  * shows only a LogicalRDD leaf, so before/after files at the query level
  * are non-probative (the r14-verdict caveat on iterative ops). This tool
  * dumps `.explain("formatted")` of the OP itself: the current (after)
  * shape, plus the pre-r15 relational formulation inlined verbatim as the
  * labeled "before" receipt (it is the same expression tree the old code
  * built — XxKernelParitySpec holds the living copy and asserts the two
  * shapes produce bit-identical values).
  *
  * `runMain graft.tools.DumpOpPlans <sfDir> <outDir>`
  */
object DumpOpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DumpOpPlans <sfDir> <outDir>")
    val sfDir = args(0)
    val outDir = args(1)
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
    def dump(name: String, df: DataFrame): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      System.err.println(s"[opplans] wrote $outDir/$name.txt")
    }
    val docs = Tables.documents(spark, sfDir)

    // ---- minhash (xx family): after = one-pass band kernel -------------
    dump("op_minhash_pairs_after",
      Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        n = 3, numPerm = 64, rowsPerBand = 2, threshold = 0.5))
    // before = the pre-r15 relational formulation (exploded shingles →
    // 64-buffer min aggregate → 32 band-hash folds), inlined verbatim
    val arrays = docs.select(col("doc_id").as("id"),
      graft.ops.TextOps.shingles(col("text"), 3).as("shs"))
    val sh = arrays.select(col("id"), explode(col("shs")).as("s"))
    val aggs = (0 until 64).map(p => min(xxhash64(lit(p), col("s"))).as(s"h$p"))
    val sigs = sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until 32).map { b =>
      val slice = (0 until 2).map(r => col(s"h${b * 2 + r}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("bh"))
    }
    dump("op_minhash_banded_before",
      sigs.select(col("id"), explode(array(bandCols: _*)).as("e"))
        .select(col("id"), col("e.band").as("band"), col("e.bh").as("bh")))

    // ---- simhash64 (xx family): after = one-pass packed kernel ---------
    dump("op_simhash64_after", Dedup.simhash64(docs, "doc_id", "text", n = 3))
    val shh = sh.withColumn("h", xxhash64(col("s")))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k")
    }
    val sums = shh.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { k =>
      when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    dump("op_simhash64_before", sums.select(col("id"), sim.as("simhash")))

    spark.stop()
  }
}
