package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.sources.Tables

/** Scratch stage-profiler for heavy queries (not part of the driver
  * contract). Times materialization of intermediate stages at a given SF.
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); df.count() }

    if (args.contains("--stream")) {
      // streaming MinHash-LSH drain probe: the spec harness shape (memory
      // stream -> flatMapGroupsWithState -> memory sink) at bench scale,
      // production bucket cap, 10 micro-batches
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)].collect()
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      val stream = graft.streaming.StreamOps.minhashNearDupStream(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
      val q = stream.writeStream.format("memory").queryName("p_mh")
        .outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        docs.grouped(math.max(1, docs.length / 10)).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      println(f"PROFILE stream minhash drain       ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  docs=${docs.length} pairs=${spark.table("p_mh").count()}")
      spark.stop()
      return
    }

    // current target: the tight-geometry banded LSH near-dup stages
    import graft.ops.Similarity
    val corpus = graft.queries.ExtensionQueries.plantedCorpus(spark, sfDir)
    time("plantedCorpus")(noop(corpus))
    val base = Similarity.corpusBase(corpus)
    time("corpusBase (persist)")(noop(base))
    val sigs = Similarity.sigTable(corpus, rowsPerBand = 16, numBands = 8, dim = 64)
    time("sigTable (persist)")(noop(sigs))
    val banded = Similarity.bandedSigs(corpus, rowsPerBand = 16, numBands = 8, dim = 64)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
        col("a.id") < col("b.id") &&
        graft.functions.FirstEqIndex.firstEqIndex(col("a.sig"), col("b.sig"))
          === col("a.band"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("candidates")(noop(cand))
    time("full lshNearDupPairs")(noop(
      Similarity.lshNearDupPairs(corpus, threshold = 0.9, rowsPerBand = 16, numBands = 8)))
    if (args.contains("--exact"))
      time("exact nearDupPairs 0.9")(noop(Similarity.nearDupPairs(corpus, threshold = 0.9)))

    spark.stop()
  }
}
