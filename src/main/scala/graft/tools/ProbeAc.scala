package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.CleanOps
import graft.sources.Tables

/** Evidence for the Aho–Corasick design claim: blocklist-screen cost is
  * (nearly) independent of dictionary size, where the column form —
  * |dict| independent `contains` scans — is linear in it. Dictionaries
  * are deterministic phrase sets built from corpus vocabulary so hits
  * stay plentiful at every size (C4's production list is ~400 phrases).
  * `runMain graft.tools.ProbeAc <sfDir> [reps]` */
object ProbeAc {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeAc <sfDir> [reps]")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val words = Seq("join", "hash", "row", "batch", "scan", "column",
      "customer", "filter", "small", "slow", "merge", "order", "vector",
      "line", "data", "table", "agg", "value", "key", "stream", "window",
      "spark", "group", "part", "big", "fast", "sort", "query", "the", "a")
    def dict(size: Int): Seq[String] = {
      // deterministic two-word phrases cycling the vocabulary; pad with
      // distinct three-word phrases past the bigram space
      val bi = for (a <- words; b <- words if a != b) yield s"$a $b"
      val tri = for (a <- words; b <- words) yield s"$a $b ${words((a.length + b.length) % words.size)}"
      (bi ++ tri).distinct.take(size)
    }
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n >= 0); (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sfDir).persist()
    docs.count() // warm the cache so every variant reads identical input

    for (size <- Seq(8, 64, 512, 2048)) {
      val pats = dict(size)
      val ac = (1 to reps).map(_ => time(
        CleanOps.blocklistScreen(docs, "doc_id", "text", pats)
          .filter(col("keep")).count())).min
      // the column form: |dict| contains() scans (the plan AC replaces);
      // capped at 64 — past that its own left-leaning Or chain
      // StackOverflows the analyzer, which is exactly the point
      val colForm =
        if (size > 64) Double.NaN
        else (1 to reps).map(_ => time(
          docs.filter(!pats.map(p => col("text").contains(p)).reduce(_ || _))
            .count())).min
      println(f"PROBE_AC size=$size%5d ac=$ac%6.2f s contains=$colForm%6.2f s")
    }
    spark.stop()
  }
}
