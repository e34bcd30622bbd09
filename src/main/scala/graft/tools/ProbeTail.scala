package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Scale probe for the round-11 JDBC keyset-tail source: drain the events
  * table through `format("keyset-tail")` in JDBC mode at two fixture
  * scales with a FIXED page size, and record total wall, rows/s, and the
  * per-micro-batch trigger walls (flat batch walls = per-poll cost is
  * bounded by the page, not the table — the scale property the
  * constant-size driver state is supposed to buy).
  *
  * `runMain graft.tools.ProbeTail <dirA> <dirB> [pageSize]` — one JSON
  * line; recorded in BASELINE.md. */
object ProbeTail {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeTail <dirA> <dirB> [pageSize]")
    val (dirA, dirB) = (args(0), args(1))
    val page = args.lift(2).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(tag: String, dir: String): (Long, Double, Seq[Long]) = {
      val url = s"jdbc:derby:memory:graft_tail_$tag;create=true"
      // the reference REQUIRES an index on the update column
      // (README.md:100-102) — without it every keyset page is a full-table
      // sort (and Derby's sort spill chokes on the CLOBs Spark's dialect
      // maps strings to). Create the table in deployment shape: PK index,
      // VARCHAR not CLOB.
      locally {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          val s = c.createStatement()
          try s.execute("CREATE TABLE TAIL_SRC (event_id BIGINT NOT NULL PRIMARY KEY, " +
            "event_type VARCHAR(40), value DOUBLE)") finally s.close()
        } finally c.close()
      }
      Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("value"))
        .write.mode("append").jdbc(url, "TAIL_SRC", new java.util.Properties())
      val rows = spark.read.jdbc(url, "TAIL_SRC", new java.util.Properties()).count()
      var drained = 0L
      val t0 = System.nanoTime()
      val q = spark.readStream.format("keyset-tail")
        .option("url", url).option("dbtable", "TAIL_SRC")
        .option("updateColumn", "event_id")
        .option("maxRowsPerBatch", page.toString)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          drained += b.count()
        }
        .trigger(Trigger.ProcessingTime(0)).start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      require(drained == rows, s"$tag: drained $drained of $rows")
      val walls = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").longValue())
      (rows, sec, walls)
    }

    val (rowsA, secA, wallsA) = run("a", dirA)
    val (rowsB, secB, wallsB) = run("b", dirB)
    def wallStats(w: Seq[Long]) =
      s"""{"n":${w.size},"median_ms":${w.sorted.apply(w.size / 2)},"max_ms":${w.max}}"""
    println(s"""{"metric":"keyset_tail_jdbc_scale","page":$page,""" +
      s""""a":{"rows":$rowsA,"sec":${f"$secA%.2f"},"rows_per_sec":${(rowsA / secA).round},"batches":${wallStats(wallsA)}},""" +
      s""""b":{"rows":$rowsB,"sec":${f"$secB%.2f"},"rows_per_sec":${(rowsB / secB).round},"batches":${wallStats(wallsB)}},""" +
      s""""ratio_pct":${(100.0 * secB / secA).round}}""")
  }
}
