package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming-tier scale probe (round-9 verdict #5): replay the same
  * workload through the stateful StreamOps paths at TWO fixture scales as
  * a 10-micro-batch feed, recording per-batch wall time and the state
  * store's row/byte footprint after every batch (from
  * `StreamingQueryProgress.stateOperators`). Emits one JSON file shaped
  * like tools.Probes' output so the round PROBES artifact can absorb it:
  * total_a/total_b are summed batch walls, ratio_pct = 100·b/a.
  *
  * Paths probed: [[StreamOps.minhashNearDupStream]] (bounded keyed bucket
  * state), [[StreamOps.clusterDeltaStream]] + [[StreamOps.ClusterMaintainer]]
  * (keyed state + foreachBatch incremental CC), and
  * [[StreamOps.asofEnrichStream]] (bounded per-key version buffers).
  *
  * `runMain graft.tools.ProbeStreams <dirA> <dirB> <outFile>` */
object ProbeStreams {

  final case class Run(batchSec: Seq[Double], stateRows: Long,
                       stateBytes: Long, outRows: Long) {
    def total: Double = batchSec.sum
    def json: String = {
      val b = batchSec.map(s => f"$s%.3f").mkString("[", ",", "]")
      s"""{"batch_sec": $b, "total_sec": ${f"$total%.3f"}, """ +
        s""""state_rows": $stateRows, "state_bytes": $stateBytes, "out_rows": $outRows}"""
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, outFile) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    spark.range(1000000).selectExpr("sum(id)").collect()

    val Batches = 10

    def replay[T](feed: MemoryStream[T], data: Seq[Seq[T]],
                  q: org.apache.spark.sql.streaming.StreamingQuery): Run = {
      val walls = data.map { chunk =>
        val t0 = System.nanoTime()
        feed.addData(chunk)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      Run(walls, st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum, -1)
    }

    def chunked[T](xs: Seq[T]): Seq[Seq[T]] = {
      val size = math.max(1, (xs.length + Batches - 1) / Batches)
      xs.grouped(size).toSeq.padTo(Batches, Seq.empty[T])
    }

    def minhash(sfDir: String, name: String): Run = {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val ms = MemoryStream[(Long, String)]
      val q = StreamOps.minhashNearDupStream(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val run = try replay(ms, chunked(docs), q) finally q.stop()
      run.copy(outRows = spark.table(name).count())
    }

    def cluster(sfDir: String, name: String): Run = {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val ms = MemoryStream[(Long, String)]
      val maintainer = new StreamOps.ClusterMaintainer(
        Seq.empty[(Long, Long)].toDF("id", "label"))
      val q = StreamOps.clusterDeltaStream(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.ClusterDelta], _: Long) =>
          maintainer.absorb(b.toDF()); ()
        }
        .outputMode("append").start()
      val run = try replay(ms, chunked(docs), q) finally q.stop()
      run.copy(outRows = maintainer.labels.count())
    }

    def asof(sfDir: String, name: String): Run = {
      // facts = the events table keyed by user_id; dims = 4 payload
      // versions per user spread across the ts range, arriving interleaved
      // with the facts (the replay/backfill shape)
      val events = graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          unix_micros(col("ts")).as("t"))
        .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
      val (tMin, tMax) = (events.map(_._3).min, events.map(_._3).max)
      val users = events.map(_._2).distinct
      val dims = users.flatMap(u => (0 until 4).map(v =>
        (u, tMin + (tMax - tMin) * v / 4, u * 10 + v))).sortBy(_._2)
      val msE = MemoryStream[(Long, Long, Long)]
      val msD = MemoryStream[(Long, Long, Long)]
      val q = StreamOps.asofEnrichStream(
          msE.toDF().select(col("_1").as("event_id"), col("_2").as("user_id"),
            timestamp_micros(col("_3")).as("ts")),
          msD.toDF().select(col("_1").as("k"), timestamp_micros(col("_2")).as("ts"),
            col("_3").as("payload")))
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      val dimChunks = chunked(dims)
      val factChunks = chunked(events)
      val walls = try {
        (0 until Batches).map { i =>
          val t0 = System.nanoTime()
          msD.addData(dimChunks(i))
          msE.addData(factChunks(i))
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      Run(walls, st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum,
        spark.table(name).count())
    }

    def section(label: String, f: (String, String) => Run): String = {
      val a = f(dirA, s"pa_$label")
      val b = f(dirB, s"pb_$label")
      val ratio = if (a.total > 0) math.round(100.0 * b.total / a.total) else -1
      println(f"PROBE $label%-18s a=${a.total}%8.2f s b=${b.total}%8.2f s " +
        f"ratio=$ratio%5d%% stateRowsB=${b.stateRows} stateBytesB=${b.stateBytes}")
      s""""$label": {"a": ${a.json}, "b": ${b.json}, "ratio_pct": $ratio}"""
    }

    val sections = Seq(
      section("minhash_neardup_stream", minhash),
      section("cluster_delta_stream", cluster),
      section("asof_enrich_stream", asof))
    val out =
      s"""{
         |"dir_a": "$dirA", "dir_b": "$dirB", "batches": $Batches,
         |"queries": {
         |${sections.mkString(",\n")}
         |}}""".stripMargin
    Files.write(Paths.get(outFile), out.getBytes(StandardCharsets.UTF_8))
    println(out)
    spark.stop()
  }
}
