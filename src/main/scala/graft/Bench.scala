package graft

import org.apache.spark.sql.SparkSession

/** Perf surface for the round driver: times every declared query at the
  * SPARK_GRAFT_SF_DIR scale and prints ONE short JSON line on stdout.
  *
  * The driver keeps only the LAST 2000 chars of output (incl. sbt's
  * "[success]" suffix) and parses the JSON line out of that window. Round 4
  * shipped the full 97-query map on that line and overflowed it — the
  * headline total came back unparseable. The stdout line now carries only
  * the headline fields plus the 5 slowest queries (bounded ~400 chars at
  * any query count); the full per-query medians and raw samples go to
  * `bench_detail.json` in the working directory and to stderr.
  *
  * Shared-VM noise: single-run timings at sf0.1 spiked 3–10× on unchanged
  * sub-second queries (round-4 q_time_normalize 0.70→7.25 s). Each query is
  * therefore run SPARK_GRAFT_REPS times (default 3) and the reported number
  * is the per-query MEDIAN — the cold first pass and any one-off GC/CPU
  * spike fall out of a median of 3. ANY rep that is both the maximum and
  * > 1.5× the median of the other samples is treated as a host-window
  * outlier: one extra rep runs and, if it succeeds, the median is taken
  * with the outlier dropped (marked `outlier_dropped` in
  * bench_detail.json); if the extra rep fails, the plain median of all
  * original samples is reported (never a median over fewer samples than
  * were measured) — heavy-tier medians then track plans, not host windows.
  * (Round 9 only caught a poisoned FIRST rep; q_bpe_merges
  * [11.7, 6.09, 16.4] sailed through and doubled the headline heavy.)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail FIRST with one named "fixture schema changed" error on testdata
    // drift the loaders can't absorb — not N× per-query rep failures
    graft.sources.Preflight.check(spark, sfDir)
    // warm the session (executor threads, codegen compiler, parquet footer
    // reader, regex/codegen paths of the big tables) so the first timed
    // query doesn't pay one-time JVM costs. Warm-up failure must not kill
    // the run — broken tables then fail per-query, visibly, below.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      graft.sources.Tables.table(spark, sfDir, "region").count()
      graft.sources.Tables.documents(spark, sfDir)
        .selectExpr("sum(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))").collect()
      graft.sources.Tables.embeddings(spark, sfDir)
        .selectExpr("sum(size(embedding))").collect()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] warm-up failed (continuing): ${e.getMessage}")
    }
    // a failed query must be visible, never a near-zero "speedup": its time
    // is recorded as -1 and the error surfaces in an "errors" JSON field.
    // Per-query failure COUNTS are kept so the JSON distinguishes a flaky
    // rep (median of the surviving samples still reported) from a query
    // that failed every rep — without the count, a one-rep failure would
    // read as both "clean total" and "n_errors > 0" at once.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, (Int, String)]
    // local iteration aid: SPARK_GRAFT_ONLY=q_a,q_b times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    for (name <- selected.keys) samples(name) = Vector.empty
    for (r <- 1 to reps; (name, fn) <- selected) {
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Catalyst prune the projections away and undercount the work)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) :+= sec
        System.err.println(f"[bench] rep $r $name $sec%.3f s")
      } catch { case e: Throwable =>
        // strip EVERY control char plus quote/backslash — RFC 8259 requires
        // them escaped, and one \f from a JDBC driver would break the line
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(200)
        errors(name) = (errors.get(name).map(_._1).getOrElse(0) + 1, msg)
      }
    }
    def median(v: Vector[Double]): Double =
      if (v.isEmpty) -1.0 else v.sorted.apply((v.size - 1) / 2)
    // De-noise pass (round-8 verdict #7, widened round 10): a contention-
    // poisoned rep (cold page cache, fresh codegen, host window) skews a
    // median-of-3 upward even though the other reps sit at steady state —
    // r8 q_dedup_clusters_incr [19.97, 3.37, 3.12] and r9 q_bpe_merges
    // [11.7, 6.09, 16.4] both tracked the host, not the plan. For any
    // query where ONE sample is both the maximum and > 1.5x the median of
    // the OTHER samples, run ONE extra rep; if it succeeds, drop the
    // outlier and report the median of the rest + the extra rep. If the
    // extra rep FAILS, report the plain median of all original samples —
    // dropping the outlier without a replacement would bias a median-of-3
    // DOWN to the lower of two samples, exactly on the spiky queries this
    // pass targets. Bounded cost (extra reps only for spiky queries), all
    // raw samples stay in bench_detail.json with an "outlier_dropped"
    // marker carrying the dropped rep's 0-based index.
    val outlierDropped = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    if (reps >= 3) {
      for ((name, fn) <- selected) {
        val v = samples(name)
        if (v.size >= 3 && !errors.contains(name)) {
          val iMax = v.indexOf(v.max)
          val others = v.patch(iMax, Nil, 1)
          if (v(iMax) > 1.5 * median(others)) {
            try {
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val sec = (System.nanoTime() - t0) / 1e9
              samples(name) :+= sec
              outlierDropped(name) = iMax
              System.err.println(
                f"[bench] extra rep (outlier drop rep ${iMax + 1}) $name $sec%.3f s")
            } catch { case scala.util.control.NonFatal(_) => () } // plain median of originals
          }
        }
      }
    }
    val results = samples.map { case (n, v) =>
      n -> median(outlierDropped.get(n).map(i => v.patch(i, Nil, 1)).getOrElse(v)) }
    def fmt(v: Double): String = f"$v%.2f"
    val total = results.values.filter(_ >= 0).sum
    val sfNum = "sf([0-9.]+)/?$".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    // full detail → file (judge-readable, committed by the driver) + stderr
    val detail = results.map { case (k, v) =>
      val raw = samples(k).map(fmt).mkString("[", ",", "]")
      val warm = outlierDropped.get(k).map(i => s""","outlier_dropped":$i""").getOrElse("")
      s"""\"$k\":{"median":${fmt(v)},"samples":$raw$warm}"""
    }.mkString("{", ",", "}")
    val errsJson =
      if (errors.isEmpty) "{}"
      else errors.map { case (k, (n, m)) =>
        s"""\"$k\":\"$n/$reps reps failed: $m\"""" }.mkString("{", ",", "}")
    val detailLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"queries":$detail,"errors":$errsJson,"sf":$sfNum}"""
    val detailFile = "bench_detail.json"
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailFile), detailLine)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    System.err.println(s"[bench] detail: $detailLine")
    // stdout line: headline + 5 slowest (bounded size at any query count)
    val worst = results.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"reps":$reps,"queries":$worst,"queries_file":"$detailFile","n_errors":${errors.size},"sf":$sfNum}"""
    println(line)
    spark.stop()
  }
}
