package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps

/** Stage isolation for q_dedup_substring's 870%/decade ratio (r12 verdict
  * #4, the ProbePipeline discipline): the op is a five-stage pipeline —
  *
  *   1. gram    — one-pass rolling gram hashes, posexplode to (id, p, h)
  *   2. duph    — groupBy(h) count_distinct(id) > 1 (the all-positions
  *                shuffle: by far the largest exchange of the op)
  *   3. duppos  — grams LEFT SEMI dupHashes (second shuffle of the mark
  *                table)
  *   4. islands — per-doc gaps-and-islands window + range aggregate over
  *                CANDIDATE rows only
  *   5. rebuild — join ranges back onto the docs, substring reconstruction
  *
  * Each stage's input is staged (lineage cut) so its time is ITS OWN cost,
  * not its prefix's. Run at the sf1xd vs sf10 decorrelation fixtures to see
  * which stage carries the decade ratio.
  *
  * `runMain graft.tools.ProbeSubstr <dirA> <dirB> [reps] [gram]`
  * prints one JSON line; recorded in PROBES_r13/BASELINE.md.
  */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeSubstr <dirA> <dirB> [reps] [gram] [mode: all|stages|fulls]")
    val dirA = args(0)
    val dirB = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val gram = args.lift(3).map(_.toInt).getOrElse(64)
    // `fulls` skips the stage-isolation phase: its staged (lineage-cut)
    // tables hold raw-row blocks that starve execution memory at sf10 and
    // make the end-to-end variants flaky in the same JVM — the
    // cache-vs-recompute comparison doesn't need them
    val mode = args.lift(4).getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** One full stage-isolated pass; returns per-stage seconds + volumes. */
    def stages(dir: String): (Map[String, Double], Map[String, Long]) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val n = scala.collection.mutable.LinkedHashMap.empty[String, Long]

      var grams: DataFrame = null
      if (mode != "fulls") {
      t("gram") = timed {
        val base = docs.select(col("doc_id"), col("text").as("t"),
          length(col("text")).as("len"))
        grams = base.filter(col("len") >= gram)
          .select(col("doc_id"),
            posexplode(graft.functions.GramHashes.hashes(col("t"), gram)))
          .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("h"))
          .staged()
        n("gram") = grams.count()
      }
      var duph: DataFrame = null
      t("duph") = timed {
        duph = grams.groupBy("h")
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1).select("h")
          .staged()
        n("duph") = duph.count()
      }
      var duppos: DataFrame = null
      t("duppos") = timed {
        duppos = grams.join(duph, Seq("h"), "left_semi")
          .select(col("doc_id"), col("p"))
          .staged()
        n("duppos") = duppos.count()
      }
      var perDoc: DataFrame = null
      t("islands") = timed {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
        val prevMaxEnd = max(col("p") + gram).over(w.rowsBetween(Long.MinValue, -1))
        perDoc = duppos
          .withColumn("ni", when(prevMaxEnd.isNull || col("p") > prevMaxEnd, 1)
            .otherwise(0))
          .withColumn("island", sum(col("ni")).over(w.rowsBetween(Long.MinValue, 0)))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("p")).cast("long").as("s"),
            (max(col("p")) + gram).cast("long").as("e"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_ranges"),
            sum(col("e") - col("s")).cast("long").as("dup_chars"),
            array_sort(collect_list(struct(col("s"), col("e")))).as("rs"))
          .staged()
        n("islands") = perDoc.count()
      }
      t("rebuild") = timed {
        val base = docs.select(col("doc_id"), col("text").as("t"),
          length(col("text")).as("len"))
        val out = base
          .join(perDoc, Seq("doc_id"), "left_outer")
          .withColumn("acc", aggregate(
            coalesce(col("rs"), array().cast("array<struct<s:bigint,e:bigint>>")),
            struct(lit(0L).as("pos"), lit("").as("txt")),
            (acc, r) => struct(
              r.getField("e").as("pos"),
              concat(acc.getField("txt"),
                col("t").substr((acc.getField("pos") + 1).cast("int"),
                  (r.getField("s") - acc.getField("pos")).cast("int"))).as("txt"))))
          .select(col("doc_id"),
            coalesce(col("n_ranges"), lit(0L)).as("n_ranges"),
            coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
            concat(col("acc.txt"),
              col("t").substr((col("acc.pos") + 1).cast("int"),
                (col("len") - col("acc.pos")).cast("int"))).as("clean_text"))
        out.write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.clearCaches() // release this dir's cached mark table
      // release the stage-isolation blocks before the end-to-end variants:
      // localCheckpoint RDDs free via the ContextCleaner once unreferenced,
      // and keeping 250M+ staged rows alive squeezes the unified memory the
      // full runs need (measured as UNABLE_TO_ACQUIRE_MEMORY at sf10)
      grams = null; duph = null; duppos = null; perDoc = null
      (1 to 3).foreach { _ => System.gc(); Thread.sleep(2000) }
      } // mode != fulls

      if (mode != "stages") {
      // whole declared query for the end-to-end anchor
      t("full_query") = timed {
        graft.SparkEntry.queries("q_dedup_substring")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      // cache-vs-recompute: the real op persists the (id,p,h) mark table
      // because TWO consumers read it (dup-hash agg + position semi-join).
      // At sf10 that cache overflows the memory store and spills — this
      // variant skips the cache entirely (each consumer recomputes the
      // one-pass gram hash from the scan) to measure which side of the
      // trade the decade actually lands on.
      // drop the full_query's PlanCache entry (grams persisted inside the
      // op) so the no-cache variant isn't squeezed by it — and so dir B's
      // stage runs don't inherit dir A's cached mark table
      graft.ops.Dedup.clearCaches()
      t("full_nocache") = timed {
        val base = docs.select(col("doc_id"), col("text").as("t"),
          length(col("text")).as("len"))
        val g = base.filter(col("len") >= gram)
          .select(col("doc_id"),
            posexplode(graft.functions.GramHashes.hashes(col("t"), gram)))
          .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("h"))
        val dh = g.groupBy("h")
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1).select("h")
        val dp = g.join(dh, Seq("h"), "left_semi").select(col("doc_id"), col("p"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
        val prevMaxEnd = max(col("p") + gram).over(w.rowsBetween(Long.MinValue, -1))
        val pd = dp
          .withColumn("ni", when(prevMaxEnd.isNull || col("p") > prevMaxEnd, 1)
            .otherwise(0))
          .withColumn("island", sum(col("ni")).over(w.rowsBetween(Long.MinValue, 0)))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("p")).cast("long").as("s"),
            (max(col("p")) + gram).cast("long").as("e"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_ranges"),
            sum(col("e") - col("s")).cast("long").as("dup_chars"),
            array_sort(collect_list(struct(col("s"), col("e")))).as("rs"))
        base.join(pd, Seq("doc_id"), "left_outer")
          .withColumn("acc", aggregate(
            coalesce(col("rs"), array().cast("array<struct<s:bigint,e:bigint>>")),
            struct(lit(0L).as("pos"), lit("").as("txt")),
            (acc, r) => struct(
              r.getField("e").as("pos"),
              concat(acc.getField("txt"),
                col("t").substr((acc.getField("pos") + 1).cast("int"),
                  (r.getField("s") - acc.getField("pos")).cast("int"))).as("txt"))))
          .select(col("doc_id"),
            coalesce(col("n_ranges"), lit(0L)).as("n_ranges"),
            coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
            concat(col("acc.txt"),
              col("t").substr((col("acc.pos") + 1).cast("int"),
                (col("len") - col("acc.pos")).cast("int"))).as("clean_text"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.clearCaches() // don't leak this dir's cache into the next
      } // mode != stages
      (t.toMap, n.toMap)
    }

    def minOf(dir: String): (Map[String, Double], Map[String, Long]) = {
      val runs = (1 to reps).map(_ => stages(dir))
      val keys = runs.head._1.keys
      (keys.map(k => k -> runs.map(_._1(k)).min).toMap, runs.last._2)
    }

    val (ta, na) = minOf(dirA)
    val (tb, nb) = minOf(dirB)
    val keys = Seq("gram", "duph", "duppos", "islands", "rebuild",
      "full_query", "full_nocache").filter(ta.contains)
    val rows = keys.map { k =>
      val ratio = math.round(100.0 * tb(k) / ta(k))
      System.err.println(f"[substr] $k%-10s a=${ta(k)}%7.2f s  b=${tb(k)}%7.2f s  ratio=${ratio}%4d%%")
      f""""$k": {"a_sec": ${ta(k)}%.3f, "b_sec": ${tb(k)}%.3f, "ratio_pct": $ratio, """ +
        s""""a_rows": ${na.getOrElse(k, -1L)}, "b_rows": ${nb.getOrElse(k, -1L)}}"""
    }
    println(s"""{"metric":"substr_stage_decade","dir_a":"$dirA","dir_b":"$dirB",""" +
      s""""reps":$reps,"gram":$gram,"stages":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
