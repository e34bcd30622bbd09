package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps

/** Stage isolation for q_dedup_substring (r12 verdict #4 discipline,
  * updated in r14 for the fused shape): the op is now a THREE-stage
  * pipeline —
  *
  *   1. gram_dup — one-pass rolling gram hashes, posexplode, (id,p)
  *                 packed into one long, ONE exchange by hash + window
  *                 min/max doc-id → duplicated positions (this fused the
  *                 old duph count_distinct aggregate + duppos semi-join,
  *                 which shuffled the corpus-sized mark table twice and
  *                 ran the gram kernel twice)
  *   2. islands  — per-doc gaps-and-islands window + range aggregate over
  *                 CANDIDATE rows only
  *   3. rebuild  — join ranges back onto the docs, substring
  *                 reconstruction
  *
  * Each stage's input is staged (lineage cut) so its time is ITS OWN cost,
  * not its prefix's. Run at the sf1xd vs sf10 decorrelation fixtures to see
  * which stage carries the decade ratio.
  *
  * `runMain graft.tools.ProbeSubstr <dirA> <dirB> [reps] [gram]`
  * prints one JSON line; recorded in PROBES_r13 (old shape) / r14.
  */
object ProbeSubstr {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeSubstr <dirA> <dirB> [reps] [gram] [mode: all|stages|fulls]")
    val dirA = args(0)
    val dirB = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val gram = args.lift(3).map(_.toInt).getOrElse(64)
    // `fulls` skips the stage-isolation phase (its staged raw-row blocks
    // starve execution memory at sf10); `stages` skips the end-to-end runs
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
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val t = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val n = scala.collection.mutable.LinkedHashMap.empty[String, Long]

      if (mode != "fulls") {
      var dupPos: DataFrame = null
      t("gram_dup") = timed {
        val base = docs.select(col("doc_id"), col("text").as("t"),
          length(col("text")).as("len"))
        val packed = base.filter(col("len") >= gram)
          .select(col("doc_id").as("id"),
            posexplode(graft.functions.GramHashes.hashes(col("t"), gram)))
          .select((col("id") * lit(1L << 32) + col("pos")).as("ip"),
            col("col").as("h"))
        val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
        dupPos = packed
          .withColumn("mn", min(col("ip")).over(wh))
          .withColumn("mx", max(col("ip")).over(wh))
          .filter(shiftright(col("mn"), 32) =!= shiftright(col("mx"), 32))
          .select(shiftright(col("ip"), 32).as("doc_id"),
            (col("ip") % lit(1L << 32)).as("p"))
          .staged()
        n("gram_dup") = dupPos.count()
      }
      var perDoc: DataFrame = null
      t("islands") = timed {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("p"))
        val prevMaxEnd = max(col("p") + gram).over(w.rowsBetween(Long.MinValue, -1))
        perDoc = dupPos
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
      // release the stage-isolation blocks before the end-to-end variant
      dupPos = null; perDoc = null
      (1 to 3).foreach { _ => System.gc(); Thread.sleep(2000) }
      } // mode != fulls

      if (mode != "stages") {
      // whole declared query for the end-to-end anchor
      t("full_query") = timed {
        graft.SparkEntry.queries("q_dedup_substring")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.clearCaches() // don't leak caches into the next dir
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
    val keys = Seq("gram_dup", "islands", "rebuild", "full_query")
      .filter(ta.contains)
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
