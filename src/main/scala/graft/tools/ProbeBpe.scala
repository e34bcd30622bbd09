package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps

/** Stage isolation for q_bpe_merges (r13 verdict #4, the ProbeSubstr
  * discipline): bpeLearn is a round-0 tokenization plus, per merge round,
  * three actions —
  *
  *   1. tok0    — posexplode tokens + two lead() windows + staged()
  *                (one corpus shuffle by doc, window sort, localCheckpoint
  *                 of the full adjacency)
  *   2. argmax  — full groupBy(tok, nxt) count over the adjacency +
  *                TakeOrdered(1) collect (per round)
  *   3. kept    — candidate filter + islands windows + staged() of the
  *                tiny kept set (per round)
  *   4. rewrite — adj ⋈ marks/qSet/prevSet (broadcast) + project +
  *                staged() of the FULL rewritten adjacency (per round)
  *
  * The per-round actions are timed separately and summed across rounds, so
  * the table answers "which stage carries the per-round cost": the argmax
  * aggregation (corpus-sized hash agg on two strings), or the rewrite's
  * full-adjacency localCheckpoint rewrite.
  *
  * `runMain graft.tools.ProbeBpe <dir> [reps] [rounds]` — prints one JSON
  * line (min-of-reps per stage); recorded in PROBES_r14/OPTIMIZATION_r14.
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeBpe <dir> [reps] [rounds]")
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val rounds = args.lift(2).map(_.toInt).getOrElse(6)
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

    def onePass(): Map[String, Double] = {
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val t = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        .withDefaultValue(0.0)
      var adj: DataFrame = null
      t("tok0") = timed {
        adj = docs
          .select(col("doc_id"), posexplode(graft.ops.TextOps.tokens(col("text")))
            .as(Seq("pos", "tok")))
          .withColumn("nxt", lead(col("tok"), 1).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .withColumn("nxt_pos", lead(col("pos"), 1).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .staged()
      }
      for (r <- 1 to rounds) {
        var best: Array[org.apache.spark.sql.Row] = null
        t("argmax") += timed {
          best = adj.filter(col("nxt").isNotNull)
            .groupBy(col("tok"), col("nxt"))
            .agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("tok").asc, col("nxt").asc)
            .limit(1).collect()
        }
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        val ab = a + b
        var kept: DataFrame = null
        t("kept") += timed {
          val cand = adj.filter(col("tok") === a && col("nxt") === b)
          val cw = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          kept = cand
            .withColumn("brk",
              when(lag(col("nxt_pos"), 1).over(cw) === col("pos"), 0).otherwise(1))
            .withColumn("isl", sum(col("brk")).over(
              cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("rn", row_number().over(
              Window.partitionBy(col("doc_id"), col("isl")).orderBy(col("pos"))))
            .filter(col("rn") % 2 === 1)
            .select(col("doc_id"), col("pos").as("p"), col("nxt_pos").as("q"))
            .staged()
        }
        t("rewrite") += timed {
          val qInfo = adj
            .join(kept.select(col("doc_id"), col("p"), col("q").as("pos")),
              Seq("doc_id", "pos"))
            .select(col("doc_id"), col("p"), col("nxt").as("q_nxt"),
              col("nxt_pos").as("q_nxt_pos"))
          val marks = qInfo
            .join(kept.select(col("doc_id"), col("p").as("q_nxt_pos"),
                lit(1).as("r_kept")),
              Seq("doc_id", "q_nxt_pos"), "left_outer")
            .select(col("doc_id"), col("p").as("pos"),
              when(col("r_kept").isNotNull, lit(ab)).otherwise(col("q_nxt"))
                .as("new_nxt"),
              col("q_nxt_pos").as("new_nxt_pos"))
          val qSet = kept.select(col("doc_id"), col("q").as("pos"), lit(1).as("is_q"))
          val prevSet = kept.select(col("doc_id"), col("p").as("nxt_pos"),
            lit(1).as("nxt_merged"))
          adj = adj
            .join(marks.withColumn("is_p", lit(1)), Seq("doc_id", "pos"), "left_outer")
            .join(qSet, Seq("doc_id", "pos"), "left_outer")
            .join(prevSet, Seq("doc_id", "nxt_pos"), "left_outer")
            .filter(col("is_q").isNull)
            .select(col("doc_id"), col("pos"),
              when(col("is_p").isNotNull, lit(ab)).otherwise(col("tok")).as("tok"),
              when(col("is_p").isNotNull, col("new_nxt"))
                .when(col("nxt_merged").isNotNull, lit(ab))
                .otherwise(col("nxt")).as("nxt"),
              when(col("is_p").isNotNull, col("new_nxt_pos"))
                .otherwise(col("nxt_pos")).as("nxt_pos"))
            .staged()
        }
      }
      // end-to-end anchor: the declared query through the noop sink
      t("full_query") = timed {
        graft.SparkEntry.queries("q_bpe_merges")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t.toMap
    }

    val runs = (1 to reps).map(_ => onePass())
    val keys = Seq("tok0", "argmax", "kept", "rewrite", "full_query")
    val rows = keys.map { k =>
      val v = runs.map(_(k)).min
      System.err.println(f"[bpe] $k%-10s ${v}%7.2f s (min of $reps)")
      f""""$k": ${v}%.3f"""
    }
    println(s"""{"metric":"bpe_stage_split","dir":"$dir","reps":$reps,""" +
      s""""rounds":$rounds,"stages":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
