package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps

/** Stage isolation for q_bpe_merges (r13 verdict #4, the ProbeSubstr
  * discipline): bpeLearn is a round-0 tokenization plus, per merge round,
  * two actions (r14 shape — the kept table and its four rewrite joins were
  * replaced by one zero-shuffle window pass after this probe's first run
  * measured them at 3.0 s of the 4.45 s query: kept 0.75 + rewrite 2.28) —
  *
  *   1. tok0    — posexplode tokens + two lead() windows + staged()
  *                (one corpus shuffle by doc, window sort, localCheckpoint
  *                 of the full adjacency)
  *   2. argmax  — full groupBy(tok, nxt) count over the adjacency +
  *                TakeOrdered(1) collect (per round)
  *   3. rewrite — ONE lead/lag window pass over the staged adjacency
  *                (no exchange, no sort — LogicalRDD preserves the round-0
  *                hash(id) partitioning and (id, pos) ordering) + staged()
  *                of the FULL rewritten adjacency (per round). The round-2
  *                rewrite's executed plan is printed so the zero-exchange
  *                claim is checkable.
  *
  * Per-round actions are timed separately and summed across rounds.
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
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_BPE_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    var plansPrinted = false
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
          .stagedKeepLayout()
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
        // r14 shape: one zero-shuffle window pass per round (see
        // TrainOps.bpeLearn) — `kept` and its four joins are gone
        t("rewrite") += timed {
          val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val candC = col("tok") === a && col("nxt") === b
          val withP =
            if (a != b) adj.withColumn("is_p", candC)
            else adj
              .withColumn("cnd", candC)
              .withColumn("cum",
                sum(when(col("cnd"), 1L).otherwise(0L)).over(wRun))
              .withColumn("runcum",
                max(when(col("cnd") &&
                    !coalesce(lag(col("cnd"), 1).over(w), lit(false)),
                  col("cum"))).over(wRun))
              .withColumn("is_p",
                col("cnd") && (col("cum") - col("runcum")) % 2 === 0)
              .drop("cnd", "cum", "runcum")
          val next = withP
            .withColumn("is_q", coalesce(lag(col("is_p"), 1).over(w), lit(false)))
            .withColumn("nx_p", coalesce(lead(col("is_p"), 1).over(w), lit(false)))
            .withColumn("n2_p", coalesce(lead(col("is_p"), 2).over(w), lit(false)))
            .withColumn("tok2", lead(col("tok"), 2).over(w))
            .withColumn("pos2", lead(col("pos"), 2).over(w))
            .filter(!col("is_q"))
            .select(col("doc_id"), col("pos"),
              when(col("is_p"), lit(ab)).otherwise(col("tok")).as("tok"),
              when(col("is_p"),
                  when(col("n2_p"), lit(ab)).otherwise(col("tok2")))
                .when(col("nx_p"), lit(ab))
                .otherwise(col("nxt")).as("nxt"),
              when(col("is_p"), col("pos2"))
                .otherwise(col("nxt_pos")).as("nxt_pos"))
          if (r == 2 && !plansPrinted) {
            plansPrinted = true
            System.err.println("[bpe] round-2 rewrite plan:\n" +
              next.queryExecution.executedPlan.toString.take(6000))
          }
          adj = next.stagedKeepLayout()
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
    val keys = Seq("tok0", "argmax", "rewrite", "full_query")
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
