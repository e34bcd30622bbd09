package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.ops.{CleanOps, Dedup, TextOps}
import graft.queries.CleaningQueries
import graft.sources.Tables

/** Stage isolation for the ~700% probe band (round-10 verdict #6):
  * q_pii_redact, q_dedup_minhash_portable, q_dedup_winnow_portable and
  * q_pipeline_assemble are all linear map-heavy scans whose 10× ratios sit
  * around 7×; this tool times their CUMULATIVE stages at two fixture scales
  * so the band's cost can be attributed (raw text scan vs regex count vs
  * replace chain vs hashing vs join) instead of guessed.
  *
  * Methodology matches ProbeQueries: min-of-reps, noop sink (materializes
  * every output column). `runMain graft.tools.ProbeBand <dirA> <dirB>
  * [reps]` prints one line per stage with the b/a ratio. */
object ProbeBand {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeBand <dirA> <dirB> [reps]")
    val (dirA, dirB) = (args(0), args(1))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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

    def aug(dir: String): DataFrame =
      Tables.documents(spark, dir).select(col("doc_id"),
        CleaningQueries.plantedPiiText(col("doc_id"), col("text")).as("aug"))
    def docs(dir: String): DataFrame = Tables.documents(spark, dir)
    def shingled(dir: String): DataFrame =
      docs(dir).select(col("doc_id").as("id"), TextOps.shingles(col("text"), 3).as("shs"))

    // cumulative stages, cheapest-first inside each query family
    val stages: Seq[(String, String => DataFrame)] = Seq(
      // shared baseline: what a bare projection of the corpus costs
      "scan/text_len" -> (dir => docs(dir).select(col("doc_id"), length(col("text")).as("len"))),
      // ---- q_pii_redact ----
      "pii/plant_aug" -> (dir => aug(dir)),
      "pii/plus_counts" -> (dir => aug(dir).select(col("doc_id"),
        CleanOps.piiCount(col("aug"), CleanOps.EmailRe).as("n_email"),
        CleanOps.piiCount(col("aug"), CleanOps.Ipv4Re).as("n_ip"),
        CleanOps.piiCount(col("aug"), CleanOps.PhoneRe).as("n_phone"))),
      "pii/plus_redact" -> (dir => aug(dir).select(col("doc_id"),
        CleanOps.redactPii(col("aug")).as("redacted"))),
      "pii/full_query" -> (dir => SparkEntry.queries("q_pii_redact")(spark, dir)),
      // ---- q_dedup_minhash_portable ----
      "mh/shingles" -> (dir => shingled(dir).select(col("id"), size(col("shs")).as("n"))),
      "mh/plus_sigs_md5" -> (dir => shingled(dir).filter(size(col("shs")) > 0)
        .select(col("id"), graft.functions.MinHash.sigsMd5(col("shs"), 32).as("sig"))),
      "mh/full_query" -> (dir => SparkEntry.queries("q_dedup_minhash_portable")(spark, dir)),
      // ---- q_dedup_winnow_portable ----
      "win/fingerprints" -> (dir =>
        Dedup.winnowFingerprintsPortable(docs(dir), "doc_id", "text", k = 16, w = 4)),
      "win/full_query" -> (dir => SparkEntry.queries("q_dedup_winnow_portable")(spark, dir)),
      // ---- q_pipeline_assemble ----
      "asm/fp_dedup" -> { dir =>
        val d = docs(dir)
        val keep = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
        d.join(keep, Seq("doc_id"), "left_semi").select(col("doc_id"), length(col("text")).as("len"))
      },
      "asm/plus_lang" -> { dir =>
        val d = docs(dir)
        def score(ws: Seq[String]) = TextOps.stopwordCount(col("text"), ws)
        d.withColumn("en_c", score(TextOps.StopwordsEn))
          .withColumn("de_c", score(TextOps.StopwordsDe))
          .withColumn("fr_c", score(TextOps.StopwordsFr))
          .withColumn("es_c", score(TextOps.StopwordsEs))
          .filter(col("en_c") >= col("de_c") && col("en_c") >= col("fr_c") &&
            col("en_c") >= col("es_c"))
          .select(col("doc_id"), col("en_c"))
      },
      "asm/plus_lang_fused" -> { dir =>
        // the graft_stopword_counts rewrite of plus_lang: one native pass
        val sc = TextOps.langScores(col("text"))
        docs(dir)
          .withColumn("en_c", sc.getItem(0)).withColumn("de_c", sc.getItem(1))
          .withColumn("fr_c", sc.getItem(2)).withColumn("es_c", sc.getItem(3))
          .filter(col("en_c") >= col("de_c") && col("en_c") >= col("fr_c") &&
            col("en_c") >= col("es_c"))
          .select(col("doc_id"), col("en_c"))
      },
      "asm/plus_quality" -> { dir =>
        val toks = TextOps.tokens(col("text"))
        val nToks = size(toks)
        docs(dir).select(col("doc_id"),
          (when(nToks.between(20, 2000), 1).otherwise(0) +
            when(size(array_distinct(toks)) * 4 >= nToks, 1).otherwise(0) +
            when(length(col("text")).between(100, 10000), 1).otherwise(0)).as("pts"),
          TextOps.wsTokenCount(col("text")).as("n_tok"))
      },
      "asm/full_query" -> (dir => SparkEntry.queries("q_pipeline_assemble")(spark, dir))
    )

    def time(build: => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    println(f"${"stage"}%-18s ${"a_sec"}%7s ${"b_sec"}%7s ratio_pct")
    stages.foreach { case (name, f) =>
      val a = time(f(dirA))
      val b = time(f(dirB))
      println(f"$name%-18s $a%7.2f $b%7.2f ${100.0 * b / a}%6.0f%%")
    }
    spark.stop()
  }
}
