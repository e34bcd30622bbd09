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

    val docs = Tables.documents(spark, sfDir)
    val n = 3; val threshold = 0.5

    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); df.count() }

    val arrays = docs.select(col("doc_id").as("id"), TextOps.shingles(col("text"), n).as("shs"))
    val sh = arrays.select(col("id"), size(col("shs")).cast("long").as("n_sh"), explode(col("shs")).as("s"))

    time("docs scan")(noop(docs))
    time("shingle arrays")(noop(arrays))
    time("exploded shingles")(noop(sh))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    time("freq")(noop(freq))
    val ranked = sh.join(freq, "s")
      .withColumn("pos", row_number().over(Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)))
    time("ranked (join+window)")(noop(ranked))
    val prefixLen = col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1
    val prefix = ranked.filter(col("pos") <= prefixLen).select("id", "s")
    time("prefix")(noop(prefix))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("candidates")(noop(candidates))
    val verified = candidates
      .join(sh.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("s")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("s").as("s2")), Seq("id_b"))
      .filter(col("s") === col("s2"))
      .groupBy("id_a", "id_b", "n_a", "n_b").agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard", round(col("n_inter").cast("double")
        / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
    time("verify (end-to-end)")(noop(verified))

    spark.stop()
  }
}
