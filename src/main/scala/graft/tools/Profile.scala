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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = arrays.select(col("id"), size(col("shs")).cast("long").as("n_sh"), explode(col("shs")).as("s"))

    time("arrays (cache load)")(noop(arrays))
    time("exploded from cache")(noop(sh))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    time("freq")(noop(freq))
    val ranked = sh.join(freq, "s")
      .withColumn("pos", row_number().over(Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)))
    time("ranked (join+window)")(noop(ranked))
    val prefixLen = col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1
    val prefix = ranked.filter(col("pos") <= prefixLen).select("id", "n_sh", "s")
    time("prefix")(noop(prefix))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("a.n_sh") * lit(threshold) <= col("b.n_sh") &&
        col("b.n_sh") * lit(threshold) <= col("a.n_sh"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("candidates")(noop(candidates))
    val verified = candidates
      .join(arrays.select(col("id").as("id_a"), col("shs").as("shs_a")), Seq("id_a"))
      .join(arrays.select(col("id").as("id_b"), col("shs").as("shs_b")), Seq("id_b"))
      .withColumn("n_inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard", round(col("n_inter").cast("double")
        / (size(col("shs_a")) + size(col("shs_b")) - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
    time("verify (end-to-end)")(noop(verified))

    spark.stop()
  }
}
