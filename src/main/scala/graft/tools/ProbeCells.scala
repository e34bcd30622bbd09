package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Scratch probe isolating the cell-geometry variants: time cellEdgesGeom
  * at chosen (k, j) pairs on a fixture's embeddings — the measurement
  * behind the bounded-occupancy subsplit tuning. Usage:
  * `runMain graft.tools.ProbeCells <sfDir> <threshold> <reps> <k:j> ...` */
object ProbeCells {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ProbeCells <sfDir> <threshold> <reps> <k:j>...")
    val sfDir = args(0)
    val threshold = args(1).toDouble
    val reps = args(2).toInt
    val geoms = args.drop(3).toSeq.map { s =>
      val Array(k, j) = s.split(":"); (k.toInt, j.toInt)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    geoms.foreach { case (k, j) =>
      // j = -1 probes the ASSIGNMENT alone (noop write forces cid)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = if (j < 0) {
          Similarity.assignCellsProbe(emb, k)
            .write.format("noop").mode("overwrite").save()
          -1L
        } else Similarity.cellEdgesGeom(emb, threshold, k, j).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"CELLS k=$k%4d j=$j  min=${times.map(_._1).min}%7.2f s  " +
        f"edges=${times.head._2}%8d  reps=$reps")
    }
    spark.stop()
  }
}
