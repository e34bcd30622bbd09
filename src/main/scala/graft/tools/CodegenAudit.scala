package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

import graft.SparkEntry

/** Scratch audit: for every declared query, count equi-join nodes that sit
  * OUTSIDE WholeStageCodegen in the (pre-AQE) physical plan — the
  * least/greatest-constraint-inference trap detector (see CLAUDE.md).
  * `runMain graft.tools.CodegenAudit <sfDir> [<query> ...]` */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CodegenAudit <sfDir> [<query>...]")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        // walk with a codegen-context flag; joins seen under a
        // WholeStageCodegenExec are fine, bare ones are flagged
        def walk(p: SparkPlan, inCodegen: Boolean): Seq[String] = p match {
          case _: WholeStageCodegenExec => p.children.flatMap(walk(_, true))
          case _: org.apache.spark.sql.execution.InputAdapter =>
            p.children.flatMap(walk(_, false))
          case a: AdaptiveSparkPlanExec => walk(a.inputPlan, false)
          case j: BroadcastHashJoinExec =>
            (if (inCodegen) Nil else Seq(s"BHJ(${j.joinType})")) ++
              j.children.flatMap(walk(_, inCodegen))
          case j: ShuffledHashJoinExec =>
            (if (inCodegen) Nil else Seq(s"SHJ(${j.joinType})")) ++
              j.children.flatMap(walk(_, inCodegen))
          case j: SortMergeJoinExec =>
            (if (inCodegen) Nil else Seq(s"SMJ(${j.joinType})")) ++
              j.children.flatMap(walk(_, inCodegen))
          case _ => p.children.flatMap(walk(_, inCodegen))
        }
        val bare = walk(plan, inCodegen = false)
        if (bare.nonEmpty) println(f"AUDIT $n%-28s ${bare.size} bare: ${bare.mkString(", ")}")
      } catch {
        case e: Exception => println(f"AUDIT $n%-28s ERR ${e.getMessage.take(80)}")
      }
    }
    println("AUDIT_END")
    spark.stop()
  }
}
