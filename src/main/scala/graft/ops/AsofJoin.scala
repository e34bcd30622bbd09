package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-style as-of join: each left row picks the latest right row with
  * `rightTime <= leftTime` for its key.
  *
  * Implemented as union → one shuffle on the key → per-key window sort →
  * `last(ignoreNulls)` carry-forward — the classic sort-merge as-of. This
  * scales where the naive formulation (range join + per-row max) explodes:
  * the range join produces |left| × |matching right| intermediate rows,
  * while this plan's working set is |left| + |right| with a single
  * exchange, and AQE can still split skewed keys.
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise —
  * and `payload` column names must not collide with left columns.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftOn: String, rightOn: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left side")
    val l = left.select(
      Seq(col(leftOn).as("__k"), col(leftTime).as("__t"), lit(1).as("__is_l")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right.select(
      Seq(col(rightOn).as("__k"), col(rightTime).as("__t"), lit(0).as("__is_l")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    // at equal times the right row sorts first, so `<=` includes same-instant
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__is_l").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_l") === 1).select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
