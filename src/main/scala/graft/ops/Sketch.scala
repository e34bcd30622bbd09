package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches with engine-reproducible hash families.
  *
  * `approx_count_distinct` (HyperLogLog++) is the built-in fast path, but
  * its sketch bits are engine-internal — no external oracle can check it.
  * KMV ("k minimum values" / bottom-k, Bar-Yossef et al. 2002) estimates
  * |D| from the k-th smallest normalized hash of the distinct values:
  *
  *   est = (k - 1) / h_(k)          (exact count when |D| < k)
  *
  * With an md5-derived hash both engines compute the identical estimate
  * bit-for-bit, so the approximate-distinct TIER gets a full DuckDB oracle.
  *
  * Scale shape: the bottom-k set is a mergeable sketch (union = k smallest
  * of the union), so partial aggregation applies; this implementation
  * computes it relationally — one distinct shuffle + one window rank —
  * which AQE handles at any group count. Error is ~1/sqrt(k-2).
  */
object Sketch {

  /** Normalized md5-derived hash in (0, 1]: first 60 bits / 2^60. */
  def portableUnitHash(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Per-group KMV distinct estimate of `valueCol`, alongside the exact
    * count (the oracle compares both). Output: groupCols*, n_exact, est. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val d = df.select(col(groupCol), col(valueCol))
      .distinct()
      .withColumn("h", portableUnitHash(col(valueCol)))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc, col(valueCol).asc)
    d.withColumn("rnk", row_number().over(w))
      .withColumn("n_exact", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("rnk") === least(lit(k.toLong), col("n_exact")))
      .withColumn("est",
        when(col("n_exact") < k, col("n_exact").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("h"), 4)))
      .select(col(groupCol), col("n_exact"), col("est"))
  }

  /** DuckDB SQL reproducing `kmvDistinct` bit-for-bit over a table. */
  def kmvDistinctOracle(table: String, groupCol: String, valueCol: String,
                        k: Int = 64): String =
    s"""WITH d AS (SELECT DISTINCT $groupCol, $valueCol,
       |        ('0x'||substr(md5($valueCol::VARCHAR),1,15))::BIGINT
       |          / 1152921504606846976.0 AS h
       |      FROM $table),
       |r AS (SELECT $groupCol, $valueCol, h,
       |        ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY h, $valueCol) AS rnk,
       |        COUNT(*) OVER (PARTITION BY $groupCol) AS n_exact
       |      FROM d)
       |SELECT $groupCol, n_exact,
       |  CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |       ELSE ROUND(${(k - 1).toDouble} / h, 4) END AS est
       |FROM r WHERE rnk = LEAST($k, n_exact)
       |ORDER BY $groupCol""".stripMargin
}
