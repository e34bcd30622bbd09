package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) handles
  * most runtime skew; this helper is for the pathological key (one tag, one
  * null-bucket, one whale user) that would otherwise pin a single reducer
  * regardless of partition splitting on the OTHER side of the join.
  *
  * Salting: the skewed (large) side gets a deterministic salt derived from a
  * high-cardinality column (never `rand()` — retries/speculation must
  * reproduce the same row placement); the small side is replicated across
  * all salt values; the join key becomes (key, salt). Result rows are
  * identical to the unsalted join — only the shuffle layout changes.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * `saltSource` must be a deterministic high-cardinality column of
    * `large` (e.g. its primary key). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: partial agg on (key, salt), final agg on
    * key. For associative aggregates Spark's partial/final hash agg already
    * does this per-partition; explicit salting adds a full shuffle level for
    * the case where even the per-key FINAL agg row stream is too hot (e.g.
    * count/sum over one key that dominates the dataset). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltSource: Column, salts: Int = 8): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
  }
}
