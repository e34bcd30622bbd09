package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance / data-engineering operators: the jobs a 100 TB
  * lakehouse runs AROUND its analytics — CDC merge application, integrity
  * checksums for cross-engine migrations, semi-join reduction for
  * selective big joins, and dominance (skyline) pruning.
  */
object Maintain {

  // ------------------------------------------------------------ CDC merge

  /** MERGE INTO classification (the batch CDC apply): full-outer join the
    * base table with a change set carrying upserts (`op = "u"`) and
    * deletes (`op = "d"`), and emit every key with its action —
    * `insert` (change key absent from base), `update` (upsert onto an
    * existing key), `delete`, or `keep` — plus the post-merge value
    * (NULL for deletes, the change value for insert/update, the base
    * value for keeps).
    *
    * Scale shape: ONE shuffle on the merge key (the full-outer join);
    * classification and value resolution are pure projections. This is
    * exactly the reduction `MERGE INTO` performs in Delta/Iceberg before
    * file rewriting; emitting the action column makes the row-level plan
    * auditable (and hash-checkable) instead of implicit.
    *
    * @param base    base table
    * @param changes change set with `keyCol`, `valCol`, and an `op`
    *                column ("u" upsert / "d" delete)
    */
  def mergeClassify(base: DataFrame, changes: DataFrame,
                    keyCol: String, valCol: String): DataFrame = {
    val b = base.select(col(keyCol), col(valCol).as("base_val"))
    val c = changes.select(col(keyCol), col(valCol).as("chg_val"), col("op"))
    b.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("op") === "d", "delete")
          .when(col("op") === "u" && col("base_val").isNotNull, "update")
          .when(col("op") === "u", "insert")
          .otherwise("keep").as("action"),
        when(col("op") === "d", lit(null).cast("double"))
          .when(col("op") === "u", col("chg_val"))
          .otherwise(col("base_val")).as("new_val"))
  }

  // ------------------------------------------------- content checksums

  /** Order-independent, ENGINE-PORTABLE content fingerprint per group:
    * row count, a 60-bit XOR fold, and a 32-bit additive fold of the md5
    * of each row's rendered content. Two engines (or two snapshots of a
    * migrating table) agree on a group iff all three match — the standard
    * cheap equality certificate for 100 TB copies where row-by-row
    * comparison is impossible.
    *
    * Portability: md5 prefixes via the FIXTURES.md '0x'-cast route; XOR
    * and the 32-bit sum are commutative/associative, so partial
    * aggregation order (and therefore partitioning) cannot change the
    * result — and the 32-bit terms keep the additive fold exact in BIGINT
    * to ~2^31 rows per group. XOR alone is blind to duplicate PAIRS of
    * identical rows; the (count, xor, sum) triple closes that gap for any
    * practical corpus.
    */
  def contentChecksum(df: DataFrame, groupCol: String, content: Column): DataFrame = {
    val h = md5(content)
    df.select(col(groupCol),
        conv(substring(h, 1, 15), 16, 10).cast("long").as("h60"),
        conv(substring(h, 16, 8), 16, 10).cast("long").as("h32"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        call_function("bit_xor", col("h60")).as("xor60"),
        sum(col("h32")).as("sum32"))
  }

  // -------------------------------------------- bloom semi-join reduction

  /** Membership test of `key` against a packed Bloom bitmap column
    * (`bits`: array of m/64 longs, the [[Sketch.BloomAgg]] layout) using
    * the same md5-chunk positions as [[Sketch.bloomPos]] — pure codegen
    * projection, no explode. No false negatives by construction. */
  def bloomContains(key: Column, bits: Column, m: Int, j: Int): Column =
    (0 until j).map { t =>
      val pos = Sketch.bloomPos(key, t, m)
      val word = element_at(bits, (call_function("div", pos, lit(64L)) + 1).cast("int"))
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Semi-join reduction: filter the fact side through a broadcast Bloom
    * bitmap of the (filtered) dim keys BEFORE the join shuffles the fact
    * table. The join itself then removes the bloom's false positives, so
    * the result is EXACTLY the plain join's — which is what the oracle
    * checks. This is the manual form of Spark's own InjectRuntimeFilter:
    * declared explicitly, the reduction applies at any dim size (a 100 GB
    * dim whose 4 KB bitmap still broadcasts) and is visible in the plan.
    *
    * Returns the reduced fact rows joined to `dimKeys` (inner, on
    * `factKey` = `dimKey`).
    */
  def bloomReduceJoin(fact: DataFrame, factKey: String,
                      dimKeys: DataFrame, dimKey: String,
                      m: Int = 4096, j: Int = 3): DataFrame = {
    val bloom = udaf(new Sketch.BloomAgg(m, j))
    val bitmap = dimKeys.select(col(dimKey).cast("string").as("k"))
      .agg(bloom(col("k")).as("bits"))
    fact
      .crossJoin(broadcast(bitmap)) // one m-bit row
      .filter(bloomContains(col(factKey), col("bits"), m, j))
      .drop("bits")
      .join(dimKeys, fact(factKey) === dimKeys(dimKey))
  }

  // ------------------------------------------------------ 2-D skyline

  /** 2-D Pareto front (skyline): rows not dominated by any other row,
    * maximizing `maxCol` while minimizing `minCol` (dominance = other row
    * ≥ on maxCol, ≤ on minCol, strict on at least one).
    *
    * Decomposition instead of the quadratic NOT-EXISTS: dominance only
    * depends on the PER-minCol-VALUE maximum of maxCol, so (1) one
    * partial-agg'd groupBy collapses the corpus to ≤ |minCol domain|
    * rows, (2) the classic sweep (running max over strictly smaller
    * minCol values) runs as a window over that bounded table — the one
    * unpartitioned window is ≤ domain-sized by construction, never
    * corpus-sized — and (3) survivors equi-join back to recover every
    * tied row. The oracle runs the textbook quadratic NOT-EXISTS form;
    * the hash match proves the decomposition lossless (ties included:
    * duplicate (max,min) pairs dominate each other non-strictly and all
    * survive).
    */
  def paretoFront2D(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val best = df.groupBy(col(minCol)).agg(max(col(maxCol)).as("mx"))
    val sweep = best.withColumn("best_smaller",
      max(col("mx")).over(Window.orderBy(col(minCol))
        .rangeBetween(Window.unboundedPreceding, -1)))
      .filter(col("best_smaller").isNull || col("mx") > col("best_smaller"))
      .select(col(minCol).as("f_min"), col("mx"))
    df.join(sweep, df(minCol) === sweep("f_min") && df(maxCol) === sweep("mx"))
      .drop("f_min", "mx")
  }
}
