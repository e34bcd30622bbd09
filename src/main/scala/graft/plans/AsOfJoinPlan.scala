package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native whole-operator as-of join: the logical node. Each left row picks
  * the LATEST right row with the same key and `rightTime <= leftTime`
  * (same-instant included), left-outer semantics — exactly DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND r.t <= l.t` and the contract of
  * [[graft.ops.AsofJoin.asofJoin]] (union + window carry-forward).
  *
  * This is the (c)-tier extension path — LogicalPlan + Strategy +
  * SparkPlan — exercised end-to-end: the planner turns this node into
  * [[AsOfJoinExec]], a single-pass streaming merge over the two
  * co-partitioned, (key, time)-sorted children. Versus the window
  * formulation it needs no union row-widening (no null-padded columns
  * shuffled for the other side) and holds exactly ONE buffered right row
  * per partition at any moment — O(1) state, no window buffer.
  *
  * Key and time expressions must be the same data type on both sides
  * (cast at the API layer, [[AsOfJoinNative.asofJoin]]).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Injected
  * declaratively by `graft.functions.GraftExtensions`
  * (`injectPlannerStrategy`) and imperatively by
  * [[AsOfJoinNative.install]] (`spark.experimental.extraStrategies`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Declares `ClusteredDistribution` on each side's key and (key, time)
  * ascending `requiredChildOrdering` — EnsureRequirements inserts exactly
  * one hash exchange + sort per side (AQE's ValidateRequirements keeps the
  * two sides co-partitioned when coalescing). `doExecute` then
  * zip-merges partition pairs: one forward pass, one buffered right row.
  *
  * At 100 TB this is the shape that survives: cost is
  * sort(left) + sort(right) + a linear merge, independent of how many
  * right rows precede each left row — where a range-join formulation
  * materializes |left| × |matching right| intermediates and the window
  * formulation shuffles a union row padded to the full combined width.
  *
  * Null semantics (= SQL join semantics, verified against DuckDB ASOF):
  * null keys and null times match nothing; unmatched left rows emit null
  * right columns.
  *
  * Rows sort null-first ascending, which the merge exploits: null-key /
  * null-time right rows are consumed before any real candidate and are
  * never buffered; null-key left rows arrive before any real right key is
  * reached.
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lk = leftKey; val rk = rightKey
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        if (!lIter.hasNext) Iterator.empty
        else {
          // separate projection instances per use site: each UnsafeProjection
          // reuses ONE buffer across applies, so a compare of p(a) vs p(b)
          // through the same instance would read the same bytes twice
          val lktProj = UnsafeProjection.create(Seq(lk, lt), lOut)
          val rktProj = UnsafeProjection.create(Seq(rk, rt), rOut)
          val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
          val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
          val ktOrd = RowOrdering.createNaturalAscendingOrdering(
            Seq(lk.dataType, lt.dataType))
          val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
          val nullRight = new GenericInternalRow(rOut.size)
          val joined = new JoinedRow
          val resultProj = UnsafeProjection.create(allOut, lOut ++ rOut)
          // the ONLY cross-row state: the latest admissible right row (copied
          // out of the child iterator's reusable buffer) and the lookahead
          var rHeld: InternalRow = null
          var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
          lIter.map { l =>
            val lkt = lktProj(l)
            // consume every right row at-or-before (lkey, ltime); the last
            // non-null one becomes the held candidate. Left times ascend
            // within a key, so a held row with the same key is admissible.
            var advancing = rNext != null
            while (advancing) {
              val rkt = rktProj(rNext)
              if (ktOrd.compare(rkt, lkt) <= 0) {
                if (!rkt.isNullAt(0) && !rkt.isNullAt(1)) rHeld = rNext.copy()
                rNext = if (rIter.hasNext) rIter.next() else null
                advancing = rNext != null
              } else advancing = false
            }
            val matched = rHeld != null && !lkt.isNullAt(0) && !lkt.isNullAt(1) &&
              keyOrd.compare(lKeyProj(l), rKeyProj(rHeld)) == 0
            resultProj(joined(l, if (matched) rHeld else nullRight))
          }
        }
    }
  }
}

/** DataFrame-level API over the native as-of join plan. */
object AsOfJoinNative {

  /** Idempotently add [[AsOfJoinStrategy]] to an existing session's
    * planner (the imperative path; `GraftExtensions` is the declarative
    * one and survives `newSession()`). */
  def install(spark: SparkSession): Unit = synchronized {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(AsOfJoinStrategy))
      ex.extraStrategies = ex.extraStrategies :+ AsOfJoinStrategy
  }

  /** Same contract as [[graft.ops.AsofJoin.asofJoin]] (latest right row
    * with `rightTime <= leftTime` per key, left-outer, same-instant
    * included; right unique per (key, time); payload names must not
    * collide with left columns) — planned as [[AsOfJoinExec]] instead of
    * union + window. The right key/time are cast to the left side's types
    * so the merge compares like with like. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftOn: String, rightOn: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame =
    asofJoinWithMatchTime(left, right, leftOn, rightOn, leftTime, rightTime,
      payload).drop(AsOfMatchTimeCol)

  /** [[asofJoin]] plus the matched right row's time as
    * [[AsOfMatchTimeCol]] — the hook [[asofJoinTolerance]] filters on. */
  def asofJoinWithMatchTime(left: DataFrame, right: DataFrame,
               leftOn: String, rightOn: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols).mkString(",")} collide with left side")
    val reserved = Set("__graft_rk", "__graft_rt", AsOfMatchTimeCol)
    require(!payload.exists(reserved), s"payload columns ${payload.filter(reserved).mkString(",")} " +
      s"collide with the operator's internal plumbing columns ($reserved)")
    require(payload.distinct.size == payload.size,
      s"duplicate payload columns: ${payload.diff(payload.distinct).mkString(",")}")
    val spark = left.sparkSession
    install(spark)
    val keyT = left.schema(leftOn).dataType
    val timeT = left.schema(leftTime).dataType
    val r = right.select(
      col(rightOn).cast(keyT).as("__graft_rk") +:
        col(rightTime).cast(timeT).as("__graft_rt") +:
        payload.map(col): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftOn), attr(rPlan, "__graft_rk"),
      attr(lPlan, leftTime), attr(rPlan, "__graft_rt"))
    GraftPlanBridge.ofRows(spark, plan)
      .select(leftCols.map(col) ++ payload.map(col) :+ col("__graft_rt"): _*)
      .withColumnRenamed("__graft_rt", AsOfMatchTimeCol)
  }

  /** Name under which [[asofJoin]] exposes the matched right row's time
    * (dropped by the declared queries, consumed by [[asofJoinTolerance]]). */
  val AsOfMatchTimeCol = "__graft_asof_rt"

  /** As-of join with a match tolerance (the pandas `merge_asof
    * tolerance=` contract): the latest right row still wins, but a match
    * older than `tolerance` nulls out. A post-filter IS the exact
    * semantics — the as-of match maximizes rightTime, so if it falls
    * outside the tolerance window every earlier row does too. `tolerance`
    * is any boolean Column over (leftTime, matched right time), e.g.
    * `datediff(col("ts"), col(AsOfMatchTimeCol)) <= 30`. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame,
                        leftOn: String, rightOn: String,
                        leftTime: String, rightTime: String,
                        payload: Seq[String],
                        withinTolerance: org.apache.spark.sql.Column): DataFrame = {
    val joined = asofJoinWithMatchTime(left, right, leftOn, rightOn,
      leftTime, rightTime, payload)
    payload.foldLeft(joined) { (df, p) =>
        df.withColumn(p, org.apache.spark.sql.functions
          .when(withinTolerance, col(p)))
      }
      .drop(AsOfMatchTimeCol)
  }
}
