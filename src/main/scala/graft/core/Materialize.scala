package graft.core

import org.apache.spark.sql.DataFrame

/** Eager lineage cut for iterative operators (label propagation, star-CC,
  * BPE merge rounds, multi-tier dedup unions): each round's result is
  * materialized and its plan truncated so N rounds stay an O(1)-deep plan
  * instead of an O(N)-deep one the analyzer re-walks every round.
  *
  * Two modes, selected by the runtime conf `spark.graft.checkpointDir`:
  *
  *  - '''unset (default)''': `localCheckpoint()` — blocks live in executor
  *    block storage. The right idiom on `local[*]` and the fastest path on
  *    a healthy cluster, but the truncated lineage has NO recompute path:
  *    losing one executor mid-query fails the query.
  *  - '''set to a directory''': reliable `checkpoint()` — blocks are
  *    written to the (HDFS-compatible) checkpoint dir, so an executor loss
  *    recomputes from the checkpoint files instead of failing the query.
  *    This is the 100 TB / 1000-executor posture; the dir is registered on
  *    the SparkContext once, on first use.
  *
  * Both modes are eager and produce bit-identical results (the cut changes
  * fault-tolerance, never semantics) — asserted in Round12OpsSpec by
  * running labelPropagation under each mode.
  */
object Materialize {

  /** Runtime conf key: when set (non-empty), [[stage]] uses reliable
    * `checkpoint()` rooted at this directory instead of `localCheckpoint`. */
  val ConfKey = "spark.graft.checkpointDir"

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)
    dir match {
      case Some(d) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a per-context UUID subdir; register once
        // (a mid-session conf change to a DIFFERENT dir is not a supported
        // flow — the first dir wins for the context's lifetime)
        if (sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(d)
          // Spark deletes checkpoint files on GC only under
          // spark.cleaner.referenceTracking.cleanCheckpoints=true, and the
          // ContextCleaner reads that flag ONCE at context startup — it
          // cannot be enabled mid-session. Without it every iterative round
          // (and every micro-batch of a staged() streaming op) leaves its
          // checkpoint files behind, growing the dir without bound over a
          // long session. Warn once at registration; the fix belongs in the
          // SparkConf that builds the session.
          if (!sc.getConf.getBoolean(
              "spark.cleaner.referenceTracking.cleanCheckpoints", false))
            System.err.println("[graft.materialize] reliable-checkpoint mode " +
              s"is ON ($ConfKey=$d) but " +
              "spark.cleaner.referenceTracking.cleanCheckpoints is false: " +
              "checkpoint files are never deleted. For streaming or " +
              "long-running sessions set it to true IN THE SPARKCONF AT " +
              "SESSION BUILD (the cleaner reads it once at startup).")
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Serializes every session-global SQL-conf flip this object performs
    * (today only [[stageKeepLayout]]'s AQE toggle) so overlapping callers
    * cannot plan under a stale flip or restore a stale value (r14 advice:
    * the flip safety previously rested on a comment-level convention —
    * stageAll uses plain [[stage]], but nothing stopped a future thunk
    * from widening a table, which routes through stageKeepLayout). The
    * lock bounds driver-side planning only — executor work is unaffected
    * — and the holder spans at most one materialization action.
    *
    * (r15 negative results, so the next round doesn't re-try them: a LAZY
    * localCheckpoint variant — fusing the cut into the loop's convergence
    * probe — ran the star-CC heavy stages 83 s → 108 s (re-marked RDDs
    * recompute their narrow tails per consuming branch); an AQE-off loop
    * scope with volume-derived shuffle partitions regressed clusters to
    * 5.04 s (AQE's runtime broadcast conversions beat the saved
    * scheduling); fusing two CC rounds per staged step re-inlined the
    * inner round's 2-6-reference pipeline and hit 11.17 s. The r14 shape
    * — eager staged() per round under AQE — stays.) */
  private[graft] val confLock = new Object

  /** [[stage]] with the physical LAYOUT advertised to consumers: under
    * AQE, `Dataset.checkpoint`'s LogicalRDD captures the partitioning and
    * ordering of `AdaptiveSparkPlanExec` — which reports UNKNOWN — so a
    * staged table that is in fact hash-partitioned and sorted (e.g. the
    * BPE adjacency after its round-0 window) re-pays one exchange + sort
    * in EVERY downstream same-key window or join. Disabling AQE for just
    * the materialization job makes the capture concrete: ProbeBpe's
    * round-2 rewrite plans with zero Exchange/Sort (vs one of each), and
    * per-round rewrite time halved at sf0.1 (2.31 → 1.22 s over 6
    * rounds). The conf flip is scoped to the eager checkpoint action and
    * restored in a finally — consumers still plan under the session's
    * AQE. Use for iterative ops whose staged table is re-consumed on the
    * SAME key it is already partitioned by; plain [[stage]] is right when
    * the next consumer re-keys anyway (AQE then coalesces its shuffle). */
  def stageKeepLayout(df: DataFrame): DataFrame = confLock.synchronized {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try stage(df)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Stage several INDEPENDENT DataFrames concurrently (guide §2.6:
    * actions are only sequential because driver code calls them
    * sequentially). Eager staging of N independent tiers one-by-one
    * leaves the cluster idle through each job's tail; submitting the
    * materialization jobs from a small thread pool lets them back-fill
    * each other — q_dedup_consensus's three tier stagings overlapped this
    * way cost about the wall of the slowest tier, not the sum. Results
    * keep input order. (Uses plain [[stage]] — not stageKeepLayout, whose
    * session-conf flip is not safe to race.) */
  def stageAll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    if (dfs.sizeIs <= 1) dfs.map(stage)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(dfs.size.min(4))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(dfs.map(d => scala.concurrent.Future(stage(d)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
  }

  /** `df.staged()` sugar so call sites read like the `localCheckpoint()`
    * they replace. */
  implicit class StageOps(private val df: DataFrame) extends AnyVal {
    def staged(): DataFrame = stage(df)
    def stagedKeepLayout(): DataFrame = stageKeepLayout(df)
  }
}
