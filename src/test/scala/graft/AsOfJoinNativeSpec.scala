package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOfJoinExec, AsOfJoinNative}
import graft.sources.Tables

/** The native whole-operator as-of join (LogicalPlan + Strategy +
  * AsOfJoinExec merge) — equivalence against the window formulation,
  * semantics corners, and plan shape. */
class AsOfJoinNativeSpec extends SparkSpecBase {
  import spark.implicits._

  private def toyLeft = Seq(
    (1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 9L),
    (4L, 20L, 3L), (5L, 30L, 7L)
  ).toDF("id", "k", "t")

  private def toyRight = Seq(
    (10L, 1L, "a"), (10L, 5L, "b"), (10L, 8L, "c"),
    (20L, 4L, "d"), (40L, 1L, "e")
  ).toDF("rk", "rt", "v")

  test("picks the latest at-or-before right row; unmatched left emits null") {
    val out = AsOfJoinNative.asofJoin(toyLeft, toyRight, "k", "rk", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[String])].collect()
    // id=1: t=1 matches rt=1 ("a", same-instant included); id=2: rt=5 "b";
    // id=3: rt=8 "c"; id=4: rt=4 is AFTER t=3 -> null; id=5: no key 30 -> null
    assert(out === Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, None), (5L, None)))
  }

  test("null keys and null times match nothing on either side") {
    val l = Seq((1L, Some(10L), Some(2L)), (2L, None, Some(2L)), (3L, Some(10L), None))
      .toDF("id", "k", "t")
    val r = Seq((Some(10L), Some(1L), "a"), (None, Some(1L), "x"), (Some(10L), None, "y"))
      .toDF("rk", "rt", "v")
    val out = AsOfJoinNative.asofJoin(l, r, "k", "rk", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[String])].collect()
    assert(out === Seq((1L, Some("a")), (2L, None), (3L, None)))
  }

  test("matches the union+window formulation on events x orders (sf0.001)") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
    val native = AsOfJoinNative.asofJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("asof_orderkey"))
    val window = graft.ops.AsofJoin.asofJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("asof_orderkey"))
    assert(native.count() === ev.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plans AsOfJoinExec with one exchange per side and no window/union") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
    val df = AsOfJoinNative.asofJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("asof_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("Window"), s"native plan must not fall back to window:\n$plan")
    // the orders side aggregates (1 exchange) then re-clusters on o_custkey
    // alone (1 exchange); the events side clusters once. Count the FINAL
    // plan only — AQE's toString repeats the initial plan below it.
    val exchanges = plan.split("== Initial Plan ==").head
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3, s"expected <=3 bounded exchanges, got $exchanges:\n$plan")
  }

  test("tolerance nulls matches older than the window, keeps fresh ones") {
    import graft.plans.AsOfJoinNative.AsOfMatchTimeCol
    val out = graft.plans.AsOfJoinNative.asofJoinTolerance(
        toyLeft, toyRight, "k", "rk", "t", "rt", Seq("v"),
        withinTolerance = col("t") - col(AsOfMatchTimeCol) <= 2L)
      .orderBy("id").select("id", "v").as[(Long, Option[String])].collect()
    // id=1: t=1, match rt=1, gap 0 -> keep; id=2: t=5, rt=5, gap 0 -> keep;
    // id=3: t=9, rt=8, gap 1 -> keep... and with gap limit 2 nothing flips
    assert(out === Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, None), (5L, None)))
    val tight = graft.plans.AsOfJoinNative.asofJoinTolerance(
        toyLeft, toyRight, "k", "rk", "t", "rt", Seq("v"),
        withinTolerance = col("t") - col(AsOfMatchTimeCol) <= 0L)
      .orderBy("id").select("id", "v").as[(Long, Option[String])].collect()
    // gap limit 0: only exact same-instant matches survive
    assert(tight === Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, None), (5L, None)))
    // the match-time plumbing column must not leak into the output schema
    val cols = graft.plans.AsOfJoinNative.asofJoinTolerance(
      toyLeft, toyRight, "k", "rk", "t", "rt", Seq("v"),
      withinTolerance = lit(true)).columns.toSeq
    assert(cols === Seq("id", "k", "t", "v"))
  }

  test("merge state is one held row: right side longer than left still streams") {
    // 1 left row vs 10k right rows for the same key: the exec buffers a
    // single right row, never the history
    val l = Seq((1L, 1L, 1000000L)).toDF("id", "k", "t")
    val r = spark.range(10000).select(lit(1L).as("rk"), col("id").as("rt"),
      col("id").as("v"))
    val out = AsOfJoinNative.asofJoin(l, r, "k", "rk", "t", "rt", Seq("v"))
      .select("v").as[Long].collect()
    assert(out === Array(9999L))
  }

  test("declarative install via GraftExtensions plans the native node too") {
    // same shared-context dance as ExtensionsSqlSpec: a second session over
    // the suite's SparkContext, never stopped (stop would kill the context)
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val l = Seq((1L, 10L, 5L)).toDF("id", "k", "t")
      val r = Seq((10L, 3L, "a")).toDF("rk", "rt", "v")
      // bypass install(): the session's injected strategy must plan it
      val lp = l.queryExecution.analyzed
      val rp = r.queryExecution.analyzed
      def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val df = org.apache.spark.sql.GraftPlanBridge.ofRows(s2,
        graft.plans.AsOfJoinPlan(lp, rp, a(lp, "k"), a(rp, "rk"), a(lp, "t"), a(rp, "rt")))
      assert(df.select("id", "v").as[(Long, String)].collect() === Seq((1L, "a")))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
