package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Round-15 internals: the widen memo (one staged copy per (plan, key)
  * per session) and the PlanCache concurrency/failure-path rework. */
class Round15OpsSpec extends SparkSpecBase {

  test("Tables.widen memoizes per (plan, key): same site twice = same instance") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val a = graft.sources.Tables.widen(docs, "doc_id")
    // a SEMANTICALLY equal but separately-built plan must hit the memo too
    val docs2 = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val b = graft.sources.Tables.widen(docs2, "doc_id")
    assert(a eq b, "second widen of the same (plan, key) must return the memoized frame")
    assert(a.count() == docs.count())
  }

  test("PlanCache: a failing build leaves no reservation and a retry succeeds") {
    val owner = spark.range(10).toDF("v")
    var calls = 0
    val boom = intercept[RuntimeException] {
      PlanCache.getOrPersist(owner, "r15-fail") {
        calls += 1
        throw new RuntimeException("build failed")
      }
    }
    assert(boom.getMessage == "build failed")
    // the key was released: a second call rebuilds rather than observing
    // a poisoned slot
    val ok = PlanCache.getOrPersist(owner, "r15-fail") {
      calls += 1
      owner.select(col("v") * 2 as "v")
    }
    assert(calls == 2 && ok.count() == 10)
  }

  test("PlanCache: concurrent same-key callers share one build") {
    val owner = spark.range(100).toDF("v")
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = (1 to 4).map { _ =>
        scala.concurrent.Future(PlanCache.getOrPersist(owner, "r15-conc") {
          built.incrementAndGet()
          Thread.sleep(100) // widen the race window
          owner.select(sum(col("v")).as("s"))
        })
      }
      val dfs = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration(60, "s"))
      assert(built.get() == 1, s"expected one build, got ${built.get()}")
      assert(dfs.forall(_ eq dfs.head), "all callers must share the cached instance")
    } finally pool.shutdown()
  }
}
