package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Schema-adaptive events loading + fixture preflight (the round-6
  * fixture-drift lesson): every encoding `events.ts` has shipped under must
  * normalize to the SAME µs TimestampType wall clock, and drift outside the
  * accepted set must fail with one named error, not N analysis failures. */
class PreflightSpec extends SparkSpecBase {

  import spark.implicits._

  // 2021-03-04T05:06:07.123456789 — ns value exercises the ns→µs truncation
  private val ns = 1614834367123456789L
  private val micros = ns / 1000L

  test("adaptEventTs: INT64 nanos → µs TimestampType (truncated, not rounded)") {
    val df = Seq((1L, ns)).toDF("event_id", "ts")
    val out = Tables.adaptEventTs(df, df.schema("ts").dataType)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros($"ts")).as[Long].head()
    assert(got == micros)
  }

  test("adaptEventTs: TIMESTAMP_NTZ → TimestampType with wall clock preserved under UTC") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.adaptEventTs(df, df.schema("ts").dataType)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("adaptEventTs: TimestampType passes through unchanged") {
    val df = Seq((1L, new Timestamp(micros / 1000L))).toDF("event_id", "ts")
    val out = Tables.adaptEventTs(df, df.schema("ts").dataType)
    assert(out eq df)
  }

  test("adaptEventTs: unknown encoding fails with a named fixture error") {
    val df = Seq((1L, "2021-03-04")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      Tables.adaptEventTs(df, df.schema("ts").dataType)
    }
    assert(e.getMessage.contains("fixture schema changed: events.ts is now string"))
  }

  test("Tables.events yields µs TimestampType against the live fixture") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }

  test("preflight is clean against the live fixture") {
    assert(Preflight.probe(spark, sf0001) == Seq.empty)
  }

  test("preflight names a deliberately re-typed events.ts in ONE error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_preflight").toString
    // copy the real fixture so events is the ONLY drift
    for (t <- Tables.All if t != "events")
      spark.read.parquet(s"$sf0001/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    Tables.events(spark, sf0001)
      .withColumn("ts", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val drifts = Preflight.probe(spark, dir)
    assert(drifts.size == 1)
    assert(drifts.head.contains("fixture schema changed: events.ts is now string"))

    val e = intercept[IllegalStateException] { Preflight.check(spark, dir) }
    assert(e.getMessage.contains("fixture preflight failed"))
    assert(e.getMessage.contains("events.ts is now string"))
  }

  test("preflight reports a missing column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_preflight2").toString
    for (t <- Tables.All if t != "documents")
      spark.read.parquet(s"$sf0001/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    spark.read.parquet(s"$sf0001/documents.parquet").drop("lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val drifts = Preflight.probe(spark, dir)
    assert(drifts == Seq("fixture schema changed: documents.lang is missing"))
  }
}
