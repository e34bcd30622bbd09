package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends SparkSpecBase {

  test("salted join produces exactly the rows of the unsalted join") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewJoin.saltedJoin(orders, customer, "o_custkey",
      saltSource = col("o_orderkey"), salts = 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted join honors left joins (unmatched large rows kept once)") {
    val orders = Tables.orders(spark, sf0001)
    // keep only even customers on the small side → odd-key orders unmatched
    val customer = Tables.customer(spark, sf0001)
      .filter(col("c_custkey") % 2 === 0)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"), "left")
    val salted = SkewJoin.saltedJoin(orders, customer, "o_custkey",
      saltSource = col("o_orderkey"), salts = 4, joinType = "left")
    assert(salted.count() === plain.count())
    assert(salted.filter(col("c_name").isNull).count()
      === plain.filter(col("c_name").isNull).count())
  }

  test("salted aggregation equals the plain group-by") {
    val ev = Tables.events(spark, sf0001)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val salted = SkewJoin.saltedCountSum(
        ev.withColumn("v", col("value").cast("decimal(12,2)")),
        "event_type", "v", col("event_id"), salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n === plain(k)._1)
      assert(s.compareTo(plain(k)._2) === 0)
    }
  }
}
