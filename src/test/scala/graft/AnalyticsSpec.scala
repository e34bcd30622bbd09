package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.AnalyticsQueries
import graft.sources.Tables

class AnalyticsSpec extends SparkSpecBase {
  private lazy val docs = Tables.documents(spark, sf0001)

  test("portable-hash MinHash recalls the exact pairs with precision 1.0") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.minhashNearDupPairsPortable(docs, "doc_id", "text", 3, 32, 2, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))          // exact post-verification
    assert(got === exact, s"missed: ${exact -- got}")
  }

  test("pmiCollocations matches the hand-computed margin PMI") {
    import graft.ops.TextOps
    import spark.implicits._
    // bigrams: a_b, b_a, a_b | a_c -> counts (a,b)=2 (b,a)=1 (a,c)=1, N=4
    // margins first: a=3, b=1; second: b=2, a=1, c=1
    val d = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(d, "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    // pmi(b,a)=ln(1*4/(1*1))=ln 4; pmi(a,b)=ln(2*4/(3*2))=ln(4/3)=pmi(a,c)
    assert(got.toSeq === Seq(
      ("b", "a", 1L, 1386294L),
      ("a", "b", 2L, 287682L),
      ("a", "c", 1L, 287682L)))
  }

  test("count-min estimates never undercount and are partitioning-invariant") {
    import graft.ops.{Sketch, TextOps}
    val items = docs.select(explode(TextOps.tokens(col("text"))).as("item"))
    val base = Sketch.countMinTopK(items, "item", width = 32, depth = 4, k = 1000).collect()
    assert(base.nonEmpty && base.forall(_.getAs[Long]("overcount") >= 0L))
    // groupBy-sum construction == mergeable sketch: any partitioning of the
    // input merges to the identical cell table and estimates
    val reparted = Sketch.countMinTopK(items.repartition(13), "item",
      width = 32, depth = 4, k = 1000).collect()
    assert(base.map(_.toString).toSeq === reparted.map(_.toString).toSeq)
  }

  test("portable MinHash permutation constants are deterministic and bounded") {
    val (a1, b1) = Dedup.permConsts(32)
    val (a2, _) = Dedup.permConsts(32)
    assert(a1.toSeq === a2.toSeq)
    assert(a1.forall(x => x > 0 && x < (1L << 30)) && b1.forall(x => x >= 0 && x < (1L << 30)))
    assert(a1.forall(_ % 2 == 1)) // odd multipliers
  }

  test("hash-bucket sampling is partitioning-invariant") {
    val q = AnalyticsQueries.defs("q_sample_hash").fn
    val base = q(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val events = Tables.events(spark, sf0001).repartition(13)
    val resampled = events
      .withColumn("bucket",
        conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10).cast("long") % 10)
      .filter(col("bucket") === 0).select("event_id")
      .orderBy("event_id").collect().map(_.getLong(0)).toSeq
    assert(base === resampled)
    assert(base.nonEmpty && base.size < Tables.events(spark, sf0001).count())
  }

  test("moment statistics are sane: std > 0, corr within [-1, 1]") {
    val rows = AnalyticsQueries.defs("q_stats_agg").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("qty_std") > 0)
      val c = r.getAs[Double]("qty_price_corr")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("grouping sets emit exactly the three declared levels") {
    val gids = AnalyticsQueries.defs("q_grouping_sets").fn(spark, sf0001)
      .select("gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids === Set(0L, 1L, 3L)) // (s,p) / (s) / ()
  }

  test("KMV distinct estimate lands within the sketch's error envelope") {
    val k = 64
    val rows = graft.ops.Sketch.kmvDistinct(
        Tables.lineitem(spark, sf0001), "l_returnflag", "l_partkey", k)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est")
      if (exact < k) assert(est === exact) // below k the sketch is exact
      else assert(math.abs(est - exact) / exact <= 4.0 / math.sqrt(k - 2),
        s"KMV est $est vs exact $exact outside 4/sqrt(k-2)")
    }
  }

  test("KMV Aggregator (one-pass mergeable sketch) equals the relational KMV") {
    import org.apache.spark.sql.functions.udaf
    val k = 64
    val li = Tables.lineitem(spark, sf0001)
    val viaAgg = li
      .select(col("l_returnflag"),
        graft.ops.Sketch.portableUnitHashLong(col("l_partkey")).as("h"))
      .groupBy("l_returnflag")
      .agg(udaf(new graft.ops.Sketch.KmvAgg(k)).apply(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaRelational = graft.ops.Sketch.kmvDistinct(li, "l_returnflag", "l_partkey", k)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(viaAgg === viaRelational)
    // repartitioning must not change a mergeable sketch's result
    val viaAggShuffled = li.repartition(13)
      .select(col("l_returnflag"),
        graft.ops.Sketch.portableUnitHashLong(col("l_partkey")).as("h"))
      .groupBy("l_returnflag")
      .agg(udaf(new graft.ops.Sketch.KmvAgg(k)).apply(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAggShuffled === viaRelational)
  }

  test("HLL Aggregator (fixed 32-int mergeable buffer) equals the relational HLL") {
    import org.apache.spark.sql.functions.udaf
    val li = Tables.lineitem(spark, sf0001)
    val viaRelational = graft.ops.Sketch.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    def viaAgg(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_returnflag"),
        graft.ops.Sketch.portableUnitHashLong(col("l_partkey")).as("h"))
      .groupBy("l_returnflag")
      .agg(udaf(new graft.ops.Sketch.HllAgg).apply(col("h")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg(li) === viaRelational)
    // repartitioning must not change a mergeable sketch's result
    assert(viaAgg(li.repartition(13)) === viaRelational)
    // the estimate is within the asserted 3-sigma band for every group
    graft.ops.Sketch.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().foreach { r =>
        assert(r.getAs[Boolean]("within_3sigma"),
          s"${r.getString(0)}: est=${r.getAs[Double]("est")} " +
            s"exact=${r.getAs[Long]("n_exact")}")
      }
  }

  test("KMV set algebra: estimates bracket the exact counts and degenerate exactly under k") {
    val li = Tables.lineitem(spark, sf0001)
    import org.apache.spark.sql.functions.{col, year}
    val r = graft.ops.Sketch.kmvSetOps(li, "l_partkey",
      year(col("l_shipdate")) === 1996, year(col("l_shipdate")) === 1997, k = 64)
      .collect().head
    def d(n: String) = r.getAs[Double](n)
    def l(n: String) = r.getAs[Long](n)
    // estimator sanity: ~1/sqrt(k-2) relative error, generous 4-sigma band
    for ((est, exact) <- Seq(("est_a", "n_a_exact"), ("est_b", "n_b_exact"),
        ("est_union", "n_union_exact"))) {
      assert(math.abs(d(est) - l(exact)) <= 0.55 * l(exact),
        s"$est=${d(est)} far from $exact=${l(exact)}")
    }
    assert(math.abs(d("est_inter") - l("n_inter_exact")) <= 0.6 * l("n_inter_exact"))
    // structural invariants of the merged-sketch estimators
    assert(d("est_union") >= math.max(d("est_a"), d("est_b")) - 1e-9 ||
      l("n_union_exact") < 64)
    assert(d("est_inter") <= d("est_union") + 1e-9)
    // under-k degeneration: a condition with < k distinct values is exact
    val small = graft.ops.Sketch.kmvSetOps(li.limit(40), "l_partkey",
      col("l_quantity") >= 0, col("l_quantity") >= 0, k = 64).collect().head
    assert(small.getAs[Double]("est_a") === small.getAs[Long]("n_a_exact").toDouble)
    assert(small.getAs[Double]("est_inter") === small.getAs[Long]("n_inter_exact").toDouble)
  }

  test("tf-idf ranks at most 3 terms per doc, deterministically") {
    val df = AnalyticsQueries.defs("q_tf_idf").fn(spark, sf0001)
    val perDoc = df.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 3))
    val r1 = df.collect().toSeq
    val r2 = AnalyticsQueries.defs("q_tf_idf").fn(spark, sf0001).collect().toSeq
    assert(r1 === r2)
  }

  test("Bloom membership: zero false negatives, FP rate inside the formula band") {
    val rows = AnalyticsQueries.defs("q_bloom_membership").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // the defining guarantee: a member is NEVER reported absent
    rows.foreach { r =>
      if (r.getAs[Boolean]("in_build")) assert(r.getAs[Boolean]("in_bloom"),
        s"false negative for ${r.get(0)}")
      assert(r.getAs[Boolean]("is_fp") ===
        (r.getAs[Boolean]("in_bloom") && !r.getAs[Boolean]("in_build")))
    }
    val negatives = rows.count(r => !r.getAs[Boolean]("in_build"))
    val fps = rows.count(_.getAs[Boolean]("is_fp"))
    if (negatives > 100) {
      // (1 - e^(-jn/m))^j with n = build cardinality; generous 3x envelope
      val n = rows.count(_.getAs[Boolean]("in_build"))
      val p = math.pow(1 - math.exp(-3.0 * n / 1024), 3)
      assert(fps.toDouble / negatives <= 3 * p + 0.02,
        s"FP rate ${fps.toDouble / negatives} vs expected $p")
    }
  }

  test("Bloom packed-bitmap Aggregator matches the relational bit set exactly") {
    import org.apache.spark.sql.functions.udaf
    val (m, j) = (1024, 3)
    val ev = Tables.events(spark, sf0001).select(col("user_id"))
    val bitmap = ev
      .agg(udaf(new graft.ops.Sketch.BloomAgg(m, j))
        .apply(col("user_id").cast("string")).as("bits"))
      .collect().head.getSeq[Long](0).toArray
    // identical set bits as the relational DISTINCT-positions form
    val relBits = graft.ops.Sketch.bloomBits(ev, "user_id", m, j)
      .collect().map(_.getLong(0)).toSet
    val packedBits = (0 until m).filter(p =>
      (bitmap(p >> 6) & (1L << (p & 63))) != 0).map(_.toLong).toSet
    assert(packedBits === relBits)
    // merge invariance: partials OR to the same filter
    val shuffled = ev.repartition(13)
      .agg(udaf(new graft.ops.Sketch.BloomAgg(m, j))
        .apply(col("user_id").cast("string")).as("bits"))
      .collect().head.getSeq[Long](0).toArray
    assert(shuffled.toSeq === bitmap.toSeq)
    // membership verdicts equal the relational report for every probe key
    val report = graft.ops.Sketch.bloomMembership(
        ev, "user_id", Tables.customer(spark, sf0001).select(col("c_custkey")),
        "c_custkey", m, j)
      .collect().map(r => r.getAs[Long]("c_custkey") -> r.getAs[Boolean]("in_bloom"))
    report.foreach { case (k, verdict) =>
      assert(graft.ops.Sketch.BloomAgg.contains(bitmap, k.toString, j, m) === verdict)
    }
  }

  test("Misra-Gries: exact when vocab fits; summary never exceeds k") {
    import spark.implicits._
    val items = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val got = items.toDF("item").repartition(3)
      .agg(graft.functions.MisraGries.mg(col("item"), 8).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("Misra-Gries guarantees hold under pressure for every partitioning") {
    import spark.implicits._
    import graft.ops.TextOps
    // zipf-ish: term t_i with frequency 200/i over 40 terms
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    val n = rows.size.toLong
    val k = 8
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 13)) {
      val mg = rows.toDF("item").repartition(parts)
        .agg(graft.functions.MisraGries.mg(col("item"), k).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.term"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mg.size <= k)
      // undercount only, and by at most n/(k+1)
      mg.foreach { case (t, est) =>
        assert(est <= exact(t) && (exact(t) - est) * (k + 1) <= n)
      }
      // every true heavy hitter is present
      exact.foreach { case (t, c) =>
        if (c * (k + 1) > n) assert(mg.contains(t), s"missing heavy hitter $t")
      }
    }
    // the declared report shape over real tokens: booleans all true
    val rep = graft.ops.Sketch.mgHeavyHitters(
        docs.select(explode(TextOps.tokens(col("text"))).as("item")),
        "item", k = 28)
      .collect()
    assert(rep.nonEmpty && rep.forall(_.getAs[Boolean]("within_bound")))
  }

  test("graft_mg is SQL-callable and equal to the Column API path") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    Seq("x", "y", "x", "z", "x", "y").toDF("item").createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      "SELECT graft_mg(item, 2) AS mg FROM mg_in").collect().head.toString
    val viaCol = Seq("x", "y", "x", "z", "x", "y").toDF("item")
      .agg(graft.functions.MisraGries.mg(col("item"), 2).as("mg"))
      .collect().head.toString
    assert(viaSql === viaCol)
  }
}
