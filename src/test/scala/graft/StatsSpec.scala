package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Graph, Stats}

/** Closed-form fixtures for the statistical-testing tier: every expected
  * number below is hand-derivable (or a 4-line arithmetic script), so a
  * failure localizes to the operator, not the fixture.
  */
class StatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("welchTTest matches the closed-form t and Satterthwaite df") {
    val df = (Seq((1, 0), (2, 0), (3, 0), (4, 0)) ++ Seq((2, 1), (4, 1), (6, 1), (9, 1)))
      .map { case (v, arm) => ("g", arm, v.toDouble) }
      .toDF("grp", "arm", "value")
    val r = Stats.welchTTest(df, "grp", "arm", "value").collect().head
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("mean_a") === 2.5 && r.getAs[Double]("mean_b") === 5.25)
    assert(r.getAs[Double]("t_welch") === -1.6906)
    assert(r.getAs[Double]("df_welch") === 4.0836)
  }

  test("welchTTest yields NULL t/df (not an ANSI error) on a 1-row arm") {
    val df = Seq(("g", 0, 1.0), ("g", 0, 2.0), ("g", 1, 5.0))
      .toDF("grp", "arm", "value")
    val r = Stats.welchTTest(df, "grp", "arm", "value").collect().head
    assert(r.isNullAt(r.fieldIndex("t_welch")))
    assert(r.isNullAt(r.fieldIndex("df_welch")))
    // zero pooled variance (constant arms) also short-circuits to NULL
    val const = Seq(("g", 0, 3.0), ("g", 0, 3.0), ("g", 1, 3.0), ("g", 1, 3.0))
      .toDF("grp", "arm", "value")
    val c = Stats.welchTTest(const, "grp", "arm", "value").collect().head
    assert(c.isNullAt(c.fieldIndex("t_welch")))
  }

  test("ksTwoSample finds the exact sup-CDF gap") {
    val df = (Seq(1, 2, 3, 4).map((_, 0)) ++ Seq(3, 4, 5, 6).map((_, 1)))
      .map { case (v, arm) => ("g", arm, v.toDouble) }
      .toDF("grp", "arm", "value")
    val r = Stats.ksTwoSample(df, "grp", "arm", "value").collect().head
    assert(r.getAs[Double]("ks_d") === 0.5)
    // identical samples -> D = 0
    val same = Seq(1, 2, 3).flatMap(v => Seq((v, 0), (v, 1)))
      .map { case (v, arm) => ("g", arm, v.toDouble) }
      .toDF("grp", "arm", "value")
    assert(Stats.ksTwoSample(same, "grp", "arm", "value")
      .collect().head.getAs[Double]("ks_d") === 0.0)
  }

  private def ev(user: Long, day: Int, typ: String): (Long, Timestamp, String, Long) =
    (user, Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00"), typ, user * 100 + day)

  test("kaplanMeier reproduces the textbook product-limit curve") {
    // durations/events: (2,evt) (2,cens) (5,evt) (7,cens)
    // S(2)=3/4=0.75, S(5)=0.75*1/2=0.375, S(7)=0.375 (censor only)
    val rows = Seq(
      ev(1, 0, "view"), ev(1, 2, "purchase"),
      ev(2, 0, "view"), ev(2, 2, "click"),
      ev(3, 0, "view"), ev(3, 5, "purchase"),
      ev(4, 0, "view"), ev(4, 7, "click"))
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val out = Stats.kaplanMeier(df, "purchase").orderBy("dur_days").collect()
    assert(out.map(r => (r.getAs[Long]("dur_days"), r.getAs[Long]("n_at_risk"),
      r.getAs[Long]("n_events"), r.getAs[Double]("survival"))).toSeq ===
      Seq((2L, 4L, 1L, 0.75), (5L, 2L, 1L, 0.375), (7L, 1L, 0L, 0.375)))
  }

  test("kaplanMeier hits exactly 0.0 when the last step kills all remaining") {
    val rows = Seq(ev(1, 0, "view"), ev(1, 3, "purchase"))
    val out = Stats.kaplanMeier(rows.toDF("user_id", "ts", "event_type", "event_id"),
      "purchase").collect()
    assert(out.map(_.getAs[Double]("survival")).toSeq === Seq(0.0))
  }

  test("markovTransitions conditions on the current state") {
    val rows = Seq(ev(1, 0, "a"), ev(1, 1, "b"), ev(1, 2, "a"),
      ev(2, 0, "a"), ev(2, 1, "b"))
    val out = Stats.markovTransitions(
        rows.toDF("user_id", "ts", "event_type", "event_id"))
      .orderBy("cur", "nxt").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
      r.getAs[Double]("p"))).toSeq ===
      Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("chiSquareIndependence matches the hand-computed 2x2 statistic") {
    // cells: (r1,c1)=10 (r1,c2)=20 (r2,c1)=20 (r2,c2)=10 -> e=15 each,
    // chi2 = 4 * 25/15 = 6.6667, dof = 1
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(20)(("r2", "c1")) ++ Seq.fill(10)(("r2", "c2"))
    val df = rows.toDF("r", "c")
    val out = Stats.chiSquareIndependence(df, col("r"), col("c")).collect().head
    assert(out.getAs[Long]("n_cells") === 4L)
    assert(out.getAs[Long]("dof") === 1L)
    assert(out.getAs[Double]("chi2") === 6.6667)
  }

  test("gini: 0 for equal values, 2/3 for one-holder concentration") {
    val eq = Seq(1.0, 1.0, 1.0).map(("g", _)).toDF("grp", "value")
    assert(Stats.gini(eq, "grp", "value").collect().head.getAs[Double]("gini") === 0.0)
    val conc = Seq(0.0, 0.0, 10.0).map(("g", _)).toDF("grp", "value")
    assert(Stats.gini(conc, "grp", "value").collect().head.getAs[Double]("gini") === 0.666667)
  }

  test("cohensKappa: 1.0 on perfect agreement, 0.5 on the classic 3/4 case") {
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("actual", "pred")
    assert(Stats.cohensKappa(perfect, "actual", "pred")
      .collect().head.getAs[Double]("kappa") === 1.0)
    // agree=3/4, marginals actual (2,2) pred (3,1): pe = (6+2)/16 = 0.5
    val mixed = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "a"))
      .toDF("actual", "pred")
    val r = Stats.cohensKappa(mixed, "actual", "pred").collect().head
    assert(r.getAs[Double]("po") === 0.75 && r.getAs[Double]("pe") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.5)
  }

  test("spearman: +1 on monotone, -1 on reversed, tie-robust") {
    def mk(y: Seq[Double]) = y.zipWithIndex
      .map { case (yv, i) => ("g", (i + 1).toDouble, yv) }.toDF("grp", "x", "y")
    assert(Stats.spearman(mk(Seq(10, 20, 30, 40)), "grp", "x", "y")
      .collect().head.getAs[Double]("rho") === 1.0)
    assert(Stats.spearman(mk(Seq(40, 30, 20, 10)), "grp", "x", "y")
      .collect().head.getAs[Double]("rho") === -1.0)
    // y ties: ranks (1, 2.5, 2.5, 4) vs x (1,2,3,4) -> rho = 0.9487 (4dp)
    val rho = Stats.spearman(mk(Seq(10, 20, 20, 30)), "grp", "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(math.abs(rho - 0.948683) < 1e-6, rho.toString)
  }

  test("mannKendall: monotone series maxes S; constant series zeroes out") {
    def mk(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (m, d) => ("g", d, m) }.toDF("grp", "d", "m")
    val up = Stats.mannKendall(mk(Seq(1, 2, 3, 4, 5)), "grp", "d", "m").collect().head
    assert(up.getAs[Long]("s_stat") === 10L) // all 10 pairs concordant
    assert(up.getAs[Double]("var_s") === 16.666667) // 5*4*15/18
    assert(up.getAs[Double]("z_mk") === 2.2045) // 9/sqrt(var)
    val flat = Stats.mannKendall(mk(Seq(3, 3, 3, 3)), "grp", "d", "m").collect().head
    assert(flat.getAs[Long]("s_stat") === 0L)
    assert(flat.getAs[Double]("var_s") === 0.0) // tie correction cancels all
    assert(flat.getAs[Double]("z_mk") === 0.0)
  }

  test("theilSen: exact slope on linear data, middle-rank median on even pairs") {
    def mk(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (m, d) => ("g", d, m) }.toDF("grp", "d", "m")
    val lin = Stats.theilSen(mk(Seq(0, 2, 4, 6)), "grp", "d", "m").collect().head
    assert(lin.getAs[Long]("n_pairs") === 6L)
    assert(lin.getAs[Double]("ts_slope") === 2.0)
    // m = d^2 -> slopes [1,2,3,3,4,5]; middle ranks 3,4 -> (3+3)/2 = 3
    val quad = Stats.theilSen(mk(Seq(0, 1, 4, 9)), "grp", "d", "m").collect().head
    assert(quad.getAs[Double]("ts_slope") === 3.0)
  }

  test("bradleyTerry: 4:1 smoothed wins hit the exact 1.6e6/0.4e6 fixed point") {
    // w_a=3, w_b=0 -> smoothed 4:1; MLE ratio 4 with mean 1e6 is exactly
    // (1.6e6, 0.4e6), reached after one round and stable thereafter
    val m = Seq(("A", "B", 3L, 0L)).toDF("p_a", "p_b", "w_a", "w_b")
    val out = Stats.bradleyTerry(m, rounds = 3).orderBy("player").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("bt_micro"))).toSeq ===
      Seq(("A", 1600000L), ("B", 400000L)))
    // symmetric record -> both stay at exactly the 1e6 mean
    val even = Seq(("A", "B", 2L, 2L)).toDF("p_a", "p_b", "w_a", "w_b")
    assert(Stats.bradleyTerry(even, rounds = 3).collect()
      .map(_.getAs[Long]("bt_micro")).toSeq === Seq(1000000L, 1000000L))
    // transitive 3-player arena ranks A > B > C
    val tri = Seq(("A", "B", 8L, 2L), ("B", "C", 8L, 2L), ("A", "C", 9L, 1L))
      .toDF("p_a", "p_b", "w_a", "w_b")
    val s = Stats.bradleyTerry(tri, rounds = 3).orderBy("player").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("bt_micro")).toMap
    assert(s("A") > s("B") && s("B") > s("C"), s.toString)
  }

  test("fixture bounds: gini/ks/spearman/kappa land in their ranges") {
    import graft.sources.Tables
    import org.apache.spark.sql.functions.get_json_object
    val ev = Tables.events(spark, sf0001)
    val armed = ev.withColumn("arm", Stats.hashBucket(col("user_id"), 2))
    Stats.gini(ev, "event_type", "value").collect().foreach { r =>
      val g = r.getAs[Double]("gini"); assert(g >= 0.0 && g < 1.0, r.toString)
    }
    Stats.ksTwoSample(armed, "event_type", "arm", "value").collect().foreach { r =>
      val d = r.getAs[Double]("ks_d"); assert(d >= 0.0 && d <= 1.0, r.toString)
    }
    Stats.spearman(ev.select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("kv")),
      "event_type", "value", "kv").collect().foreach { r =>
      val rho = r.getAs[Double]("rho"); assert(rho >= -1.0 && rho <= 1.0, r.toString)
    }
  }

  test("determinism: welch/gini/bt results are partitioning-invariant") {
    import graft.sources.Tables
    val ev = Tables.events(spark, sf0001)
    val armed = ev.withColumn("arm", Stats.hashBucket(col("user_id"), 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.head, df.columns.tail: _*).collect().toSeq
    assert(rows(Stats.welchTTest(armed, "event_type", "arm", "value")) ===
      rows(Stats.welchTTest(armed.repartition(7), "event_type", "arm", "value")))
    assert(rows(Stats.gini(ev, "event_type", "value")) ===
      rows(Stats.gini(ev.repartition(7), "event_type", "value")))
  }

  test("bradleyTerry preserves the normalized mass up to per-player truncation") {
    val tri = Seq(("A", "B", 8L, 2L), ("B", "C", 8L, 2L), ("A", "C", 9L, 1L))
      .toDF("p_a", "p_b", "w_a", "w_b")
    val s = Stats.bradleyTerry(tri, rounds = 3).collect()
      .map(_.getAs[Long]("bt_micro"))
    val total = s.sum
    // each round renormalizes to k*1e6 with a truncating div per player:
    // total in (k*1e6 - k, k*1e6]
    assert(total <= 3000000L && total > 3000000L - 3, s.mkString(","))
  }

  test("bootstrapMeanCI: degenerate on constants, ordered interval on real data") {
    // constant column: every replica mean is the constant, so the interval
    // collapses to a point equal to the estimate
    val const = (1L to 200L).map(i => ("g", i, 7.5)).toDF("grp", "id", "v")
    val c = graft.ops.Stats.bootstrapMeanCI(const, "grp", "v", "id").collect().head
    assert(c.getAs[Double]("est") === 7.5)
    assert(c.getAs[Double]("ci_lo") === 7.5 && c.getAs[Double]("ci_hi") === 7.5)
    // fixture: interval is ordered and brackets the estimate
    import graft.sources.Tables
    graft.ops.Stats.bootstrapMeanCI(Tables.events(spark, sf0001),
      "event_type", "value", "event_id").collect().foreach { r =>
      val (lo, est, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("est"),
        r.getAs[Double]("ci_hi"))
      assert(lo <= hi, r.toString)
      assert(lo <= est && est <= hi, r.toString)
    }
  }

  test("splitConformal: coverage lands near the 90% guarantee; constants degenerate") {
    import graft.sources.Tables
    graft.ops.Stats.splitConformal(Tables.events(spark, sf0001),
      "event_type", "value", "event_id").collect().foreach { r =>
      val cov = r.getAs[Long]("cov_micro")
      // finite-sample conformal: the >=90% guarantee is in EXPECTATION over
      // splits; at sf0.001 each arm has only ~90 rows (std ~3%), so bound
      // at 4 sigma below — the sf0.01 oracle run exercises the tight case
      assert(cov >= 780000L && cov <= 1000000L, r.toString)
      assert(r.getAs[Double]("qhat") >= 0.0, r.toString)
    }
    // constant column: every score is 0, qhat = 0, coverage exactly 100%
    val const = (1L to 400L).map(i => ("g", i, 3.25)).toDF("grp", "id", "v")
    val c = graft.ops.Stats.splitConformal(const, "grp", "v", "id").collect().head
    assert(c.getAs[Double]("qhat") === 0.0 && c.getAs[Long]("cov_micro") === 1000000L)
  }

  test("dpNoisyCounts: noise bounded to ±8, deterministic, floor at zero") {
    import graft.sources.Tables
    val out = graft.ops.Stats.dpNoisyCounts(Tables.events(spark, sf0001), "event_type")
      .collect()
    out.foreach { r =>
      val (n, nz, ny) = (r.getAs[Long]("n"), r.getAs[Long]("noise"), r.getAs[Long]("n_noisy"))
      assert(nz >= -8 && nz <= 8, r.toString)
      assert(ny === math.max(n + nz, 0L), r.toString)
    }
    val again = graft.ops.Stats.dpNoisyCounts(Tables.events(spark, sf0001), "event_type")
      .collect()
    assert(out.map(_.toString).sorted === again.map(_.toString).sorted)
    // the CDF table covers the full 16-bit range and is monotone
    val cdf = graft.ops.Stats.DiscreteLaplaceCdf16
    assert(cdf.last._1 === 65536L && cdf.map(_._1) === cdf.map(_._1).sorted)
  }

  test("trimmedMean: shrugs off a planted outlier; exact on a hand fixture") {
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "id", "v")
    val r = graft.ops.Stats.trimmedMean(df, "grp", "v").collect().head
    // n=10, lo=1, hi=9: ranks 2..9 survive = values 2..9, mean 5.5 — the
    // 1000.0 outlier (and the 1.0 low end) are cut exactly
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("n_kept") === 8L)
    assert(r.getAs[Double]("trimmed_mean") === 5.5)
    // duplicate values straddling the cut: multiplicity math stays exact
    val dup = (Seq.fill(5)(1.0) ++ Seq.fill(5)(2.0)).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val d = graft.ops.Stats.trimmedMean(dup, "grp", "v").collect().head
    // lo=1, hi=9: keep 4x1.0 + 4x2.0 -> mean 1.5
    assert(d.getAs[Double]("trimmed_mean") === 1.5)
  }

  test("isotonicFit: pools the PAV violation exactly and stays monotone") {
    // accuracies [0.5, 0.0, 1.0]: PAV pools bins 0-1 to (1+0)/(2+2)=0.25
    val bins = Seq((0L, 2L, 1L), (1L, 2L, 0L), (2L, 2L, 2L))
      .toDF("bin", "n_docs", "n_en")
    val iso = graft.ops.Stats.isotonicFit(bins, "bin", "n_en", "n_docs")
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(iso === Array((0L, 250000L), (1L, 250000L), (2L, 1000000L)))
    // already-monotone input is a fixed point
    val mono = Seq((0L, 4L, 1L), (1L, 4L, 2L), (2L, 4L, 4L))
      .toDF("bin", "n_docs", "n_en")
    val fix = graft.ops.Stats.isotonicFit(mono, "bin", "n_en", "n_docs")
      .orderBy("bin").collect().map(_.getLong(1))
    assert(fix === Array(250000L, 500000L, 1000000L))
    // monotone non-decreasing on the real declared bins
    val out = SparkEntry.queries("q_isotonic")(spark, sf0001)
      .orderBy("bin").collect().map(_.getAs[Long]("iso_micro"))
    assert(out.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), out.mkString(","))
  }

  test("rankingMetrics: perfect, disjoint, and single-hit rankings") {
    import graft.ops.Similarity
    val idcg = Similarity.idcgMicro(3)
    val rel = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("qid", "nid")
    def sys(rows: (Long, Long, Long)*) = rows.toSeq.toDF("qid", "nid", "rn")
    // system == ideal: every metric is exactly 1
    val perfect = Similarity.rankingMetrics(rel,
      sys((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)), idcg).collect().head
    assert(perfect.getAs[Double]("recall") === 1.0)
    assert(perfect.getAs[Double]("mrr") === 1.0)
    assert(perfect.getAs[Double]("ndcg") === 1.0)
    // disjoint system: all zeros (MRR's no-hit branch)
    val miss = Similarity.rankingMetrics(rel,
      sys((1L, 90L, 1L), (1L, 91L, 2L), (1L, 92L, 3L)), idcg).collect().head
    assert(miss.getAs[Double]("recall") === 0.0)
    assert(miss.getAs[Double]("mrr") === 0.0)
    assert(miss.getAs[Double]("ndcg") === 0.0)
    // one relevant doc at system rank 2: mrr = 1/2, dcg = gain(2) = 630930
    val one = Similarity.rankingMetrics(rel,
      sys((1L, 90L, 1L), (1L, 11L, 2L), (1L, 91L, 3L)), idcg).collect().head
    assert(one.getAs[Double]("mrr") === 0.5)
    val expNdcg = BigDecimal(630930.0 / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one.getAs[Double]("ndcg") === expNdcg)
  }

  test("adamicAdar scores the open wedge and drops adjacent pairs") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Graph.adamicAdar(path).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("id_a") === 1L && r.getAs[Long]("id_b") === 3L)
    assert(r.getAs[Long]("n_common") === 1L)
    assert(r.getAs[Double]("aa_score") === 1.442695) // 1/ln(2)
    // a closed triangle has no non-adjacent pair -> empty
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Graph.adamicAdar(tri).isEmpty)
  }
}
