package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps
import graft.ops.Exact.dec

/** Statistical testing / drift-detection operators for data pipelines:
  * A/B significance (Welch), distribution drift (two-sample KS, chi-square
  * independence), label agreement (Cohen's kappa), inequality (Gini),
  * survival (Kaplan-Meier), sequence structure (Markov transitions), and
  * rank correlation (Spearman via exact integer double-ranks).
  *
  * Determinism contract (FIXTURES.md): every sum that feeds a reported
  * number is either an exact integer/decimal aggregate or a *running*
  * window sum (sequential in a declared order on both engines); double
  * math happens once, in an expression tree mirrored verbatim in the
  * DuckDB oracle, then ROUND at declared scale.
  *
  * Scale notes: all shapes are one partial-agg shuffle to a small keyed
  * table (groups x arms, transition pairs, contingency cells, duration
  * days, hash shards) — never a corpus-sized window. The only unbounded-
  * partition windows run over those small keyed tables (<= days-in-range
  * or n-shards rows), not over raw rows.
  */
object Stats {

  /** Deterministic, engine-portable bucket assignment (the q_sample_hash
    * md5 idiom): DuckDB twin is
    * `('0x'||substr(md5(CAST(c AS VARCHAR)),1,4))::BIGINT % mod`. */
  def hashBucket(c: Column, mod: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % mod

  /** The exact per-arm moment accumulators behind [[welchTTest]] — also
    * the state of its streaming twin (all mergeable partial aggregates:
    * counts + decimal power sums rounded at scale 6). */
  private[graft] def welchAggs(armCol: String, valueCol: String): Seq[Column] = {
    val v = dec(col(valueCol), 12, 6)
    def arm(i: Int, c: Column) = when(col(armCol) === i, c)
    Seq(
      count(arm(0, lit(1))).as("n_a"), count(arm(1, lit(1))).as("n_b"),
      round(sum(arm(0, v)), 6).cast("double").as("s1a"),
      round(sum(arm(1, v)), 6).cast("double").as("s1b"),
      round(sum(arm(0, v * v)), 6).cast("double").as("s2a"),
      round(sum(arm(1, v * v)), 6).cast("double").as("s2b"))
  }

  /** The one double expression tree from moments to (means, t, df) —
    * shared verbatim by the batch query, the DuckDB oracle, and the
    * streaming twin. t/df are NULL unless both arms have n > 1 AND the
    * pooled standard error is positive; the guards nest OUTSIDE the
    * divisions so ANSI mode never evaluates a zero divisor (a streaming
    * window with a 1-row arm must yield a NULL verdict, not kill the
    * query). */
  private[graft] def welchSelect(keep: Seq[Column]): Seq[Column] = {
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("s1a") / na; val mb = col("s1b") / nb
    val va = (col("s2a") - col("s1a") * col("s1a") / na) / (na - 1)
    val vb = (col("s2b") - col("s1b") * col("s1b") / nb) / (nb - 1)
    val sea = va / na; val seb = vb / nb
    val enough = col("n_a") > 1 && col("n_b") > 1
    keep ++ Seq(col("n_a"), col("n_b"),
      round(ma, 4).as("mean_a"), round(mb, 4).as("mean_b"),
      when(enough, when(sea + seb > 0,
        round((ma - mb) / sqrt(sea + seb), 4))).as("t_welch"),
      when(enough, when(sea + seb > 0,
        round((sea + seb) * (sea + seb)
          / (sea * sea / (na - 1) + seb * seb / (nb - 1)), 4))).as("df_welch"))
  }

  /** A/B power analysis from the same Welch moments: the minimum
    * detectable effect at 95% confidence / 80% power — MDE = (z_{0.975} +
    * z_{0.80})·SE = 2.801585·sqrt(s²_a/n_a + s²_b/n_b) — absolute and
    * relative to the pooled mean. The experiment-design readout ("how
    * small a lift could this split even see?") that belongs next to every
    * t-test verdict; an experiment whose observed |Δ| sits under its MDE
    * was underpowered, not null. Same exact-decimal moment aggregates and
    * NULL guards as [[welchTTest]]; z literals shared by both engines. */
  def abPowerMde(df: DataFrame, groupCol: String, armCol: String,
                 valueCol: String): DataFrame = {
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val va = (col("s2a") - col("s1a") * col("s1a") / na) / (na - 1)
    val vb = (col("s2b") - col("s1b") * col("s1b") / nb) / (nb - 1)
    val sea = va / na; val seb = vb / nb
    val z = lit(2.801585) // z_{0.975} + z_{0.80}
    val pooled = (col("s1a") + col("s1b")) / (na + nb)
    val enough = col("n_a") > 1 && col("n_b") > 1
    df.groupBy(groupCol).agg(welchAggs(armCol, valueCol).head,
        welchAggs(armCol, valueCol).tail: _*)
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(enough, when(sea + seb > 0,
          round(z * sqrt(sea + seb), 6))).as("mde_abs"),
        when(enough, when(sea + seb > 0, when(abs(pooled) > 0,
          round(z * sqrt(sea + seb) / abs(pooled), 6)))).as("mde_rel"))
  }

  /** Welch's unequal-variance t-test per group between two arms
    * (armCol in {0,1}). Moments come from exact decimal power sums
    * (order-independent), rounded at scale 6 before the one double
    * expression computing t and the Welch-Satterthwaite df. */
  def welchTTest(df: DataFrame, groupCol: String, armCol: String,
                 valueCol: String): DataFrame =
    df.groupBy(groupCol).agg(welchAggs(armCol, valueCol).head,
        welchAggs(armCol, valueCol).tail: _*)
      .select(welchSelect(Seq(col(groupCol))): _*)

  /** Two-sample Kolmogorov-Smirnov D per group between two arms: the max
    * over sample points of |F_a - F_b|, with the empirical CDFs built from
    * running integer counts over the per-(group, value) cell table. D is a
    * max of per-row doubles — order-independent by construction. */
  def ksTwoSample(df: DataFrame, groupCol: String, armCol: String,
                  valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(valueCol).as("val")).agg(
      count(when(col(armCol) === 0, 1)).as("ca"),
      count(when(col(armCol) === 1, 1)).as("cb"))
    val run = Window.partitionBy(groupCol).orderBy("val")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCol)
    cells
      .withColumn("n_a", sum("ca").over(tot))
      .withColumn("n_b", sum("cb").over(tot))
      .withColumn("d", when(col("n_a") > 0 && col("n_b") > 0,
        abs(sum("ca").over(run).cast("double") / col("n_a")
          - sum("cb").over(run).cast("double") / col("n_b"))))
      .groupBy(groupCol)
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        round(max("d"), 6).as("ks_d"))
  }

  /** Kaplan-Meier survival over per-subject durations. A subject's
    * duration is days(first ts -> last ts); it counts as an event if it
    * ever emitted `eventType`, else right-censored at its last day. The
    * survival product is exp of a RUNNING sum of ln terms (sequential in
    * duration order on both engines => bit-identical); a step that kills
    * every remaining subject short-circuits to exactly 0.0 (no ln(0)). */
  def kaplanMeier(events: DataFrame, eventType: String): DataFrame = {
    val perSubj = events.groupBy("user_id").agg(
      datediff(to_date(max("ts")), to_date(min("ts"))).cast("long").as("dur_days"),
      max(when(col("event_type") === eventType, 1).otherwise(0)).as("evt"))
    val byDur = perSubj.groupBy("dur_days").agg(
      count(lit(1)).as("n_subjects"), sum("evt").as("n_events"))
    val all = Window.partitionBy(lit(1))
    val before = Window.partitionBy(lit(1)).orderBy("dur_days")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.partitionBy(lit(1)).orderBy("dur_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_at_risk",
        sum("n_subjects").over(all) - coalesce(sum("n_subjects").over(before), lit(0L)))
      .withColumn("term",
        (col("n_at_risk") - col("n_events")).cast("double") / col("n_at_risk"))
      .withColumn("survival",
        when(min("term").over(cum) === 0.0, 0.0)
          .otherwise(round(exp(sum(log(nullif(col("term"), lit(0.0)))).over(cum)), 6)))
      .select(col("dur_days"), col("n_at_risk"), col("n_events"),
        (col("n_subjects") - col("n_events")).as("n_censored"), col("survival"))
  }

  /** First-order Markov transition matrix over per-user event sequences
    * (ordered by ts, event_id tie-break): counts and row-conditional
    * probabilities P(next | cur). */
  def markovTransitions(events: DataFrame): DataFrame = {
    val seq0 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cnt = events
      .select(col("user_id"), col("event_type").as("cur"), col("ts"), col("event_id"))
      .withColumn("nxt", lead("cur", 1).over(seq0))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    cnt.withColumn("p",
      round(col("n").cast("double") / sum("n").over(Window.partitionBy("cur")), 6))
  }

  /** Pearson chi-square independence statistic over an r x c contingency
    * table of two categorical columns. Per-cell terms are irrational, so
    * the total routes through round(term, 10) -> DECIMAL(28,10) -> exact
    * sum (order-independent), then a final round. */
  def chiSquareIndependence(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val cells = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("o"))
    val withTot = cells
      .withColumn("rt", sum("o").over(Window.partitionBy("r")))
      .withColumn("ct", sum("o").over(Window.partitionBy("c")))
      .withColumn("n", sum("o").over(Window.partitionBy(lit(1))))
    val e = (col("rt") * col("ct")).cast("double") / col("n")
    val term = (col("o") - e) * (col("o") - e) / e
    withTot
      .agg(count(lit(1)).as("n_cells"),
        ((count_distinct(col("r")) - 1) * (count_distinct(col("c")) - 1)).as("dof"),
        round(sum(dec(round(term, 10), 28, 10)), 4).cast("double").as("chi2"))
  }

  /** Gini coefficient per group: G = (2*sum(i*x_(i)) - (n+1)*sum(x)) /
    * (n*sum(x)) over ascending ranks i — computed WITHOUT ranking raw
    * rows. Ties collapse to (value, count) cells first (partial-agg
    * groupBy), and a tie run starting at running-rank position s with c
    * copies contributes x * (s*c + c*(c-1)/2) exactly; the window then
    * scans distinct values, not rows — the same cells-not-rows shape as
    * the KS statistic, so a 100x row blow-up with a bounded value domain
    * costs one bigger partial agg, not a bigger sort. All sums are exact
    * decimals/longs. */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(valueCol).as("val"))
      .agg(count(lit(1)).as("c"))
    val run = Window.partitionBy(groupCol).orderBy("val")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankSum = (col("rr") - col("c") + 1) * col("c") +
      call_function("div", col("c") * (col("c") - 1), lit(2L))
    val g = cells
      .withColumn("rr", sum("c").over(run))
      .withColumn("wx", dec(col("val"), 12, 6) * rankSum)
      .groupBy(groupCol).agg(
        sum("c").as("n"),
        round(sum("wx"), 6).cast("double").as("swx"),
        round(sum(dec(col("val"), 12, 6) * col("c")), 6).cast("double").as("sx"))
    g.select(col(groupCol), col("n"),
      round((lit(2.0) * col("swx") - (col("n") + 1) * col("sx"))
        / (col("n") * col("sx")), 6).as("gini"))
  }

  /** Cohen's kappa between two label columns: (po - pe)/(1 - pe) with
    * observed agreement po and chance agreement pe from exact marginal
    * products. One-row x one-row scalar cross join at the end. */
  def cohensKappa(labeled: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val totals = labeled.agg(count(lit(1)).as("n"),
      count(when(col(actualCol) === col(predCol), 1)).as("agree"))
    val byActual = labeled.groupBy(col(actualCol).as("cls")).agg(count(lit(1)).as("na"))
    val byPred = labeled.groupBy(col(predCol).as("cls")).agg(count(lit(1)).as("np"))
    val chance = byActual.join(byPred, "cls").agg(sum(col("na") * col("np")).as("sp"))
    val po = col("agree").cast("double") / col("n")
    val pe = col("sp").cast("double") / (col("n") * col("n"))
    totals.crossJoin(chance).select(
      col("n"), col("agree"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** Spearman rank correlation per group between two numeric columns,
    * exactly: double-ranks 2*avg_rank = 2*min_rank + tie_count - 1 are
    * integers, so every power sum is exact (the q_auc rank-sum trick).
    * The sums are DECIMAL(38,0), not long — n*sum(r²) grows ~n⁴ and blows
    * Int64 past ~200k rows per group (the sf1x probe caught exactly
    * this); decimal128 holds to n ≈ 5e9 per group. DuckDB's SUM is
    * already HUGEINT, so the oracle just skips the BIGINT narrowing and
    * casts the final exact integers to double. */
  def spearman(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    // r15 (guide §2.4/§2.5): the old shape attached double-ranks with
    // row-level windows — rank() over (group ORDER BY c) plus a tie count
    // over (group, c) per column, i.e. FOUR corpus-row exchanges each
    // SORTED and serialized per event_type (5 single-task 0.6-0.7 s sorts
    // at sf0.1; at 100 TB a hot group is one straggler task). A row's
    // double-rank depends only on its (group, VALUE) bucket:
    //   rank2(v) = 2*min_rank(v) + ties(v) − 1
    //            = 2*cnt_le(v) − ties(v) + 1
    // so compute it once per DISTINCT value on the bounded bucket table
    // (one partially-aggregated groupBy + a window over buckets, not
    // rows — the q_auc cells-not-rows shape) and attach it back with a
    // null-safe equi-join that AQE broadcasts when the value table is
    // small. Shuffle work drops to two partial-agg bucket exchanges; no
    // corpus-row sort remains, and the per-group serialization is gone.
    def rankTable(c: String, rName: String) =
      df.groupBy(col(groupCol), col(c).as("__v"))
        .agg(count(lit(1)).as("__t"))
        .withColumn("__cum", sum(col("__t")).over(
          Window.partitionBy(groupCol).orderBy(col("__v"))))
        .select(col(groupCol).as("__g"), col("__v"),
          (lit(2L) * col("__cum") - col("__t") + 1).as(rName))
    val xr = rankTable(xCol, "rx")
    val yr = rankTable(yCol, "ry")
    // null-safe equality: a NULL value is its own rank bucket (the window
    // formulation ranked NULL rows too — nulls-first, same as the bucket
    // window's null-first ordering)
    val r = df
      .join(xr, df(groupCol) <=> xr("__g") && df(xCol) <=> xr("__v"))
      .drop(xr("__g")).drop(xr("__v"))
      .join(yr, df(groupCol) <=> yr("__g") && df(yCol) <=> yr("__v"))
      .drop(yr("__g")).drop(yr("__v"))
    val g = r.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(dec(col("rx"), 19, 0)).as("sx"), sum(dec(col("ry"), 19, 0)).as("sy"),
      sum(dec(col("rx"), 19, 0) * dec(col("rx"), 19, 0)).as("sxx"),
      sum(dec(col("ry"), 19, 0) * dec(col("ry"), 19, 0)).as("syy"),
      sum(dec(col("rx"), 19, 0) * dec(col("ry"), 19, 0)).as("sxy"))
    g.select(col(groupCol), col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
        .as("rho"))
  }

  /** All ordered index pairs (i < j) of a per-group series — the shared
    * input of the Mann-Kendall and Theil-Sen trend statistics. Pair volume
    * is days²/2 per group: bounded by the TIME RANGE (the series is a
    * pre-aggregated daily table), not by corpus rows, so a 100x row
    * blow-up over the same window costs only the daily pre-agg. */
  private def seriesPairs(series: DataFrame, groupCol: String,
                          idxCol: String, valCol: String): DataFrame =
    series.select(col(groupCol), col(idxCol).as("di"), col(valCol).as("mi"))
      .join(series.select(col(groupCol), col(idxCol).as("dj"), col(valCol).as("mj")),
        Seq(groupCol))
      .filter(col("di") < col("dj"))

  /** Mann-Kendall trend test per group over a (index, value) series:
    * S = sum of sign(m_j - m_i) over i<j (exact integer), tie-corrected
    * variance n(n-1)(2n+5) - sum t(t-1)(2t+5) over value-tie runs (exact
    * integer, /18 once in double), continuity-corrected z. Signs via CASE
    * comparisons — no engine sign() quirk. */
  def mannKendall(series: DataFrame, groupCol: String,
                  idxCol: String, valCol: String): DataFrame = {
    val sgn = when(col("mj") > col("mi"), 1L)
      .when(col("mj") < col("mi"), -1L).otherwise(0L)
    val sTab = seriesPairs(series, groupCol, idxCol, valCol)
      .groupBy(groupCol).agg(sum(sgn).as("s_stat"))
    val nTab = series.groupBy(groupCol).agg(count(lit(1)).as("n_days"))
    val tieTab = series.groupBy(col(groupCol), col(valCol)).agg(count(lit(1)).as("t"))
      .groupBy(groupCol)
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_adj"))
    val varS = (col("n_days") * (col("n_days") - 1) * (lit(2L) * col("n_days") + 5)
      - col("tie_adj")).cast("double") / lit(18.0)
    sTab.join(nTab, groupCol).join(tieTab, groupCol)
      .select(col(groupCol), col("n_days"), col("s_stat"),
        round(varS, 6).as("var_s"),
        round(when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") / sqrt(varS))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") / sqrt(varS))
          .otherwise(0.0), 4).as("z_mk"))
  }

  /** Split-conformal prediction interval + empirical coverage audit — the
    * distribution-free calibration check for any per-group predictor
    * (Vovk et al.; Angelopoulos & Bates 2022 tutorial form). The portable
    * md5 bucket splits rows into a calibration arm (0) and a test arm
    * (1); the predictor is the calibration mean (exact decimal sum);
    * nonconformity is |value − mean|; q̂ is the ⌈(n_cal+1)(1−α)⌉-th order
    * statistic of calibration scores (α = 1/alphaDenom); coverage is the
    * fraction of TEST scores ≤ q̂ in truncating integer micro-units —
    * finite-sample guaranteed ≥ 1−α in expectation, and this query is
    * the audit that it holds on real data.
    *
    * Scale shape: the order statistic is selected over the per-(group,
    * score) BUCKET table (one partial-agg groupBy, then a window over
    * distinct scores only — never a row-level per-group sort), the same
    * bounded-bucket prefix-sum selection q_auc uses; means and coverage
    * are plain partial-agg groupBys; the ≤#groups-row q̂ table rides a
    * broadcast join. Every comparison is between doubles both engines
    * computed identically (exact decimal mean, native abs/subtract). */
  def splitConformal(df: DataFrame, groupCol: String, valueCol: String,
                     idCol: String, alphaDenom: Int = 10): DataFrame = {
    require(alphaDenom >= 2, s"alphaDenom must be >= 2, got $alphaDenom")
    val armed = df.withColumn("__arm", hashBucket(col(idCol), 2))
    val mu = armed.filter(col("__arm") === 0).groupBy(groupCol)
      .agg((round(sum(dec(col(valueCol), 12, 6)), 6).cast("double")
        / count(lit(1))).as("mu"), count(lit(1)).as("n_cal"))
    val scored = armed.join(broadcast(mu), Seq(groupCol))
      .withColumn("__s", abs(col(valueCol) - col("mu")))
    // k-th smallest calibration score via cumulative counts over the
    // distinct-score bucket table; k = ceil((n_cal+1)(1-1/aD))
    val aD = alphaDenom.toLong
    val k = call_function("div",
      (col("n_cal") + 1L) * (aD - 1L) + (aD - 1L), lit(aD))
    val wcum = Window.partitionBy(groupCol).orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = scored.filter(col("__arm") === 0)
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("c"), min("n_cal").as("n_cal"))
      .withColumn("cum", sum("c").over(wcum))
      .filter(col("cum") >= k)
      .groupBy(groupCol).agg(min("__s").as("qh"), min("n_cal").as("n_cal"))
    scored.filter(col("__arm") === 1).drop("n_cal")
      .join(broadcast(qhat), Seq(groupCol))
      .groupBy(groupCol).agg(
        min("n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        count(when(col("__s") <= col("qh"), 1)).as("n_in"),
        min("qh").as("qh"))
      .select(col(groupCol), col("n_cal"), col("n_test"),
        round(col("qh"), 6).as("qhat"),
        call_function("div", col("n_in") * 1000000L, col("n_test")).as("cov_micro"))
  }

  /** Exact trimmed mean per group: drop the lowest and highest
    * ⌊n/trimDenom⌋ observations, average the rest — the outlier-robust
    * location estimate between the mean and the median. Selection runs
    * over the per-(group, value) CELL table with cumulative counts (the
    * q_gini / q_auc cells-not-rows shape): a cell straddling a trim
    * boundary contributes only its in-range multiplicity
    * min(cum, hi) − max(cum − c, lo), so no row-level per-group sort and
    * ties need no tiebreak. Sums are exact decimals. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimDenom: Int = 10): DataFrame = {
    require(trimDenom >= 3, s"trimDenom must be >= 3, got $trimDenom")
    val cells = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCol)
    cells
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("n", sum("c").over(tot))
      .withColumn("lo", call_function("div", col("n"), lit(trimDenom.toLong)))
      .withColumn("hi", col("n") - col("lo"))
      .withColumn("keep", greatest(
        least(col("cum"), col("hi")) - greatest(col("cum") - col("c"), col("lo")),
        lit(0L)))
      .groupBy(groupCol).agg(
        max("n").as("n"),
        max(col("hi") - col("lo")).as("n_kept"),
        round(sum(dec(col("v"), 12, 6) * col("keep")), 6).cast("double").as("s_kept"))
      .select(col(groupCol), col("n"), col("n_kept"),
        round(col("s_kept") / col("n_kept"), 6).as("trimmed_mean"))
  }

  /** Isotonic regression (PAV) over an ordered, BOUNDED bin table via the
    * exact minimax identity: fit(i) = max_{j≤i} min_{k≥i} mean(y_j..y_k)
    * — no iterative pool-adjacent merging, so the whole fit is three
    * self-joins over the ≤#bins-row table (quadratic only in the BIN
    * count, which the caller bounds by construction — deciles here).
    * Interval means are micro-quantized by truncating integer division
    * BEFORE the min/max lattice (both engines agree on integers; the fit
    * is isotonic regression of the micro-quantized means, stated as the
    * contract). Output is monotone non-decreasing in the bin order by the
    * minimax structure. Input: one row per bin with hit and total counts. */
  def isotonicFit(bins: DataFrame, binCol: String, hitCol: String,
                  totalCol: String): DataFrame = {
    val w = Window.orderBy(binCol) // unpartitioned over <= #bins rows
    val cum = bins
      .withColumn("ce", sum(hitCol).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cd", sum(totalCol).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val c2 = cum
      .withColumn("pe", coalesce(lag("ce", 1).over(w), lit(0L)))
      .withColumn("pd", coalesce(lag("cd", 1).over(w), lit(0L)))
    val pairs = c2.select(col(binCol).as("j"), col("pe"), col("pd"))
      .join(cum.select(col(binCol).as("k"), col("ce"), col("cd")),
        col("j") <= col("k"))
      .select(col("j"), col("k"), call_function("div",
        (col("ce") - col("pe")) * 1000000L, col("cd") - col("pd")).as("am"))
    pairs
      .join(bins.select(col(binCol).as("i")),
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min("am").as("mn"))
      .groupBy("i").agg(max("mn").as("iso_micro"))
      .withColumnRenamed("i", binCol)
  }

  /** Truncated two-sided-geometric (discrete Laplace) CDF breakpoints for
    * ε = 1/2, support −8..8, scaled to the 16-bit hash range — pmf(k) ∝
    * exp(−ε|k|), the discrete mechanism DP count releases use. Literals
    * shared by the Spark plan and the DuckDB oracle, so both engines draw
    * the identical noise for the same group key. */
  private[graft] val DiscreteLaplaceCdf16: Seq[(Long, Int)] = {
    val eps = 0.5
    val ws = (-8 to 8).map(k => math.exp(-eps * math.abs(k)))
    val total = ws.sum
    var cdf = 0.0
    (-8 to 8).zip(ws).map { case (k, w) =>
      cdf += w / total
      (math.min(math.round(cdf * 65536.0), 65536L), k)
    }
  }

  /** Reproducible discrete-Laplace noisy counts per group — the shape of
    * an (ε = 0.5, sensitivity 1) differentially-private count release,
    * with the noise draw derived from md5(group key) instead of a CSPRNG
    * so the release is bit-identical across engines and runs. NOT a
    * privacy guarantee as written (deterministic noise is inspectable);
    * swap [[hashBucket]]'s digest for a real random draw to make it one —
    * the mechanism, truncation bound, and calibration are the production
    * ones. One partial-agg groupBy; noise is a literal CDF CASE ladder. */
  def dpNoisyCounts(df: DataFrame, groupCol: String): DataFrame = {
    val h = conv(substring(md5(concat(col(groupCol).cast("string"),
      lit("_dp"))), 1, 4), 16, 10).cast("long")
    val noise = DiscreteLaplaceCdf16.init.reverse
      .foldLeft[Column](lit(8)) { case (els, (c, k)) => when(h < c, k).otherwise(els) }
    df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("noise", noise.cast("long"))
      .select(col(groupCol), col("n"), col("noise"),
        greatest(col("n") + col("noise"), lit(0L)).as("n_noisy"))
  }

  /** Poisson(1) CDF breakpoints scaled to the 32-bit hash range — the
    * deterministic multinomial stand-in for bootstrap resampling. Shared
    * as literals by the Spark plan and the DuckDB oracle, so "random"
    * weights are identical on both engines by construction. */
  private[graft] val PoissonCdf32: Seq[Long] = {
    var cdf = 0.0
    var term = math.exp(-1.0)
    (0 to 7).map { k =>
      if (k > 0) term /= k
      cdf += term
      math.round(cdf * 4294967296.0)
    }
  }

  /** Deterministic Poisson bootstrap CI for the per-group mean: each of
    * `reps` replicas reweights every row by a Poisson(1) draw derived
    * from md5(id, replica) — the classic streaming bootstrap
    * (resample-counts ~ Poisson(1) approximates multinomial resampling),
    * made engine-reproducible by hashing instead of RNG. Replica means
    * come from exact decimal weighted sums; the interval is the 2nd/31st
    * order statistic of the 32 replica means (central 93.75% percentile
    * interval — exact rank selection, no interpolation).
    *
    * Cost shape: ONE pass, no row blowup — each row projects its 8 md5
    * digests and 32 Poisson weights as columns, a single partial-agg
    * groupBy carries 64 accumulators (sum w_b, sum w_b·x per replica),
    * and `stack` unpivots the ≤#groups result rows to (group, replica)
    * for ranking. The earlier explode formulation pushed 32× the rows
    * through the aggregate hash probe for identical numbers (measured
    * 5.4 s → this at sf0.1); the per-replica sums are order-independent
    * exact decimals, so the restructuring is oracle-invariant. */
  def bootstrapMeanCI(df: DataFrame, groupCol: String, valueCol: String,
                      idCol: String, reps: Int = 32): DataFrame = {
    require(reps == 32, "rank-2/rank-31 interval is defined for 32 replicas")
    // one md5 per 4 replicas: the 128-bit digest splits into four 32-bit
    // draws (j = digest block, 8-hex word) — 4x less hashing than a
    // digest per replica, identical split in the oracle's substr. The
    // 4-per-digest replicas travel as COLUMNS (8 accumulators over a
    // reps/4-fold explode), not a reps-fold row blowup — wide enough to
    // cut the aggregate probes 4x, narrow enough to stay inside one
    // whole-stage-codegen method.
    // compare the 8-hex word AS A STRING against hex-formatted breakpoint
    // literals: fixed-width lowercase hex orders byte-wise exactly as the
    // 32-bit value, so the conv() hex->long parse (32 per row) disappears
    // from the hot loop on both engines
    def wCol(q: Int): Column = {
      val h = substring(col("__hx"), 1 + 8 * q, 8)
      PoissonCdf32.zipWithIndex.reverse
        .foldLeft[Column](lit(8L)) { case (els, (c, k)) =>
          when(h < lit(f"$c%08x"), k.toLong).otherwise(els) }
    }
    // scan-parallelism floor: 8 md5 digests per input row is the query's
    // dominant cost and ran single-task over the unsplittable fixture
    // scan. Project to the three consumed columns FIRST - widen stages the
    // rows it spreads, and staging the full-width table would lose the
    // column pruning.
    val withW = graft.sources.Tables.widen(
        df.select(col(groupCol), col(valueCol), col(idCol)), idCol)
      .withColumn("__j", explode(sequence(lit(0), lit(reps / 4 - 1))))
      .withColumn("__hx", md5(concat(col(idCol).cast("string"), lit("_"),
        col("__j").cast("string"))))
      .select(col(groupCol) +: col(valueCol) +: col("__j") +:
        (0 until 4).map(q => wCol(q).as(s"__w$q")): _*)
    val aggs = (0 until 4).flatMap { q => Seq(
      sum(col(s"__w$q")).as(s"__sw$q"),
      round(sum(dec(col(valueCol), 12, 6) * col(s"__w$q")), 6)
        .cast("double").as(s"__swx$q")) }
    val stackArgs = (0 until 4).map(q => s"$q, __sw$q, __swx$q").mkString(", ")
    val replicas = withW.groupBy(col(groupCol), col("__j")).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("__j"),
        expr(s"stack(4, $stackArgs) AS (wq, sw, swx)"))
      .withColumn("b", col("__j") * 4 + col("wq"))
      .withColumn("mb", when(col("sw") > 0, col("swx") / col("sw")))
    // explicit NULLS LAST: a replica whose weight sum is 0 has mb = NULL,
    // and Spark's default (NULLS FIRST asc) disagrees with DuckDB's
    // (NULLS LAST) — unreachable at fixture scale but pinned here so the
    // rank-2/rank-31 selection agrees by construction on both engines
    val ranked = replicas.withColumn("rn",
      row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("mb").asc_nulls_last, col("b"))))
    val overall = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      (round(sum(dec(col(valueCol), 12, 6)), 6).cast("double") / count(lit(1))).as("est"))
    overall.join(ranked.groupBy(groupCol).agg(
        min(when(col("rn") === 2, col("mb"))).as("lo"),
        min(when(col("rn") === 31, col("mb"))).as("hi")), groupCol)
      .select(col(groupCol), col("n"), round(col("est"), 6).as("est"),
        round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
  }

  /** Bradley-Terry arena ranking over pairwise match outcomes — the
    * model-eval "arena" fit: strengths s_i with P(i beats j) =
    * s_i/(s_i+s_j), estimated by `rounds` unrolled Zermelo/MM updates
    * s_i' = W_i / sum_j n_ij/(s_i+s_j), renormalized to mean 1e6 each
    * round. Everything runs in FIXED-POINT integer micro-units with
    * truncating division (all operands positive, so Spark-trunc and
    * DuckDB-floor agree) — the q_pagerank determinism contract, so an
    * unrolled-CTE oracle matches bit-for-bit. Input matches (p_a, p_b,
    * w_a, w_b) get add-one smoothing per direction, which keeps every
    * W_i > 0 and every denominator positive (no zero divisor under ANSI).
    * The per-round state is one row per player; matches are
    * players²-bounded, never corpus-bounded (the corpus collapses to the
    * win matrix in one partial-agg pass). */
  def bradleyTerry(matches: DataFrame, rounds: Int): DataFrame = {
    val Unit6 = 1000000L
    val Unit12 = 1000000000000L
    val sm = matches.select(col("p_a").as("i"), col("p_b").as("j"),
      (col("w_a") + 1).as("wij"), (col("w_b") + 1).as("wji"))
    val dir = sm.select(col("i"), col("j"), col("wij").as("w"),
        (col("wij") + col("wji")).as("n"))
      .union(sm.select(col("j").as("i"), col("i").as("j"), col("wji").as("w"),
        (col("wij") + col("wji")).as("n")))
    // wTot/nTab (players- / players²-bounded) are re-read every round, and
    // the per-round state `s` is referenced TWICE (the si and sj lookups):
    // unstaged, the lazy plan doubled per round — the r14 before-plan
    // inlined the corpus→win-matrix pipeline 200 times and q_bt_arena
    // spent its 3.2 s re-deriving it. Stage once + stage per round (the
    // Graph.connectedComponents lineage discipline); every staged table is
    // player-bounded, never corpus-bounded.
    val wTot = dir.groupBy("i").agg(sum("w").as("wi"), sum("n").as("games"))
      .staged()
    val nTab = dir.select("i", "j", "n").staged()
    val all = Window.partitionBy(lit(1))
    var s = wTot.select(col("i"), lit(Unit6).as("s"))
    for (_ <- 1 to rounds) {
      val den = nTab
        .join(s.select(col("i"), col("s").as("si")), "i")
        .join(s.select(col("i").as("j"), col("s").as("sj")), "j")
        .groupBy("i")
        .agg(sum(call_function("div", col("n") * Unit12, col("si") + col("sj"))).as("den"))
      val raw = wTot.join(den, "i")
        .select(col("i"), call_function("div", col("wi") * Unit12, col("den")).as("sr"))
      s = raw.select(col("i"),
        call_function("div",
          col("sr") * (count(lit(1)).over(all) * Unit6), sum("sr").over(all)).as("s"))
        .staged()
    }
    wTot.join(s, "i")
      .select(col("i").as("player"), col("games"), col("wi").as("wins_smoothed"),
        col("s").as("bt_micro"))
  }

  /** Theil-Sen robust trend slope per group: the median of all pairwise
    * slopes (m_j - m_i)/(d_j - d_i). The median is taken WITHOUT engine
    * percentile functions (interpolation parity risk): the two middle
    * ranks are summed and divided by their count — a 1- or 2-element
    * IEEE-commutative average, identical on both engines. */
  def theilSen(series: DataFrame, groupCol: String,
               idxCol: String, valCol: String): DataFrame = {
    val slopes = seriesPairs(series, groupCol, idxCol, valCol)
      .withColumn("slope", (col("mj") - col("mi")) / (col("dj") - col("di")))
    val ranked = slopes
      .withColumn("rn", row_number().over(Window.partitionBy(groupCol).orderBy("slope")))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(groupCol)))
    val mid = col("rn") === call_function("div", col("np") + 1, lit(2L)) ||
      col("rn") === call_function("div", col("np") + 2, lit(2L))
    ranked.groupBy(groupCol).agg(
      max("np").as("n_pairs"),
      round(sum(when(mid, col("slope"))) / count(when(mid, 1)), 6).as("ts_slope"))
  }
}
