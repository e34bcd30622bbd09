package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Exact.dec
import graft.ops.Stats
import graft.sources.Tables

/** Statistical-testing / drift-detection tier: the checks a data pipeline
  * runs before trusting a new corpus drop or an experiment readout —
  * A/B significance (Welch), distribution drift (two-sample KS,
  * chi-square independence), labeler agreement (Cohen's kappa),
  * value-concentration (Gini), survival/lifetime (Kaplan-Meier), event
  * sequence structure (Markov transitions), rank correlation (Spearman),
  * and partition-skew diagnostics (hash-shard balance).
  *
  * The two-arm queries split users with the portable md5 bucket hash
  * (the q_sample_hash idiom) so both engines assign identical arms.
  * Oracle SQL mirrors each double expression tree verbatim (FIXTURES.md).
  */
object StatsQueries {

  /** DuckDB twin of `Stats.hashBucket`. */
  private def armSql(c: String, mod: Int) =
    s"('0x'||substr(md5(CAST($c AS VARCHAR)),1,4))::BIGINT % $mod"

  /** Daily mean value per event_type (day index from a fixed epoch, mean
    * from an exact decimal sum) — the trend tests' input series. */
  private def dailyMeans(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("2024-01-01")))).as("d"))
      .agg((round(sum(dec(col("value"), 12, 6)), 6).cast("double")
        / count(lit(1))).as("m"))

  private val DailySqlFragment =
    """daily AS (SELECT event_type,
      |            datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
      |            CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6))), 6) AS DOUBLE)/COUNT(*) AS m
      |          FROM events GROUP BY 1, 2)""".stripMargin

  /** Daily mean in truncating integer MICRO-units — the correlation /
    * forecast-error queries need per-day values whose power sums are
    * exact longs, not doubles. */
  private def dailyMicro(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("2024-01-01")))).as("d"))
      .agg(call_function("div",
        (round(sum(dec(col("value"), 12, 6)), 6) * 1000000).cast("long"),
        count(lit(1))).as("mm"))

  private val DailyMicroSqlFragment =
    """daily AS (SELECT event_type,
      |            datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
      |            CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6))), 6)*1000000 AS BIGINT)
      |              // COUNT(*) AS mm
      |          FROM events GROUP BY 1, 2)""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // Welch's unequal-variance t-test per event_type between two
    // hash-assigned user arms — the A/B readout for "did the new data
    // recipe move the metric". Moments from exact decimal power sums.
    "q_ab_ttest" -> QueryDef.sql(
      (s, dir) => Stats.welchTTest(
          Tables.events(s, dir).withColumn("arm", Stats.hashBucket(col("user_id"), 2)),
          "event_type", "arm", "value")
        .orderBy("event_type"),
      s"""WITH e AS (SELECT event_type, ${armSql("user_id", 2)} AS arm,
         |             CAST(value AS DECIMAL(12,6)) AS v FROM events),
         |g AS (SELECT event_type,
         |        COUNT(*) FILTER (WHERE arm=0) AS n_a,
         |        COUNT(*) FILTER (WHERE arm=1) AS n_b,
         |        CAST(ROUND(SUM(v) FILTER (WHERE arm=0), 6) AS DOUBLE) AS s1a,
         |        CAST(ROUND(SUM(v) FILTER (WHERE arm=1), 6) AS DOUBLE) AS s1b,
         |        CAST(ROUND(SUM(v*v) FILTER (WHERE arm=0), 6) AS DOUBLE) AS s2a,
         |        CAST(ROUND(SUM(v*v) FILTER (WHERE arm=1), 6) AS DOUBLE) AS s2b
         |      FROM e GROUP BY 1)
         |SELECT event_type, n_a, n_b,
         |  ROUND(s1a/n_a, 4) AS mean_a, ROUND(s1b/n_b, 4) AS mean_b,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    CASE WHEN ((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b > 0 THEN
         |      ROUND((s1a/n_a - s1b/n_b)
         |        / sqrt(((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b), 4)
         |    END END AS t_welch,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    CASE WHEN ((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b > 0 THEN
         |      ROUND((((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b)
         |          * (((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b)
         |          / ((((s2a - s1a*s1a/n_a)/(n_a-1))/n_a)*(((s2a - s1a*s1a/n_a)/(n_a-1))/n_a)/(n_a-1)
         |           + (((s2b - s1b*s1b/n_b)/(n_b-1))/n_b)*(((s2b - s1b*s1b/n_b)/(n_b-1))/n_b)/(n_b-1)), 4)
         |    END END AS df_welch
         |FROM g ORDER BY event_type""".stripMargin,
      doc = "Welch t-test + Satterthwaite df per event_type between hash arms"),

    // Power analysis over the same Welch moments: minimum detectable
    // effect at 95% confidence / 80% power (z sum 2.801585), absolute and
    // relative to the pooled mean — the "could this split even see the
    // lift?" readout that belongs next to every t-test verdict.
    "q_ab_power" -> QueryDef.sql(
      (s, dir) => Stats.abPowerMde(
          Tables.widen(Tables.events(s, dir)
              .select(col("event_type"), col("user_id"), col("value")), "user_id")
            .withColumn("arm", Stats.hashBucket(col("user_id"), 2)),
          "event_type", "arm", "value")
        .orderBy("event_type"),
      s"""WITH e AS (SELECT event_type, ${armSql("user_id", 2)} AS arm,
         |             CAST(value AS DECIMAL(12,6)) AS v FROM events),
         |g AS (SELECT event_type,
         |        COUNT(*) FILTER (WHERE arm=0) AS n_a,
         |        COUNT(*) FILTER (WHERE arm=1) AS n_b,
         |        CAST(ROUND(SUM(v) FILTER (WHERE arm=0), 6) AS DOUBLE) AS s1a,
         |        CAST(ROUND(SUM(v) FILTER (WHERE arm=1), 6) AS DOUBLE) AS s1b,
         |        CAST(ROUND(SUM(v*v) FILTER (WHERE arm=0), 6) AS DOUBLE) AS s2a,
         |        CAST(ROUND(SUM(v*v) FILTER (WHERE arm=1), 6) AS DOUBLE) AS s2b
         |      FROM e GROUP BY 1)
         |SELECT event_type, n_a, n_b,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    CASE WHEN ((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b > 0 THEN
         |      ROUND(CAST(2.801585 AS DOUBLE)
         |        * sqrt(((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b), 6)
         |    END END AS mde_abs,
         |  CASE WHEN n_a > 1 AND n_b > 1 THEN
         |    CASE WHEN ((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b > 0 THEN
         |      CASE WHEN abs((s1a + s1b)/CAST(n_a + n_b AS DOUBLE)) > 0 THEN
         |        ROUND(CAST(2.801585 AS DOUBLE)
         |          * sqrt(((s2a - s1a*s1a/n_a)/(n_a-1))/n_a + ((s2b - s1b*s1b/n_b)/(n_b-1))/n_b)
         |          / abs((s1a + s1b)/CAST(n_a + n_b AS DOUBLE)), 6)
         |      END END END AS mde_rel
         |FROM g ORDER BY event_type""".stripMargin,
      doc = "minimum detectable effect (95% conf / 80% power) per " +
        "event_type from the Welch moment aggregates"),

    // Two-sample Kolmogorov-Smirnov drift statistic per event_type
    // between the same hash arms: max |F_a - F_b| over running integer
    // CDFs — the standard "did the value distribution shift" gate.
    "q_ks_test" -> QueryDef.sql(
      (s, dir) => Stats.ksTwoSample(
          Tables.events(s, dir).withColumn("arm", Stats.hashBucket(col("user_id"), 2)),
          "event_type", "arm", "value")
        .orderBy("event_type"),
      s"""WITH e AS (SELECT event_type, value, ${armSql("user_id", 2)} AS arm FROM events),
         |cells AS (SELECT event_type, value AS val,
         |            COUNT(*) FILTER (WHERE arm=0) AS ca,
         |            COUNT(*) FILTER (WHERE arm=1) AS cb
         |          FROM e GROUP BY 1, 2),
         |cum AS (SELECT event_type,
         |          CAST(SUM(ca) OVER t AS BIGINT) AS n_a,
         |          CAST(SUM(cb) OVER t AS BIGINT) AS n_b,
         |          CAST(SUM(ca) OVER w AS BIGINT) AS ra,
         |          CAST(SUM(cb) OVER w AS BIGINT) AS rb
         |        FROM cells WINDOW
         |          t AS (PARTITION BY event_type),
         |          w AS (PARTITION BY event_type ORDER BY val
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |d AS (SELECT event_type, n_a, n_b,
         |        CASE WHEN n_a > 0 AND n_b > 0 THEN
         |          abs(CAST(ra AS DOUBLE)/n_a - CAST(rb AS DOUBLE)/n_b) END AS d FROM cum)
         |SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b, ROUND(MAX(d), 6) AS ks_d
         |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin,
      doc = "two-sample KS drift statistic per event_type between hash arms"),

    // Kaplan-Meier user-lifetime curve: duration = days between a user's
    // first and last event, "death" = the user ever purchased, otherwise
    // right-censored. Survival product via a RUNNING sum of ln terms.
    "q_kaplan_meier" -> QueryDef.sql(
      (s, dir) => Stats.kaplanMeier(Tables.events(s, dir), "purchase")
        .orderBy("dur_days"),
      """WITH ps AS (SELECT user_id,
        |              datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS dur_days,
        |              MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS evt
        |            FROM events GROUP BY 1),
        |bd AS (SELECT dur_days, COUNT(*) AS n_subjects,
        |         CAST(SUM(evt) AS BIGINT) AS n_events FROM ps GROUP BY 1),
        |r AS (SELECT dur_days, n_subjects, n_events,
        |        CAST(SUM(n_subjects) OVER ()
        |          - COALESCE(SUM(n_subjects) OVER (ORDER BY dur_days
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        |      FROM bd),
        |t AS (SELECT *, CAST(n_at_risk - n_events AS DOUBLE)/n_at_risk AS term FROM r)
        |SELECT dur_days, n_at_risk, n_events,
        |  CAST(n_subjects - n_events AS BIGINT) AS n_censored,
        |  CASE WHEN MIN(term) OVER cum = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE ROUND(EXP(SUM(LN(NULLIF(term, 0.0))) OVER cum), 6) END AS survival
        |FROM t
        |WINDOW cum AS (ORDER BY dur_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY dur_days""".stripMargin,
      doc = "Kaplan-Meier survival over user activity spans (purchase = event)"),

    // First-order Markov transition matrix over per-user event sequences:
    // P(next event type | current) — the sequence-structure profile.
    "q_markov_transitions" -> QueryDef.sql(
      (s, dir) => Stats.markovTransitions(Tables.events(s, dir))
        .orderBy("cur", "nxt"),
      """WITH s AS (SELECT event_type AS cur,
        |             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |           FROM events),
        |c AS (SELECT cur, nxt, COUNT(*) AS n FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  ROUND(CAST(n AS DOUBLE)/CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
        |FROM c ORDER BY cur, nxt""".stripMargin,
      doc = "per-user event-sequence Markov transition counts + probabilities"),

    // Chi-square independence of event_type x day-of-week (day index mod 7
    // from a fixed epoch — identical integer arithmetic on both engines,
    // no calendar-function quirk). Single-row statistic.
    "q_chi_square" -> QueryDef.sql(
      (s, dir) => Stats.chiSquareIndependence(Tables.events(s, dir),
          col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))) % 7)
        .orderBy("n_cells"),
      """WITH cell AS (SELECT event_type AS r,
        |                datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS c,
        |                COUNT(*) AS o
        |              FROM events GROUP BY 1, 2),
        |wt AS (SELECT r, c, o,
        |         CAST(SUM(o) OVER (PARTITION BY r) AS BIGINT) AS rt,
        |         CAST(SUM(o) OVER (PARTITION BY c) AS BIGINT) AS ct,
        |         CAST(SUM(o) OVER () AS BIGINT) AS n
        |       FROM cell),
        |t AS (SELECT (o - CAST(rt*ct AS DOUBLE)/n) * (o - CAST(rt*ct AS DOUBLE)/n)
        |               / (CAST(rt*ct AS DOUBLE)/n) AS term, r, c FROM wt)
        |SELECT COUNT(*) AS n_cells,
        |  CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT) AS dof,
        |  CAST(ROUND(SUM(CAST(ROUND(term, 10) AS DECIMAL(28,10))), 4) AS DOUBLE) AS chi2
        |FROM t ORDER BY n_cells""".stripMargin,
      doc = "chi-square independence of event_type x day-of-week"),

    // Gini concentration of value per event_type from exact rank-weighted
    // decimal sums — the source-balance / inequality diagnostic.
    "q_gini" -> QueryDef.sql(
      (s, dir) => Stats.gini(Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type"),
      """WITH cells AS (SELECT event_type, value AS val, COUNT(*) AS c
        |               FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, val, c,
        |        CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY val
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rr
        |      FROM cells),
        |g AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(ROUND(SUM(CAST(val AS DECIMAL(12,6))
        |          * ((rr - c + 1)*c + (c*(c-1))//2)), 6) AS DOUBLE) AS swx,
        |        CAST(ROUND(SUM(CAST(val AS DECIMAL(12,6)) * c), 6) AS DOUBLE) AS sx
        |      FROM r GROUP BY 1)
        |SELECT event_type, n, ROUND((2.0*swx - (n+1)*sx)/(n*sx), 6) AS gini
        |FROM g ORDER BY event_type""".stripMargin,
      doc = "Gini coefficient of value per event_type (exact tie-run rank sums " +
        "over (value,count) cells — no raw-row sort)"),

    // Cohen's kappa between the stopword-heuristic language guess and the
    // labeled lang column — chance-corrected labeler agreement. The
    // heuristic only emits {en,de,fr,es}, the labels include zh; kappa is
    // over the union class space (inner-joined marginals).
    "q_cohens_kappa" -> QueryDef.sql(
      (s, dir) => {
        // one fused scan for all four scores (TextOps.langScores)
        val sc = graft.ops.TextOps.langScores(col("text"))
        def score(i: Int) = sc.getItem(i).cast("long")
        val labeled = Tables.documents(s, dir).select(
            col("lang").as("actual"),
            score(0).as("en_score"),
            score(1).as("de_score"),
            score(2).as("fr_score"),
            score(3).as("es_score"))
          .withColumn("pred",
            when(col("en_score") >= col("de_score") && col("en_score") >= col("fr_score")
              && col("en_score") >= col("es_score"), "en")
            .when(col("de_score") >= col("fr_score") && col("de_score") >= col("es_score"), "de")
            .when(col("fr_score") >= col("es_score"), "fr")
            .otherwise("es"))
        Stats.cohensKappa(labeled, "actual", "pred").orderBy("n")
      },
      {
        def re(ws: Seq[String]) = "\\b(" + ws.mkString("|") + ")\\b"
        s"""WITH sc AS (SELECT lang AS actual,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEn)}')) AS en_score,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsDe)}')) AS de_score,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsFr)}')) AS fr_score,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEs)}')) AS es_score
           |      FROM documents),
           |l AS (SELECT actual,
           |        CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
           |             WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
           |             WHEN fr_score >= es_score THEN 'fr' ELSE 'es' END AS pred
           |      FROM sc),
           |tot AS (SELECT COUNT(*) AS n, COUNT(*) FILTER (WHERE actual = pred) AS agree FROM l),
           |ba AS (SELECT actual AS cls, COUNT(*) AS na FROM l GROUP BY 1),
           |bp AS (SELECT pred AS cls, COUNT(*) AS np FROM l GROUP BY 1),
           |ch AS (SELECT CAST(SUM(na*np) AS BIGINT) AS sp FROM ba JOIN bp USING (cls))
           |SELECT n, agree,
           |  ROUND(CAST(agree AS DOUBLE)/n, 6) AS po,
           |  ROUND(CAST(sp AS DOUBLE)/(n*n), 6) AS pe,
           |  ROUND((CAST(agree AS DOUBLE)/n - CAST(sp AS DOUBLE)/(n*n))
           |      / (1.0 - CAST(sp AS DOUBLE)/(n*n)), 6) AS kappa
           |FROM tot, ch ORDER BY n""".stripMargin
      },
      doc = "Cohen's kappa: lang-id heuristic vs labeled lang"),

    // Hash-shard balance report: rows per 32-way portable-hash shard plus
    // the skew ratio vs the uniform share — the partition-skew diagnostic
    // you run before picking a distribution key at scale.
    "q_shard_skew" -> QueryDef.sql(
      (s, dir) => Tables.events(s, dir)
        .withColumn("shard", Stats.hashBucket(col("event_id"), 32))
        .groupBy("shard").agg(count(lit(1)).as("n_rows"))
        .withColumn("skew_ratio", round(col("n_rows").cast("double") * 32
          / sum("n_rows").over(Window.partitionBy(lit(1))).cast("double"), 6))
        .orderBy("shard"),
      s"""WITH s AS (SELECT ${armSql("event_id", 32)} AS shard FROM events),
         |g AS (SELECT shard, COUNT(*) AS n_rows FROM s GROUP BY 1)
         |SELECT shard, n_rows,
         |  ROUND(CAST(n_rows AS DOUBLE) * 32 / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS skew_ratio
         |FROM g ORDER BY shard""".stripMargin,
      doc = "rows + skew ratio per portable-hash shard (partition balance)"),

    // Pre-join fan-out diagnostic: per-key |left|x|right| output volume for
    // the events⋈orders user key, top-10 by product + share of the total —
    // the report read BEFORE picking broadcast/salting for a join. Two
    // partial-agg count tables meet on an equi-join; the total enters as a
    // one-row broadcast; top-10 is TakeOrderedAndProject.
    "q_join_fanout" -> QueryDef.sql(
      (s, dir) => {
        val l = Tables.events(s, dir).groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("nl"))
        val r = Tables.orders(s, dir).groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("nr"))
        val prod = l.join(r, "k")
          .select(col("k"), col("nl"), col("nr"), (col("nl") * col("nr")).as("fanout"))
        prod.crossJoin(broadcast(prod.agg(sum("fanout").as("t"))))
          .select(col("k"), col("nl"), col("nr"), col("fanout"),
            call_function("div", col("fanout") * 1000000L, col("t")).as("share_micro"))
          .orderBy(col("fanout").desc, col("k")).limit(10)
      },
      """WITH l AS (SELECT user_id AS k, COUNT(*) AS nl FROM events GROUP BY 1),
        |r AS (SELECT o_custkey AS k, COUNT(*) AS nr FROM orders GROUP BY 1),
        |p AS (SELECT k, nl, nr, nl*nr AS fanout FROM l JOIN r USING (k)),
        |t AS (SELECT CAST(SUM(fanout) AS BIGINT) AS t FROM p)
        |SELECT k, nl, nr, fanout, (fanout * 1000000) // t AS share_micro
        |FROM p, t ORDER BY fanout DESC, k LIMIT 10""".stripMargin,
      doc = "top-10 join fan-out keys (|left|x|right| per key + share) — " +
        "the skew report read before picking a join strategy"),

    // Out-of-order arrival audit per event_type: how often an event's ts
    // regresses against the user's previous ARRIVAL (event_id order), and
    // by how much — the measurement that sizes a streaming watermark.
    "q_ooo_audit" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, dir)
          .select(col("event_type"), col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("t"))
          .withColumn("pt", lag("t", 1).over(w))
          .groupBy("event_type").agg(
            count(lit(1)).as("n"),
            count(when(col("pt") > col("t"), 1)).as("n_ooo"),
            coalesce(max(when(col("pt") > col("t"), col("pt") - col("t"))),
              lit(0L)).as("max_regress_us"))
          .withColumn("ooo_micro",
            call_function("div", col("n_ooo") * 1000000L, col("n")))
          .orderBy("event_type")
      },
      """WITH e AS (SELECT event_type, user_id, event_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |l AS (SELECT event_type, t,
        |        LAG(t) OVER (PARTITION BY user_id ORDER BY event_id) AS pt
        |      FROM e),
        |g AS (SELECT event_type, COUNT(*) AS n,
        |        CAST(COUNT(CASE WHEN pt > t THEN 1 END) AS BIGINT) AS n_ooo,
        |        COALESCE(MAX(CASE WHEN pt > t THEN pt - t END), 0) AS max_regress_us
        |      FROM l GROUP BY 1)
        |SELECT event_type, n, n_ooo, max_regress_us,
        |  (n_ooo * 1000000) // n AS ooo_micro
        |FROM g ORDER BY event_type""".stripMargin,
      doc = "out-of-order event-time audit per type (inversion rate vs " +
        "arrival order + worst regression) — the watermark-sizing input"),

    // Bradley-Terry arena ranking: event types as "players", one match
    // per user per type pair (winner = the user's larger exact total
    // value), 3 Zermelo/MM fixed-point rounds in integer micro-units —
    // the chatbot-arena-style pairwise-preference fit. The corpus
    // collapses to a players²-bounded win matrix in one partial-agg pass.
    "q_bt_arena" -> QueryDef.sql(
      (s, dir) => {
        val ut = Tables.events(s, dir).groupBy(col("user_id"), col("event_type"))
          .agg((round(sum(dec(col("value"), 12, 6)), 6) * 1000000).cast("long").as("v"))
        val matches = ut.select(col("user_id"), col("event_type").as("p_a"), col("v").as("va"))
          .join(ut.select(col("user_id"), col("event_type").as("p_b"), col("v").as("vb")),
            Seq("user_id"))
          .filter(col("p_a") < col("p_b"))
          .groupBy("p_a", "p_b").agg(
            sum(when(col("va") > col("vb"), 1L).otherwise(0L)).as("w_a"),
            sum(when(col("vb") > col("va"), 1L).otherwise(0L)).as("w_b"))
        Stats.bradleyTerry(matches, rounds = 3).orderBy("player")
      },
      {
        val roundCtes = (1 to 3).map { r =>
          s"""d$r AS (SELECT dir.i, CAST(SUM((n*1000000000000)//(si.s+sj.s)) AS BIGINT) AS den
             |       FROM dir JOIN s${r - 1} si ON si.i = dir.i
             |                JOIN s${r - 1} sj ON sj.i = dir.j GROUP BY 1),
             |r$r AS (SELECT wt.i, (wi*1000000000000)//den AS sr FROM wt JOIN d$r ON d$r.i = wt.i),
             |s$r AS (SELECT i, (sr*(COUNT(*) OVER ()*1000000))//(SUM(sr) OVER ()) AS s FROM r$r)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH ut AS (SELECT user_id, event_type,
           |        CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6))), 6)*1000000 AS BIGINT) AS v
           |      FROM events GROUP BY 1, 2),
           |m AS (SELECT a.event_type AS pa, b.event_type AS pb,
           |        CAST(SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT) AS wa,
           |        CAST(SUM(CASE WHEN b.v > a.v THEN 1 ELSE 0 END) AS BIGINT) AS wb
           |      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
           |      GROUP BY 1, 2),
           |dir AS (SELECT pa AS i, pb AS j, wa+1 AS w, wa+wb+2 AS n FROM m
           |        UNION ALL SELECT pb, pa, wb+1, wa+wb+2 FROM m),
           |wt AS (SELECT i, CAST(SUM(w) AS BIGINT) AS wi, CAST(SUM(n) AS BIGINT) AS games
           |       FROM dir GROUP BY 1),
           |s0 AS (SELECT i, CAST(1000000 AS BIGINT) AS s FROM wt),
           |$roundCtes
           |SELECT wt.i AS player, games, wi AS wins_smoothed, CAST(s3.s AS BIGINT) AS bt_micro
           |FROM wt JOIN s3 ON s3.i = wt.i ORDER BY player""".stripMargin
      },
      doc = "Bradley-Terry arena strengths over per-user pairwise value " +
        "matchups (3 integer fixed-point MM rounds, add-one smoothed)"),

    // Mann-Kendall trend test per event_type over the daily-mean series:
    // exact integer S and tie-corrected variance, continuity-corrected z.
    // Pair volume is days^2 per type — bounded by the time range, not by
    // corpus rows (the daily pre-agg absorbs the scale).
    "q_mann_kendall" -> QueryDef.sql(
      (s, dir) => Stats.mannKendall(dailyMeans(s, dir), "event_type", "d", "m")
        .orderBy("event_type"),
      s"""WITH $DailySqlFragment,
         |pairs AS (SELECT a.event_type, a.m AS mi, b.m AS mj
         |          FROM daily a JOIN daily b
         |            ON a.event_type = b.event_type AND a.d < b.d),
         |s AS (SELECT event_type,
         |        CAST(SUM(CASE WHEN mj > mi THEN 1 WHEN mj < mi THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |      FROM pairs GROUP BY 1),
         |n AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
         |tie AS (SELECT event_type, CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie_adj
         |        FROM (SELECT event_type, m, COUNT(*) AS t FROM daily GROUP BY 1, 2)
         |        GROUP BY 1)
         |SELECT event_type, n_days, s_stat,
         |  ROUND(CAST(n_days*(n_days-1)*(2*n_days+5) - tie_adj AS DOUBLE)/18.0, 6) AS var_s,
         |  ROUND(CASE
         |    WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
         |      / sqrt(CAST(n_days*(n_days-1)*(2*n_days+5) - tie_adj AS DOUBLE)/18.0)
         |    WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
         |      / sqrt(CAST(n_days*(n_days-1)*(2*n_days+5) - tie_adj AS DOUBLE)/18.0)
         |    ELSE CAST(0 AS DOUBLE) END, 4) AS z_mk
         |FROM s JOIN n USING (event_type) JOIN tie USING (event_type)
         |ORDER BY event_type""".stripMargin,
      doc = "Mann-Kendall trend test (exact S, tie-corrected variance) over " +
        "daily mean value per event_type"),

    // Theil-Sen robust slope per event_type: median of pairwise slopes,
    // median taken by middle-rank selection (no engine percentile
    // interpolation parity risk).
    "q_theil_sen" -> QueryDef.sql(
      (s, dir) => Stats.theilSen(dailyMeans(s, dir), "event_type", "d", "m")
        .orderBy("event_type"),
      s"""WITH $DailySqlFragment,
         |sl AS (SELECT a.event_type, (b.m - a.m)/(b.d - a.d) AS slope
         |       FROM daily a JOIN daily b
         |         ON a.event_type = b.event_type AND a.d < b.d),
         |r AS (SELECT event_type, slope,
         |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         |        COUNT(*) OVER (PARTITION BY event_type) AS np
         |      FROM sl)
         |SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
         |  ROUND(SUM(CASE WHEN rn = (np+1)//2 OR rn = (np+2)//2 THEN slope END)
         |      / COUNT(CASE WHEN rn = (np+1)//2 OR rn = (np+2)//2 THEN 1 END), 6) AS ts_slope
         |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,
      doc = "Theil-Sen robust trend slope (median pairwise slope, middle-rank " +
        "median) over daily mean value per event_type"),

    // Deterministic Poisson bootstrap CI for the per-type mean value:
    // 32 replicas reweight each row by a Poisson(1) draw derived from
    // md5(event_id, replica) against Scala-computed CDF breakpoints both
    // engines receive as literals — "random" resampling, bit-reproducible.
    // Interval = 2nd/31st order statistic of the replica means (central
    // 93.75%). One constant-factor explode into a partial agg — no extra
    // shuffle rounds at any corpus size.
    "q_bootstrap_ci" -> QueryDef.sql(
      (s, dir) => Stats.bootstrapMeanCI(Tables.events(s, dir),
          "event_type", "value", "event_id").orderBy("event_type"),
      {
        // fixed-width lowercase hex compares byte-wise as the 32-bit value:
        // the ladder runs on string literals, no hex->int parse per draw
        val caseSql = Stats.PoissonCdf32.zipWithIndex
          .map { case (c, k) => f"WHEN h < '$c%08x' THEN $k" }.mkString(" ")
        s"""WITH r AS (SELECT event_type, value,
           |             md5(CAST(event_id AS VARCHAR)||'_'||CAST(j AS VARCHAR)) AS hx, j
           |           FROM events CROSS JOIN (SELECT unnest(range(0, 8)) AS j) lj),
           |hw AS (SELECT event_type, value, b,
           |         (CASE $caseSql ELSE 8 END) AS w
           |       FROM (SELECT event_type, value, j*4 + wq AS b,
           |               substr(hx, 1 + 8*wq, 8) AS h
           |             FROM r CROSS JOIN (SELECT unnest(range(0, 4)) AS wq) lw)),
           |g AS (SELECT event_type, b, CAST(SUM(w) AS BIGINT) AS sw,
           |        CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6)) * w), 6) AS DOUBLE) AS swx
           |      FROM hw GROUP BY 1, 2),
           |m AS (SELECT event_type, b, CASE WHEN sw > 0 THEN swx/sw END AS mb FROM g),
           |rk AS (SELECT event_type, mb,
           |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY mb NULLS LAST, b) AS rn FROM m),
           |ci AS (SELECT event_type, MIN(CASE WHEN rn = 2 THEN mb END) AS lo,
           |         MIN(CASE WHEN rn = 31 THEN mb END) AS hi FROM rk GROUP BY 1),
           |o AS (SELECT event_type, COUNT(*) AS n,
           |        CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6))), 6) AS DOUBLE)/COUNT(*) AS est
           |      FROM events GROUP BY 1)
           |SELECT o.event_type AS event_type, n, ROUND(est, 6) AS est,
           |  ROUND(lo, 6) AS ci_lo, ROUND(hi, 6) AS ci_hi
           |FROM o JOIN ci ON ci.event_type = o.event_type
           |ORDER BY o.event_type""".stripMargin
      },
      doc = "deterministic Poisson-bootstrap 93.75% CI for the per-type " +
        "mean (hash-derived weights, exact decimal sums, order-statistic interval)"),

    // Split-conformal calibration audit: hash-split cal/test arms, exact
    // calibration mean predictor, q̂ = ceil((n_cal+1)·0.9)-th order
    // statistic of |value−mean| selected over the distinct-score bucket
    // table (no row-level per-group sort), empirical test coverage in
    // integer micro-units — the distribution-free ≥90% guarantee, audited.
    "q_conformal" -> QueryDef.sql(
      (s, dir) => Stats.splitConformal(Tables.events(s, dir),
          "event_type", "value", "event_id").orderBy("event_type"),
      s"""WITH a AS (SELECT event_type, value,
         |             ${armSql("event_id", 2)} AS arm FROM events),
         |mu AS (SELECT event_type,
         |         CAST(ROUND(SUM(CAST(value AS DECIMAL(12,6))),6) AS DOUBLE)/COUNT(*) AS mu,
         |         CAST(COUNT(*) AS BIGINT) AS n_cal
         |       FROM a WHERE arm = 0 GROUP BY 1),
         |s AS (SELECT a.event_type, arm, abs(value - mu) AS sc, n_cal
         |      FROM a JOIN mu ON a.event_type = mu.event_type),
         |cb AS (SELECT event_type, sc, MIN(n_cal) AS n_cal, COUNT(*) AS c
         |       FROM s WHERE arm = 0 GROUP BY 1, 2),
         |cc AS (SELECT event_type, sc, n_cal,
         |         SUM(c) OVER (PARTITION BY event_type ORDER BY sc
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cb),
         |q AS (SELECT event_type, MIN(sc) AS qh, MIN(n_cal) AS n_cal FROM cc
         |      WHERE cum >= ((n_cal + 1) * 9 + 9) // 10 GROUP BY 1),
         |t AS (SELECT s.event_type, MIN(q.n_cal) AS n_cal,
         |        CAST(COUNT(*) AS BIGINT) AS n_test,
         |        CAST(COUNT(CASE WHEN s.sc <= q.qh THEN 1 END) AS BIGINT) AS n_in,
         |        MIN(q.qh) AS qh
         |      FROM s JOIN q ON s.event_type = q.event_type
         |      WHERE arm = 1 GROUP BY 1)
         |SELECT event_type, n_cal, n_test, ROUND(qh, 6) AS qhat,
         |  (n_in * 1000000) // n_test AS cov_micro
         |FROM t ORDER BY event_type""".stripMargin,
      doc = "split-conformal prediction interval (q-hat via bucket-table " +
        "order statistic) + empirical coverage audit per event_type"),

    // Reproducible discrete-Laplace (two-sided geometric, eps=0.5) noisy
    // counts — the DP count-release mechanism with a hash-seeded draw so
    // both engines add identical noise. CDF breakpoints are Scala-computed
    // literals (the q_bootstrap_ci idiom).
    "q_dp_counts" -> QueryDef.sql(
      (s, dir) => Stats.dpNoisyCounts(Tables.events(s, dir), "event_type")
        .orderBy("event_type"),
      {
        val caseSql = Stats.DiscreteLaplaceCdf16.init
          .map { case (c, k) => s"WHEN hv < $c THEN $k" }.mkString(" ")
        s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           |           FROM events GROUP BY 1),
           |h AS (SELECT event_type, n,
           |        ('0x'||substr(md5(event_type||'_dp'),1,4))::BIGINT AS hv FROM g)
           |SELECT event_type, n, CAST(nz AS BIGINT) AS noise,
           |  GREATEST(n + nz, 0) AS n_noisy
           |FROM (SELECT event_type, n, CASE $caseSql ELSE 8 END AS nz FROM h)
           |ORDER BY event_type""".stripMargin
      },
      doc = "discrete-Laplace (eps=0.5) noisy count release, hash-seeded " +
        "for reproducibility — the DP mechanism shape with engine parity"),

    // k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala 2007):
    // equivalence classes on the quasi-identifier (event_type, day), the
    // sensitive attribute is user_id. Per event_type: class count, rows in
    // classes smaller than k=10 (re-identification risk), the smallest
    // class, and the minimum l (distinct sensitive values in a class — a
    // class can be large yet expose everyone if all rows share one user).
    // Scale shape: two partial-agg groupBys — class table is bounded by QI
    // cardinality (types x days), never corpus-sized; all-integer output.
    "q_k_anonymity" -> QueryDef.sql(
      (s, dir) => {
        val cls = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("qi_day"))
          .agg(count(lit(1)).as("sz"), count_distinct(col("user_id")).as("l"))
        cls.groupBy("event_type").agg(
            count(lit(1)).as("n_classes"), sum("sz").as("n_rows"),
            count(when(col("sz") < 10, 1)).as("n_risk_classes"),
            coalesce(sum(when(col("sz") < 10, col("sz"))), lit(0L)).as("n_risk_rows"),
            min("sz").as("min_class"), min("l").as("min_l"))
          .withColumn("risk_micro",
            call_function("div", col("n_risk_rows") * 1000000L, col("n_rows")))
          .orderBy("event_type")
      },
      """WITH cls AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS qi_day,
        |        CAST(COUNT(*) AS BIGINT) AS sz,
        |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
        |      FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(SUM(sz) AS BIGINT) AS n_rows,
        |  CAST(COUNT(CASE WHEN sz < 10 THEN 1 END) AS BIGINT) AS n_risk_classes,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 10 THEN sz END), 0) AS BIGINT) AS n_risk_rows,
        |  MIN(sz) AS min_class, MIN(l) AS min_l,
        |  CAST((COALESCE(SUM(CASE WHEN sz < 10 THEN sz END), 0) * 1000000)
        |    // SUM(sz) AS BIGINT) AS risk_micro
        |FROM cls GROUP BY event_type ORDER BY event_type""".stripMargin,
      doc = "k-anonymity / l-diversity audit: per-type re-identification " +
        "risk over (event_type, day) quasi-identifier classes, sensitive " +
        "attribute user_id — the privacy gate before releasing a slice"),

    // Calibration reliability diagram for a score used as a gate: bin the
    // en-ness confidence (stopword-score ratio, an exact integer-division
    // rational in micro-units) into deciles and compare mean confidence
    // to observed accuracy (lang == 'en') per bin — the audit that tells
    // you whether "keep if p > 0.8" means what it claims before a
    // classifier filters a corpus. Per-doc confidences are exact longs,
    // so the bin sums are order-independent.
    "q_reliability_bins" -> QueryDef.sql(
      (s, dir) => {
        // one fused scan for all four scores (TextOps.langScores)
        val sc = graft.ops.TextOps.langScores(col("text"))
        def score(i: Int) = sc.getItem(i).cast("long")
        val scored = Tables.documents(s, dir).select(
          col("lang"), score(0).as("en"),
          (score(0) + score(1) + score(2) + score(3)).as("tot"))
        scored.select(
            call_function("div", col("en") * 10, col("tot") + 1).as("bin"),
            call_function("div", col("en") * 1000000L, col("tot") + 1).as("conf_micro"),
            when(col("lang") === "en", 1L).otherwise(0L).as("hit"))
          .groupBy("bin").agg(count(lit(1)).as("n_docs"),
            sum("hit").as("n_en"), sum("conf_micro").as("s_conf"))
          .select(col("bin"), col("n_docs"),
            round(col("s_conf").cast("double") / (col("n_docs") * lit(1000000.0)), 6).as("conf"),
            round(col("n_en").cast("double") / col("n_docs"), 6).as("acc"),
            round(abs(col("n_en").cast("double") / col("n_docs")
              - col("s_conf").cast("double") / (col("n_docs") * lit(1000000.0))), 6).as("gap"))
          .orderBy("bin")
      },
      {
        def re(ws: Seq[String]) = "\\b(" + ws.mkString("|") + ")\\b"
        s"""WITH sc AS (SELECT lang,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEn)}')) AS en,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsDe)}')) AS de,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsFr)}')) AS fr,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEs)}')) AS es
           |      FROM documents),
           |b AS (SELECT (en*10)//(en+de+fr+es+1) AS bin,
           |        (en*1000000)//(en+de+fr+es+1) AS conf_micro,
           |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS hit
           |      FROM sc),
           |g AS (SELECT bin, COUNT(*) AS n_docs, CAST(SUM(hit) AS BIGINT) AS n_en,
           |        CAST(SUM(conf_micro) AS BIGINT) AS s_conf
           |      FROM b GROUP BY 1)
           |SELECT bin, n_docs,
           |  ROUND(CAST(s_conf AS DOUBLE)/(n_docs * CAST(1000000 AS DOUBLE)), 6) AS conf,
           |  ROUND(CAST(n_en AS DOUBLE)/n_docs, 6) AS acc,
           |  ROUND(abs(CAST(n_en AS DOUBLE)/n_docs
           |      - CAST(s_conf AS DOUBLE)/(n_docs * CAST(1000000 AS DOUBLE))), 6) AS gap
           |FROM g ORDER BY bin""".stripMargin
      },
      doc = "calibration reliability bins: en-ness confidence deciles vs " +
        "observed lang=='en' accuracy (exact micro-unit confidences)"),

    // Isotonic calibration (PAV) of the reliability diagram via the exact
    // minimax identity fit(i) = max_{j<=i} min_{k>=i} mean(y_j..y_k) —
    // three self-joins over the <=10-row bin table (quadratic in BINS, not
    // rows), interval means micro-quantized before the min/max lattice so
    // the whole fit is integer-exact on both engines. Output monotone by
    // the minimax structure: the calibration map a gate would apply.
    "q_isotonic" -> QueryDef.sql(
      (s, dir) => {
        // one fused scan for all four scores (TextOps.langScores)
        val sc = graft.ops.TextOps.langScores(col("text"))
        def score(i: Int) = sc.getItem(i).cast("long")
        val scored = Tables.documents(s, dir).select(
          col("lang"), score(0).as("en"),
          (score(0) + score(1) + score(2) + score(3)).as("tot"))
        val bins = scored.select(
            call_function("div", col("en") * 10, col("tot") + 1).as("bin"),
            when(col("lang") === "en", 1L).otherwise(0L).as("hit"))
          .groupBy("bin").agg(count(lit(1)).as("n_docs"), sum("hit").as("n_en"))
        bins.join(Stats.isotonicFit(bins, "bin", "n_en", "n_docs"), "bin")
          .select(col("bin"), col("n_docs"),
            call_function("div", col("n_en") * 1000000L, col("n_docs")).as("acc_micro"),
            col("iso_micro"))
          .orderBy("bin")
      },
      {
        def re(ws: Seq[String]) = "\\b(" + ws.mkString("|") + ")\\b"
        s"""WITH sc AS (SELECT lang,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEn)}')) AS en,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsDe)}')) AS de,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsFr)}')) AS fr,
           |        len(regexp_extract_all(lower(text),'${re(graft.ops.TextOps.StopwordsEs)}')) AS es
           |      FROM documents),
           |g AS (SELECT (en*10)//(en+de+fr+es+1) AS bin, COUNT(*) AS n_docs,
           |        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
           |      FROM sc GROUP BY 1),
           |cum AS (SELECT bin,
           |          CAST(SUM(n_en) OVER (ORDER BY bin
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ce,
           |          CAST(SUM(n_docs) OVER (ORDER BY bin
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd
           |        FROM g),
           |c2 AS (SELECT bin, COALESCE(LAG(ce) OVER (ORDER BY bin), 0) AS pe,
           |          COALESCE(LAG(cd) OVER (ORDER BY bin), 0) AS pd FROM cum),
           |pairs AS (SELECT a.bin AS j, b.bin AS k,
           |            ((b.ce - a.pe) * 1000000) // (b.cd - a.pd) AS am
           |          FROM c2 a JOIN cum b ON a.bin <= b.bin),
           |mn AS (SELECT i.bin AS i, p.j, MIN(am) AS mn
           |       FROM pairs p JOIN g i ON p.j <= i.bin AND i.bin <= p.k
           |       GROUP BY 1, 2),
           |iso AS (SELECT i AS bin, CAST(MAX(mn) AS BIGINT) AS iso_micro
           |        FROM mn GROUP BY 1)
           |SELECT g.bin, g.n_docs, (g.n_en * 1000000) // g.n_docs AS acc_micro,
           |  iso_micro
           |FROM g JOIN iso USING (bin) ORDER BY bin""".stripMargin
      },
      doc = "isotonic (PAV) calibration of the reliability diagram via the " +
        "exact minimax identity over the bounded bin table"),

    // Exact 10%-trimmed mean per event_type: drop the lowest/highest
    // floor(n/10) observations, average the rest — selection over the
    // (type, value) cell table with straddle-aware multiplicities, the
    // cells-not-rows shape of q_gini/q_auc.
    "q_trimmed_mean" -> QueryDef.sql(
      (s, dir) => Stats.trimmedMean(Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type"),
      """WITH cells AS (SELECT event_type, value AS v, COUNT(*) AS c
        |               FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, v, c,
        |        CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |      FROM cells),
        |t AS (SELECT event_type, v, c, cum, n, n // 10 AS lo, n - n // 10 AS hi
        |      FROM w),
        |k AS (SELECT event_type, n, hi - lo AS nk, v,
        |        GREATEST(LEAST(cum, hi) - GREATEST(cum - c, lo), 0) AS keep
        |      FROM t)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(nk) AS BIGINT) AS n_kept,
        |  ROUND(CAST(ROUND(SUM(CAST(v AS DECIMAL(12,6)) * keep), 6) AS DOUBLE)
        |    / MAX(nk), 6) AS trimmed_mean
        |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin,
      doc = "exact 10%-trimmed mean per event_type over value cells " +
        "(straddle-aware multiplicities, no row-level sort)"),

    // Lead-lag cross-correlation: Pearson between the 'view' daily-mean
    // series and the 'purchase' series shifted by 0..7 days — the "does
    // engagement lead conversion, and by how much" diagnostic. Daily
    // means in truncating micro-units make every power sum exact (decimal
    // products per the spearman n^4 lesson); the positivity guard
    // compares integer variances, so no division can see a zero.
    "q_lead_lag_xcorr" -> QueryDef.sql(
      (s, dir) => {
        val d = dailyMicro(s, dir)
        val x = d.filter(col("event_type") === "view").select(col("d"), col("mm").as("x"))
        val y = d.filter(col("event_type") === "purchase")
          .select(col("d").as("dy"), col("mm").as("y"))
        val g = x.withColumn("lag", explode(sequence(lit(0), lit(7))))
          .join(y, col("dy") === col("d") + col("lag"))
          .groupBy("lag").agg(
            count(lit(1)).as("n_days"),
            sum(dec(col("x"), 19, 0)).as("sx"), sum(dec(col("y"), 19, 0)).as("sy"),
            sum(dec(col("x"), 19, 0) * dec(col("x"), 19, 0)).as("sxx"),
            sum(dec(col("y"), 19, 0) * dec(col("y"), 19, 0)).as("syy"),
            sum(dec(col("x"), 19, 0) * dec(col("y"), 19, 0)).as("sxy"))
        val vx = col("n_days") * col("sxx") - col("sx") * col("sx")
        val vy = col("n_days") * col("syy") - col("sy") * col("sy")
        g.select(col("lag").cast("long").as("lag"), col("n_days"),
            when(vx > 0 && vy > 0,
              round((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
                / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6)).as("r"))
          .orderBy("lag")
      },
      s"""WITH $DailyMicroSqlFragment,
         |x AS (SELECT d, mm AS x FROM daily WHERE event_type = 'view'),
         |y AS (SELECT d AS dy, mm AS y FROM daily WHERE event_type = 'purchase'),
         |p AS (SELECT l.lag, x.x, y.y
         |      FROM x CROSS JOIN (SELECT unnest(range(0, 8)) AS lag) l
         |      JOIN y ON y.dy = x.d + l.lag),
         |g AS (SELECT lag, COUNT(*) AS n_days, SUM(x) AS sx, SUM(y) AS sy,
         |        SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM p GROUP BY 1)
         |SELECT CAST(lag AS BIGINT) AS lag, n_days,
         |  CASE WHEN n_days*sxx - sx*sx > 0 AND n_days*syy - sy*sy > 0 THEN
         |    ROUND(CAST(n_days*sxy - sx*sy AS DOUBLE)
         |      / (sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE))
         |       * sqrt(CAST(n_days*syy - sy*sy AS DOUBLE))), 6)
         |  END AS r
         |FROM g ORDER BY lag""".stripMargin,
      doc = "lead-lag Pearson cross-correlation (view leads purchase, lags " +
        "0-7 days) over exact micro-unit daily means"),

    // Seasonal-naive forecast skill: MAE of the 7-day-ago forecast vs the
    // 1-day-ago persistence baseline, and their ratio (MASE-style) — the
    // "is there real weekly structure worth modeling" gate. Micro-unit
    // absolute errors sum exactly; the MASE guard is an integer
    // comparison so the ratio never divides by zero.
    "q_forecast_mase" -> QueryDef.sql(
      (s, dir) => {
        val d = dailyMicro(s, dir)
        val g = d
          .join(d.select(col("event_type"), (col("d") + 1).as("d"), col("mm").as("m1")),
            Seq("event_type", "d"))
          .join(d.select(col("event_type"), (col("d") + 7).as("d"), col("mm").as("m7")),
            Seq("event_type", "d"))
          .groupBy("event_type").agg(
            count(lit(1)).as("n_scored"),
            sum(abs(col("mm") - col("m7"))).as("ae7"),
            sum(abs(col("mm") - col("m1"))).as("ae1"))
        g.select(col("event_type"), col("n_scored"),
            round(col("ae7").cast("double") / (col("n_scored") * lit(1000000.0)), 6)
              .as("mae_seasonal"),
            round(col("ae1").cast("double") / (col("n_scored") * lit(1000000.0)), 6)
              .as("mae_naive"),
            when(col("ae1") > 0,
              round(col("ae7").cast("double") / col("ae1"), 6)).as("mase"))
          .orderBy("event_type")
      },
      s"""WITH $DailyMicroSqlFragment,
         |j AS (SELECT c.event_type, c.mm, p1.mm AS m1, p7.mm AS m7
         |      FROM daily c
         |      JOIN daily p1 ON p1.event_type = c.event_type AND p1.d = c.d - 1
         |      JOIN daily p7 ON p7.event_type = c.event_type AND p7.d = c.d - 7),
         |g AS (SELECT event_type, COUNT(*) AS n_scored,
         |        CAST(SUM(abs(mm - m7)) AS BIGINT) AS ae7,
         |        CAST(SUM(abs(mm - m1)) AS BIGINT) AS ae1 FROM j GROUP BY 1)
         |SELECT event_type, n_scored,
         |  ROUND(CAST(ae7 AS DOUBLE)/(n_scored * CAST(1000000 AS DOUBLE)), 6) AS mae_seasonal,
         |  ROUND(CAST(ae1 AS DOUBLE)/(n_scored * CAST(1000000 AS DOUBLE)), 6) AS mae_naive,
         |  CASE WHEN ae1 > 0 THEN ROUND(CAST(ae7 AS DOUBLE)/ae1, 6) END AS mase
         |FROM g ORDER BY event_type""".stripMargin,
      doc = "seasonal-naive (d-7) vs persistence (d-1) forecast MAE + " +
        "MASE-style ratio over micro-unit daily means"),

    // Spearman rank correlation between value and the JSON k prop per
    // event_type — exact via integer double-ranks (2*avg_rank is an
    // integer even under ties), so every power sum is an exact long.
    "q_spearman_corr" -> QueryDef.sql(
      (s, dir) => Stats.spearman(
          Tables.events(s, dir).select(col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("kv")),
          "event_type", "value", "kv")
        .orderBy("event_type"),
      """WITH b AS (SELECT event_type, value,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv FROM events),
        |r AS (SELECT event_type,
        |        2*RANK() OVER (PARTITION BY event_type ORDER BY value)
        |          + COUNT(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
        |        2*RANK() OVER (PARTITION BY event_type ORDER BY kv)
        |          + COUNT(*) OVER (PARTITION BY event_type, kv) - 1 AS ry
        |      FROM b),
        |g AS (SELECT event_type, COUNT(*) AS n,
        |        SUM(rx) AS sx, SUM(ry) AS sy,
        |        SUM(rx*rx) AS sxx, SUM(ry*ry) AS syy, SUM(rx*ry) AS sxy
        |      FROM r GROUP BY 1)
        |SELECT event_type, n,
        |  ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS rho
        |FROM g ORDER BY event_type""".stripMargin,
      doc = "Spearman rank correlation (value vs JSON k) via exact integer ranks")
  )
}
