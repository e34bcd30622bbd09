package graft.queries

import graft.core.Materialize.StageOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Exact.{dec, decSum, moneySum}
import graft.ops.{Dedup, TextOps}
import graft.sources.Tables

/** Second-wave analytics coverage: grouping sets, analytic window functions,
  * exact moment statistics, deterministic arg-min/max, conditional
  * aggregates, string/date scalar suites, hash-bucket sampling, TF-IDF and
  * z-score pipelines, and a portable-hash MinHash whose DuckDB oracle
  * reproduces the approximate algorithm bit-for-bit.
  *
  * Determinism conventions follow FIXTURES.md: decimal sums for anything
  * float-aggregated, struct-ordering tiebreaks for arg-extremes, ORDER BY on
  * a unique key, identical expression shape (same IEEE op order) on both
  * engines when double math is unavoidable.
  */
object AnalyticsQueries {

  // DuckDB shingle fragment shared with ExtensionQueries' Jaccard oracles.
  private val ShingleSqlFragment =
    """SELECT doc_id AS id,
      |  unnest(list_distinct([toks[i]||'_'||toks[i+1]||'_'||toks[i+2] for i in range(1, len(toks)-1)])) AS s
      |FROM (SELECT doc_id, regexp_extract_all(lower(text),'[a-z0-9]+') AS toks FROM documents)""".stripMargin

  private[queries] def minhashPortableOracle(numPerm: Int, rowsPerBand: Int, threshold: Double,
                                    maxBucket: Int,
                                    incrementalNewSql: Option[String] = None): String = {
    val (as, bs) = Dedup.permConsts(numPerm)
    val aList = as.mkString("[", ",", "]")
    val bList = bs.mkString("[", ",", "]")
    // incremental variant: the left join side is restricted to the NEW
    // batch (asymmetric join — no history×history pairs), so pairs are
    // normalized via LEAST/GREATEST instead of l.id < r2.id
    val candSql = incrementalNewSql match {
      case None =>
        """cand AS (SELECT DISTINCT l.id AS id_a, r2.id AS id_b
          |         FROM b l JOIN b r2 ON l.band = r2.band AND l.bk = r2.bk AND l.id < r2.id
          |         JOIN bsz ON bsz.band = l.band AND bsz.bk = l.bk),""".stripMargin
      case Some(newPred) =>
        s"""cand AS (SELECT DISTINCT LEAST(l.id, r2.id) AS id_a, GREATEST(l.id, r2.id) AS id_b
           |         FROM b l JOIN b r2 ON l.band = r2.band AND l.bk = r2.bk AND l.id <> r2.id
           |         JOIN bsz ON bsz.band = l.band AND bsz.bk = l.bk
           |         WHERE ${newPred.replace("?", "l.id")}),""".stripMargin
    }
    s"""WITH sh AS ($ShingleSqlFragment),
       |h AS (SELECT id, s, ('0x'||substr(md5(s),1,7))::BIGINT AS h FROM sh),
       |m AS (SELECT id, CAST(p AS INTEGER) AS p,
       |        MIN(($aList[CAST(p AS INTEGER)+1]*h + $bList[CAST(p AS INTEGER)+1]) % ${Dedup.MinhashPrime}) AS mh
       |      FROM h CROSS JOIN range($numPerm) r(p) GROUP BY id, p),
       |b AS (SELECT id, p//$rowsPerBand AS band, string_agg(mh::VARCHAR, ',' ORDER BY p) AS bk
       |      FROM m GROUP BY id, p//$rowsPerBand),
       |bsz AS (SELECT band, bk FROM b GROUP BY band, bk
       |        HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
       |$candSql
       |cnt AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
       |inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter
       |          FROM cand JOIN sh sa ON sa.id = cand.id_a
       |                    JOIN sh sb ON sb.id = cand.id_b AND sb.s = sa.s
       |          GROUP BY id_a, id_b),
       |j AS (SELECT id_a, id_b,
       |        ROUND(CAST(n_inter AS DOUBLE)/(ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
       |      FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for q_dedup_recall: both pair tiers replayed as derived tables
    * (nested WITHs scope their CTE names), joined by a full pair union.
    * Assembled with mkString, NOT an outer stripMargin — interpolating
    * already-stripped fragments into a stripMargin re-strips any line that
    * happens to start with '|' (the FIXTURES round-7 composition trap). */
  private def dedupRecallOracle: String = {
    val exactPairs = Seq(
      s"WITH sh AS ($ShingleSqlFragment),",
      "cnt AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),",
      "inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter",
      "          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2)",
      "SELECT id_a, id_b FROM inter JOIN cnt ca ON ca.id = id_a",
      "  JOIN cnt cb ON cb.id = id_b",
      "WHERE ROUND(CAST(n_inter AS DOUBLE)/(ca.n_sh + cb.n_sh - n_inter), 6) >= 0.5"
    ).mkString("\n")
    val mhPairs = minhashPortableOracle(numPerm = 32, rowsPerBand = 2,
      threshold = 0.5, maxBucket = 64)
    Seq(
      // n_exact = 0 must fail LOUDLY (DuckDB's `x // 0` is NULL, not an
      // error — FIXTURES division-guard rule): a broken ground-truth tier
      // would otherwise hash-match the Spark side's own NULL
      "SELECT CAST(SUM(ie) AS BIGINT) AS n_exact,",
      "  CAST(SUM(im) AS BIGINT) AS n_mh,",
      "  CAST(SUM(ie*im) AS BIGINT) AS n_both,",
      "  CAST(SUM((1-ie)*im) AS BIGINT) AS n_extra,",
      "  CAST(CASE WHEN COALESCE(SUM(ie), 0) = 0 THEN error('q_dedup_recall: exact tier returned no pairs')",
      "       ELSE (SUM(ie*im) * 1000000) // SUM(ie) END AS BIGINT) AS recall_micro",
      "FROM (SELECT id_a, id_b, MAX(ie) AS ie, MAX(im) AS im FROM (",
      s"  SELECT id_a, id_b, 1 AS ie, 0 AS im FROM ($exactPairs) ep",
      "  UNION ALL",
      s"  SELECT id_a, id_b, 0, 1 FROM ($mhPairs) mp",
      ") GROUP BY 1, 2)"
    ).mkString("\n")
  }

  /** DuckDB reproduction of `Dedup.simhashNearDupPairsPortable`: md5-derived
    * 64-bit signature as four 16-bit chunks, majority vote per bit, bucket
    * join per chunk with the hot-bucket cap, hamming verify via bit_count. */
  private[queries] def simhashPortableOracle(maxHamming: Int, maxBucket: Int): String = {
    val bitSums = (0 until 64).map { g =>
      val h = if (g < 32) "h1" else "h2"
      s"SUM(CASE WHEN ($h >> ${g % 32}) & 1 = 1 THEN 1 ELSE -1 END) AS b$g"
    }.mkString(",\n|        ")
    val chunkExprs = (0 until 4).map { c =>
      (0 until 16).map(k => s"(CASE WHEN b${c * 16 + k} > 0 THEN ${1L << k} ELSE 0 END)")
        .mkString("(", " + ", s")::BIGINT AS c$c")
    }.mkString(",\n|        ")
    val bandedSelects = (0 until 4)
      .map(c => s"SELECT id, c0, c1, c2, c3, $c AS chunk, c$c AS v FROM sig")
      .mkString("\n|        UNION ALL ")
    val hamExpr = (0 until 4).map(c => s"bit_count(xor(sa.c$c, sb.c$c))::BIGINT").mkString(" + ")
    s"""WITH sh AS ($ShingleSqlFragment),
       |h AS (SELECT id, ('0x'||substr(md5(s),1,8))::BIGINT AS h1,
       |        ('0x'||substr(md5(s),9,8))::BIGINT AS h2 FROM sh),
       |bits AS (SELECT id,
       |        $bitSums
       |      FROM h GROUP BY id),
       |sig AS (SELECT id,
       |        $chunkExprs
       |      FROM bits),
       |banded AS ($bandedSelects),
       |elig AS (SELECT chunk, v FROM banded GROUP BY chunk, v
       |         HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM banded a JOIN banded b ON a.chunk = b.chunk AND a.v = b.v AND a.id < b.id
       |         JOIN elig ON elig.chunk = a.chunk AND elig.v = a.v),
       |ham AS (SELECT id_a, id_b, ($hamExpr) AS hamming
       |        FROM cand JOIN sig sa ON sa.id = id_a JOIN sig sb ON sb.id = id_b)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB reproduction of `Dedup.winnowOverlapPairsPortable`: md5 gram
    * hashes, the enc = h*2^22 + (2^22-1-pos) rightmost-min trick as a
    * window-frame MIN, dedup to distinct (id, fp), df-capped pair join. */
  private[queries] def winnowPortableOracle(k: Int, w: Int, minShared: Int, maxDf: Int): String = {
    val div = 1L << 22
    s"""WITH norm AS (SELECT doc_id AS id,
       |        lower(trim(regexp_replace(text,'[ \\t\\n\\r\\f\\x0B]+',' ','g'))) AS t FROM documents),
       |lens AS (SELECT id, t, length(t) - $k + 1 AS n_grams FROM norm
       |         WHERE length(t) >= $k),
       |g AS (SELECT id, t, n_grams, unnest(range(1, n_grams + 1)) AS pos FROM lens),
       |h AS (SELECT id, n_grams, pos,
       |        ('0x'||substr(md5(substring(t, CAST(pos AS INTEGER), $k)),1,7))::BIGINT AS h
       |      FROM g),
       |e AS (SELECT id, n_grams, pos, h*$div + (${div - 1} - pos) AS enc FROM h),
       |sel AS (SELECT id, n_grams, pos,
       |        MIN(enc) OVER (PARTITION BY id ORDER BY pos
       |                       ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS me
       |      FROM e),
       |fp AS (SELECT DISTINCT id, me // $div AS fp FROM sel
       |       WHERE pos <= GREATEST(1, n_grams - ${w - 1})),
       |elig AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $maxDf),
       |pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
       |          FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id
       |          JOIN elig ON elig.fp = a.fp GROUP BY 1, 2)
       |SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= $minShared
       |ORDER BY id_a, id_b""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------ multi-level grouping
    "q_grouping_sets" -> QueryDef.sql(
      (s, dir) => Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .select(col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("revenue"), col("n_orders"))
        .orderBy("gid", "status", "priority"),
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  COALESCE(o_orderstatus,'ALL') AS status,
        |  COALESCE(o_orderpriority,'ALL') AS priority,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, status, priority""".stripMargin,
      doc = "explicit grouping sets with grouping_id disambiguation"),

    // -------------------------------------------- analytic window functions
    "q_window_lag_lead" -> QueryDef.sql(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 200)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            ntile(4).over(w).as("quartile"),
            first_value(col("o_orderkey")).over(w).as("first_key"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  ntile(4) OVER w AS quartile,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
      doc = "lag/lead/ntile/first_value over a per-customer ordered window"),

    // ------------------------------------------- exact moment statistics
    // stddev/corr from exact decimal power sums cast to double at the end:
    // the expression shape (and so IEEE op order) is identical on both
    // engines, and rounding margins dwarf the <=1e-12 conversion noise.
    "q_stats_agg" -> QueryDef.sql(
      (s, dir) => {
        val base = Tables.widen(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice")),
          "l_orderkey").groupBy("l_returnflag").agg(
          count(lit(1)).cast("double").as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sx"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sy"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).cast("double").as("sxx"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).cast("double").as("syy"),
          sum(dec(col("l_quantity")) * dec(col("l_extendedprice"))).cast("double").as("sxy"))
        base.select(col("l_returnflag"),
            col("n").cast("long").as("n_rows"),
            round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4)
              .as("qty_std"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
                * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("qty_price_corr"))
          .orderBy("l_returnflag")
      },
      """WITH base AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  ROUND(sqrt((sxx - sx*sx/n)/(n - 1)), 4) AS qty_std,
        |  ROUND((n*sxy - sx*sy)/(sqrt(n*sxx - sx*sx)*sqrt(n*syy - sy*sy)), 6) AS qty_price_corr
        |FROM base ORDER BY l_returnflag""".stripMargin,
      doc = "stddev + correlation from order-independent decimal power sums"),

    // --------------------------------------- deterministic arg-min/arg-max
    "q_min_max_by" -> QueryDef.sql(
      (s, dir) => Tables.orders(s, dir).groupBy("o_orderstatus").agg(
          max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
            .getField("k").as("max_price_key"),
          min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
            .getField("k").as("min_price_key"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |  max({'p': o_totalprice, 'k': o_orderkey}).k AS max_price_key,
        |  min({'p': o_totalprice, 'k': o_orderkey}).k AS min_price_key,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      doc = "arg-extreme via struct ordering (deterministic under value ties)"),

    // ------------------------------------------------ conditional aggregates
    "q_cond_agg" -> QueryDef.sql(
      (s, dir) => Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
          decSum(when(col("l_discount") > 0.05, dec(col("l_extendedprice")))
            .otherwise(lit(null))).as("discounted_revenue"),
          count(when(col("l_tax") === 0, 1)).as("n_taxfree"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FILTER (WHERE l_discount > 0.05),2) AS DOUBLE) AS discounted_revenue,
        |  COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      doc = "FILTER-style conditional aggregates (count/sum under predicates)"),

    // --------------------------------------------------- scalar suites
    "q_string_funcs" -> QueryDef.sql(
      (s, dir) => Tables.customer(s, dir)
        .filter(col("c_custkey") <= 500)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_translated"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("seg_lev"),
          reverse(col("c_mktsegment")).as("seg_rev"))
        .orderBy("c_custkey"),
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  levenshtein(c_mktsegment, 'MACHINERY') AS seg_lev,
        |  reverse(c_mktsegment) AS seg_rev
        |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin,
      doc = "string scalar suite incl. edit distance"),

    "q_date_arith" -> QueryDef.sql(
      (s, dir) => {
        val d = to_date(col("o_orderdate"))
        Tables.orders(s, dir)
          .filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"),
            // dates go out as timestamps: Spark-written parquet DATE reads
            // back as python objects in the driver's pandas compare
            d.cast("timestamp").as("order_date"),
            date_add(d, 30).cast("timestamp").as("due_date"),
            last_day(d).cast("timestamp").as("month_end"),
            datediff(lit("2026-01-01").cast("date"), d).cast("long").as("days_to_2026"),
            ((lit(2026) - year(d)) * 12 + (lit(1) - month(d))).cast("long").as("months_to_2026"),
            dayofweek(d).cast("long").as("dow"),
            quarter(d).cast("long").as("qtr"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS BIGINT) AS days_to_2026,
        |  CAST((2026 - year(o_orderdate))*12 + (1 - month(o_orderdate)) AS BIGINT) AS months_to_2026,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,
      doc = "date arithmetic suite (offsets, boundaries, calendar fields)"),

    "q_regex_extract" -> QueryDef.sql(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_extract(col("text"), "([0-9]+)", 1).as("first_number"),
          regexp_extract(col("text"), "\\b([A-Z][a-z]+)\\b", 1).as("first_capitalized"),
          size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0))).cast("long")
            .as("n_sentence_marks"))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  regexp_extract(text, '([0-9]+)', 1) AS first_number,
        |  regexp_extract(text, '\b([A-Z][a-z]+)\b', 1) AS first_capitalized,
        |  CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentence_marks
        |FROM documents ORDER BY doc_id""".stripMargin,
      doc = "regex extraction and occurrence counting over documents"),

    // --------------------------------------- deterministic hash sampling
    // Train/test-split shape: a content-addressed bucket from md5 makes the
    // sample reproducible across engines, runs, and cluster sizes (unlike
    // rand()/TABLESAMPLE) — the property a 100 TB pipeline needs to keep
    // splits stable under re-partitioning.
    "q_sample_hash" -> QueryDef.sql(
      (s, dir) => Tables.events(s, dir)
        .withColumn("bucket",
          conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10)
        .filter(col("bucket") === 0)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id"),
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE ('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,4))::BIGINT % 10 = 0
        |ORDER BY event_id""".stripMargin,
      doc = "content-hash bucket sampling (stable 10% split at any scale)"),

    // --------------------------------------------------- text pipelines
    "q_tf_idf" -> QueryDef.sql(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs.filter(col("doc_id") < 50)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // document frequency over the SAMPLE population (doc_id < 50) keeps
        // the query self-contained; idf is ln-smoothed
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)
        tf.join(df, "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rn"))
          .orderBy("doc_id", "rn")
      },
      """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),'[a-z0-9]+')) AS term
        |       FROM documents WHERE doc_id < 50),
        |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
        |scored AS (
        |  SELECT doc_id, tfc.term, tf,
        |    ROUND(tf * ln(CAST(n_docs + 1 AS DOUBLE)/(df + 1)), 6) AS score
        |  FROM tfc JOIN df ON df.term = tfc.term CROSS JOIN n),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
        |           FROM scored)
        |SELECT doc_id, term, tf, score, rn FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
      doc = "TF-IDF top terms per document (explode -> tf -> df -> rank)"),

    "q_zscore" -> QueryDef.sql(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum(dec(col("value"), 12, 6)).cast("double").as("s1"),
          sum(dec(col("value"), 12, 6) * dec(col("value"), 12, 6)).cast("double").as("s2"))
        ev.join(broadcast(stats), "event_type")
          .withColumn("z", round(
            (col("value") - col("s1") / col("n"))
              / sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4))
          .filter(abs(col("z")) >= 2.0)
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
          .orderBy("event_id")
      },
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value AS DECIMAL(12,6)) * CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT event_id, events.event_type, value,
        |  ROUND((value - s1/n) / sqrt((s2 - s1*s1/n)/(n - 1)), 4) AS z
        |FROM events JOIN stats ON stats.event_type = events.event_type
        |WHERE abs(ROUND((value - s1/n) / sqrt((s2 - s1*s1/n)/(n - 1)), 4)) >= 2.0
        |ORDER BY event_id""".stripMargin,
      doc = "per-type z-score outliers from exact decimal power sums"),

    // ------------------------------------------- embedding aggregation
    // Per-label centroid of the embedding column — the standard "class
    // prototype" reduction. Output is one row per (label, dimension) so the
    // driver's pandas compare never sees an array cell; sums are exact
    // decimals (order-independent), division happens once in double.
    "q_emb_centroid" -> QueryDef.sql(
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(sum(dec(col("v"), 20, 10)).cast("double") / count(lit(1)), 6).as("c"),
          count(lit(1)).as("n_vecs"))
        .select(col("label").cast("long").as("label"), col("pos").cast("long").as("pos"),
          col("c"), col("n_vecs"))
        .orderBy("label", "pos"),
      """SELECT CAST(label AS BIGINT) AS label, CAST(p AS BIGINT) AS pos,
        |  ROUND(CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS c,
        |  COUNT(*) AS n_vecs
        |FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS p,
        |        unnest(CAST(embedding AS DOUBLE[])) AS v
        |      FROM embeddings)
        |GROUP BY label, p ORDER BY label, pos""".stripMargin,
      doc = "per-label embedding centroids from exact decimal dimension sums"),

    // ----------------------------------- portable-hash MinHash (full oracle)
    "q_dedup_minhash_portable" -> QueryDef.sql(
      (s, dir) => Dedup.minhashNearDupPairsPortable(Tables.documents(s, dir),
        "doc_id", "text", n = 3, numPerm = 32, rowsPerBand = 2, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      minhashPortableOracle(numPerm = 32, rowsPerBand = 2, threshold = 0.5, maxBucket = 64),
      doc = "MinHash-LSH with an md5/universal-hash family both engines " +
        "compute bit-for-bit: the approximate tier, fully oracle-checked"),

    // Incremental ingest dedup: the 20% "new batch" (doc_id % 5 = 0) joins
    // its band signatures asymmetrically against the full band index —
    // history×history pairs are never generated (at sf0.01, 14 of the 25
    // near-dup pairs involve a new doc; the 11 history-only pairs are
    // correctly absent). The production daily-crawl shape.
    "q_dedup_incremental" -> QueryDef.sql(
      (s, dir) => Dedup.minhashIncrementalPairsPortable(
          Tables.documents(s, dir), "doc_id", "text",
          isNew = id => id % 5 === 0,
          n = 3, numPerm = 32, rowsPerBand = 2, threshold = 0.5, maxBucket = 64)
        .orderBy("id_a", "id_b"),
      minhashPortableOracle(numPerm = 32, rowsPerBand = 2, threshold = 0.5,
        maxBucket = 64, incrementalNewSql = Some("? % 5 = 0")),
      doc = "incremental MinHash dedup of a new batch against the full " +
        "band index — asymmetric bucket join, no history×history pairs"),

    "q_dedup_simhash_portable" -> QueryDef.sql(
      (s, dir) => Dedup.simhashNearDupPairsPortable(Tables.documents(s, dir),
        "doc_id", "text", n = 3, maxHamming = 16, maxBucket = 64)
        .orderBy("id_a", "id_b"),
      simhashPortableOracle(maxHamming = 16, maxBucket = 64),
      doc = "SimHash with md5-derived bits both engines compute bit-for-bit: " +
        "4x16-bit pigeonhole bands, fully oracle-checked"),

    // KMV (bottom-k) distinct estimate: the approximate-cardinality tier
    // with an engine-reproducible hash — unlike HLL's internal sketch bits,
    // the estimate itself is oracle-checked. q_agg_approx_distinct stays the
    // built-in HLL fast path.
    "q_agg_kmv_distinct" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.kmvDistinct(
          Tables.lineitem(s, dir), "l_returnflag", "l_partkey", k = 64)
        .orderBy("l_returnflag"),
      graft.ops.Sketch.kmvDistinctOracle("lineitem", "l_returnflag", "l_partkey", k = 64),
      doc = "KMV/bottom-k distinct estimate with an md5 hash family both " +
        "engines compute bit-for-bit (mergeable sketch, full oracle)"),

    // HyperLogLog with the portable md5 hash: unlike the built-in HLL++
    // (engine-internal sketch bits), the m=32-register estimate is pure
    // integer / 6-dp-ln arithmetic, so the register table, harmonic sum,
    // alpha_32 correction, and linear-counting switch are ALL reproduced by
    // DuckDB bit-for-bit. Production form is Sketch.HllAgg (fixed 32-int
    // mergeable buffer), spec-proven equal to this relational twin.
    "q_agg_hll_distinct" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.hllDistinct(
          Tables.lineitem(s, dir), "l_returnflag", "l_partkey")
        .orderBy("l_returnflag"),
      graft.ops.Sketch.hllDistinctOracle("lineitem", "l_returnflag", "l_partkey"),
      doc = "HyperLogLog distinct estimate (32 registers, portable md5 " +
        "hash) with the full integer estimate pipeline oracle-checked. " +
        "ORACLE/DEMONSTRATION-ONLY cost profile: the declared query also " +
        "runs an exact countDistinct and joins it in for the within-3sigma " +
        "check, so its bench time measures the exact path, not sketch " +
        "speed — production form is HllAgg alone"),

    // MEASURED recall of the MinHash-LSH dedup tier against exact n-gram
    // Jaccard ground truth — the text-dedup twin of q_ann_recall's
    // "recall is measured, not asserted" discipline. Both tiers run at
    // the production geometry (n=3 shingles, threshold 0.5, 32 perms x
    // 16 bands, maxBucket 64); the LSH pairs are exact-verified by
    // construction, so n_extra doubles as a subset PROOF (precision 1.0)
    // and recall_micro quantifies what band collisions miss. One-row
    // integer output; the oracle replays BOTH tiers as derived tables.
    "q_dedup_recall" -> QueryDef.sql(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // stage (Materialize) each tier's (tiny) pair table EAGERLY: one union
        // action over both lazy tiers races their branches against the
        // not-yet-materialized shared shingle caches and re-computes the
        // regex pass per branch (measured 39 s vs the tiers' 12 s sum at
        // the 10x probe). r14: the two stagings run CONCURRENTLY
        // (Materialize.stageAll, guide §2.6) — each tier still runs
        // exactly once, but the jobs back-fill each other's idle cores;
        // the shared PlanCache builds are serialized by its monitor.
        val Seq(e, m) = graft.core.Materialize.stageAll(Seq(
          Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
              n = 3, threshold = 0.5)
            .select(col("id_a"), col("id_b"), lit(1L).as("ie"), lit(0L).as("im")),
          Dedup.minhashNearDupPairsPortable(docs, "doc_id", "text",
              n = 3, numPerm = 32, rowsPerBand = 2, threshold = 0.5, maxBucket = 64)
            .select(col("id_a"), col("id_b"), lit(0L).as("ie"), lit(1L).as("im"))))
        e.unionByName(m)
          .groupBy("id_a", "id_b")
          .agg(max("ie").as("e"), max("im").as("m"))
          .agg(sum(col("e")).cast("long").as("n_exact"),
            sum(col("m")).cast("long").as("n_mh"),
            sum(col("e") * col("m")).cast("long").as("n_both"),
            sum((lit(1L) - col("e")) * col("m")).cast("long").as("n_extra"))
          .select(col("n_exact"), col("n_mh"), col("n_both"), col("n_extra"),
            // integral div by a zero n_exact would be a silent NULL on BOTH
            // engines (masking a broken ground-truth tier as a still-
            // matching row); recall_micro is an always-read output column,
            // so raise_error here cannot be pruned away (the semDedup trap
            // does not apply)
            // coalesce: SUM over ZERO rows is NULL, not 0 (an empty pair
            // union would otherwise slip past the === 0 check as NULL)
            when(coalesce(col("n_exact"), lit(0L)) === 0,
              raise_error(lit("q_dedup_recall: exact tier returned no pairs")))
              .otherwise(call_function("div", col("n_both") * 1000000L,
                col("n_exact")))
              .as("recall_micro"))
      },
      dedupRecallOracle,
      doc = "measured recall of the MinHash-LSH near-dup tier vs exact " +
        "Jaccard ground truth (n_extra = 0 proves the verified subset), " +
        "fully oracle-checked"),

    // HDR-histogram quantile sketch: the portable, mergeable quantile tier
    // (HdrHistogram/DDSketch shape) with the WHOLE estimate oracle-checked
    // — log-bucketed integer histogram (top m+1 = 6 significant bits kept,
    // rel. error < 1/32), bucket counts partially aggregable, quantile =
    // lower bound of the rank bucket in exact integer arithmetic. The
    // scale-path complement of q_percentile_approx (built-in GK, whose
    // engine-internal state only admits a bound check): here the shuffle
    // carries one row per occupied bucket per group, mergeable by addition
    // across shards and stream batches.
    "q_hdr_quantiles" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.hdrQuantiles(
          Tables.orders(s, dir), "o_orderpriority",
          (graft.ops.Exact.dec(col("o_totalprice")) * 100).cast("long"),
          m = 5, quantiles = Seq((1, 2), (9, 10), (99, 100)))
        .orderBy("o_orderpriority"),
      graft.ops.Sketch.hdrQuantilesOracle("orders", "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        m = 5, quantiles = Seq((1, 2), (9, 10), (99, 100))),
      doc = "HDR-histogram quantile sketch (log-bucketed integer " +
        "histogram, rel. error < 2^-5): p50/p90/p99 cents per order " +
        "priority, mergeable bucket counts, fully oracle-checked"),

    // KMV set algebra (Beyer et al. 2007): distinct-part estimates for two
    // shipping years, their union, and their intersection — all from
    // mergeable bottom-k sketches (union sketch = bottom-k of the merged
    // sketches; intersection via the ρ·est_union estimator in exact e4
    // integer units). The md5 hash family makes every estimate
    // bit-reproducible, so the whole sketch-algebra tier carries a full
    // oracle next to the exact counts.
    "q_agg_kmv_setops" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.kmvSetOps(
        Tables.lineitem(s, dir), "l_partkey",
        year(col("l_shipdate")) === 1996, year(col("l_shipdate")) === 1997,
        k = 64),
      s"""WITH base AS (SELECT l_partkey AS v,
         |    BOOL_OR(year(l_shipdate) = 1996) AS ia,
         |    BOOL_OR(year(l_shipdate) = 1997) AS ib
         |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         |f AS (SELECT v, ia, ib,
         |    ('0x'||substr(md5(v::VARCHAR),1,15))::BIGINT / 1152921504606846976.0 AS h
         |  FROM base WHERE ia OR ib),
         |ex AS (SELECT COUNT(*) FILTER (ia) AS n_a_exact,
         |    COUNT(*) FILTER (ib) AS n_b_exact,
         |    COUNT(*) AS n_union_exact,
         |    COUNT(*) FILTER (ia AND ib) AS n_inter_exact FROM f),
         |ka AS (SELECT v, h FROM f WHERE ia ORDER BY h, v LIMIT 64),
         |kb AS (SELECT v, h FROM f WHERE ib ORDER BY h, v LIMIT 64),
         |m AS (SELECT v, h FROM (SELECT v, h FROM ka UNION SELECT v, h FROM kb)
         |      ORDER BY h, v LIMIT 64),
         |ska AS (SELECT COUNT(*) AS k_a, MAX(h) AS tau_a FROM ka),
         |skb AS (SELECT COUNT(*) AS k_b, MAX(h) AS tau_b FROM kb),
         |skm AS (SELECT COUNT(*) AS k_m, MAX(h) AS tau_m FROM m),
         |im AS (SELECT COUNT(*) AS i_m FROM m
         |       JOIN ka USING (v) JOIN kb USING (v))
         |SELECT n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
         |  CASE WHEN n_a_exact < 64 THEN CAST(n_a_exact AS DOUBLE)
         |       ELSE ROUND(63.0 / tau_a, 4) END AS est_a,
         |  CASE WHEN n_b_exact < 64 THEN CAST(n_b_exact AS DOUBLE)
         |       ELSE ROUND(63.0 / tau_b, 4) END AS est_b,
         |  CASE WHEN n_union_exact < 64 THEN CAST(n_union_exact AS DOUBLE)
         |       ELSE ROUND(63.0 / tau_m, 4) END AS est_union,
         |  CASE WHEN k_m = 0 THEN 0.0
         |       ELSE CAST((CASE WHEN n_union_exact < 64 THEN n_union_exact * 10000
         |                       ELSE CAST(round(ROUND(63.0 / tau_m, 4) * 10000) AS BIGINT)
         |                  END * i_m) // k_m AS DOUBLE) / 10000.0 END AS est_inter
         |FROM ex, ska, skb, skm, im""".stripMargin,
      doc = "KMV sketch set algebra: distinct estimates for two years, " +
        "union (merged sketch) and intersection (rho estimator, e4 integer " +
        "units), full oracle next to exact counts"),

    // Count-min heavy hitters: frequency estimation from depth×width cells
    // of fixed state (here 4×32 so hash collisions actually occur against
    // the 31-token vocabulary — 5 of 31 estimates overcount, the rest are
    // exact). The relational groupBy-sum construction is the sketch's
    // mergeability; estimates are min-over-rows, biased high never low.
    // Bloom membership (Bloom 1970): the bit set over event-active user
    // ids (150 keys), probed by the whole customer dim (1500 keys — 1350
    // true negatives exercise the FP trade at m=1024/j=3, expected
    // (1-e^(-jn/m))^j ~ 4.5%). The production use is probe-side shuffle
    // pruning (what Spark's InjectRuntimeFilter builds internally); this
    // report makes the sketch's guarantees driver-checkable: in_bloom has
    // no false negatives (SketchSpec asserts), is_fp counts the lie rate.
    "q_bloom_membership" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.bloomMembership(
          Tables.events(s, dir).select(col("user_id")),
          "user_id",
          Tables.customer(s, dir).select(col("c_custkey")),
          "c_custkey", m = 1024, j = 3)
        .orderBy("c_custkey"),
      graft.ops.Sketch.bloomMembershipOracle(
        "SELECT user_id AS k FROM events",
        "SELECT c_custkey AS k FROM customer",
        outKey = "c_custkey", m = 1024, j = 3),
      doc = "Bloom-filter membership over event-active users probed by " +
        "the customer dim: md5 bit positions both engines compute " +
        "bit-for-bit; no false negatives, FP rate measured (full oracle)"),

    "q_count_min" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.countMinTopK(
          Tables.documents(s, dir)
            .select(explode(graft.ops.TextOps.tokens(col("text"))).as("item")),
          "item", width = 32, depth = 4, k = 20),
      graft.ops.Sketch.countMinTopKOracle(
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item FROM documents",
        width = 32, depth = 4, k = 20),
      doc = "count-min sketch heavy hitters with an md5 hash family both " +
        "engines compute bit-for-bit (est >= exact always; full oracle)"),

    // Misra-Gries heavy hitters — the counter-set dual of count-min:
    // deterministic undercount with a k-counter summary, merge via the
    // (k+1)-th-largest subtraction (Agarwal et al. 2012). k=28 sits under
    // the fixture's 31-term vocabulary, so decrements genuinely fire; the
    // 4 true heavy hitters (freq > n/29) must all surface. Counter values
    // vary with partitioning, so the declared report is exact counts +
    // guarantee booleans (the estimate-bounds discipline); a dropped
    // heavy hitter would fail the row compare itself.
    "q_agg_heavy_hitters" -> QueryDef.sql(
      (s, dir) => graft.ops.Sketch.mgHeavyHitters(
          Tables.documents(s, dir)
            .select(explode(graft.ops.TextOps.tokens(col("text"))).as("item")),
          "item", k = 28)
        .orderBy("term"),
      """WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item
        |          FROM documents),
        |c AS (SELECT item AS term, COUNT(*) AS c FROM t GROUP BY 1),
        |tot AS (SELECT SUM(c) AS n FROM c)
        |SELECT term, c::BIGINT AS exact_c, TRUE AS within_bound
        |FROM c, tot WHERE c * 29 > n ORDER BY term""".stripMargin,
      doc = "Misra-Gries k=28 heavy hitters under genuine counter " +
        "pressure: every freq > n/(k+1) term surfaces with its exact " +
        "count and the undercount bound verified"),

    // Exponential smoothing over the daily event-rate series, alpha = 1/2.
    // The recurrence is unrolled to 20 lag terms (weight 2^-21 < 1e-6
    // beyond that), and EVERY quantity is an exact dyadic rational: counts
    // are integers, the weights are powers of two (embedded as exact
    // decimal literals, not POWER() calls), each product and the
    // left-associated sum stay well under 53 mantissa bits — so both
    // engines compute the identical double before the final round.
    "q_ewma" -> QueryDef.sql(
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
        val ewma = (0 until 20).map { k =>
          val wgt = java.math.BigDecimal.valueOf(0.5).pow(k + 1).toPlainString
          coalesce(lag(col("n"), k).over(w), lit(0L)).cast("double") * lit(wgt.toDouble)
        }.reduce(_ + _)
        daily.withColumn("ewma", round(ewma, 6))
          .select(col("event_type"), col("day"), col("n"), col("ewma"))
          .orderBy("event_type", "day")
      }, {
        val terms = (0 until 20).map { k =>
          val wgt = java.math.BigDecimal.valueOf(0.5).pow(k + 1).toPlainString
          s"COALESCE(lag(n, $k) OVER w, 0) * $wgt"
        }.mkString(" + ")
        s"""WITH daily AS (
           |  SELECT event_type,
           |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, day, n, ROUND($terms, 6) AS ewma
           |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
           |ORDER BY event_type, day""".stripMargin
      },
      doc = "EWMA (alpha=1/2) of daily event rates: 20-lag unrolled " +
        "recurrence in exact dyadic arithmetic — no FP divergence possible"),

    // Cohort retention: users grouped by first-activity week, counted
    // distinct per weeks-since-cohort offset. Two partially-aggregable
    // aggregates + one join back on the user — the classic retention
    // matrix in long form.
    "q_retention" -> QueryDef.sql(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
        ev.distinct().join(cohort, "user_id")
          .withColumn("offset_weeks", // day diff is an exact multiple of 7
            (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
          .groupBy("cohort_week", "offset_weeks")
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "offset_weeks")
      },
      """WITH ev AS (SELECT DISTINCT user_id,
        |              CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS week
        |            FROM events),
        |cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week, CAST(datediff('day', cohort_week, week) AS BIGINT) // 7 AS offset_weeks,
        |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      doc = "weekly cohort retention matrix in long form"),

    // Conversion funnel: users whose first view precedes their first
    // click precedes their first purchase — per-user min-timestamp
    // aggregates (one shuffle), then one global verdict row per stage.
    "q_funnel" -> QueryDef.sql(
      (s, dir) => {
        val firsts = Tables.events(s, dir).groupBy("user_id").agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        firsts.agg(
            count(when(col("t_view").isNotNull, 1)).as("n_viewed"),
            count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
            count(when(col("t_view") < col("t_click") &&
              col("t_click") < col("t_purchase"), 1)).as("n_full_funnel"))
          .select(col("n_viewed").cast("long").as("n_viewed"),
            col("n_view_click").cast("long").as("n_view_click"),
            col("n_full_funnel").cast("long").as("n_full_funnel"))
          .orderBy("n_viewed") // single row; ORDER BY per oracle convention
      },
      """WITH firsts AS (
        |  SELECT user_id,
        |    MIN(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'view') AS t_view,
        |    MIN(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'click') AS t_click,
        |    MIN(CAST(ts AS TIMESTAMP)) FILTER (WHERE event_type = 'purchase') AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT) AS n_viewed,
        |  CAST(COUNT(*) FILTER (WHERE t_view < t_click) AS BIGINT) AS n_view_click,
        |  CAST(COUNT(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase) AS BIGINT) AS n_full_funnel
        |FROM firsts ORDER BY n_viewed""".stripMargin,
      doc = "ordered view->click->purchase conversion funnel from per-user " +
        "first-occurrence timestamps"),

    "q_dedup_winnow_portable" -> QueryDef.sql(
      (s, dir) => Dedup.winnowOverlapPairsPortable(Tables.documents(s, dir),
        "doc_id", "text", k = 16, w = 4, minShared = 10, maxDf = 50)
        .orderBy("id_a", "id_b"),
      winnowPortableOracle(k = 16, w = 4, minShared = 10, maxDf = 50),
      doc = "winnowing (rightmost window-min) with md5 gram hashes both " +
        "engines compute bit-for-bit: the copied-passage tier, fully oracle-checked"),

    // ------------------------------------- train/val/test stratification
    // Content-addressed 3-way split (md5 bucket, the q_sample_hash family):
    // stable under re-partitioning, re-runs, and cluster size — then the
    // per-language balance report that a pipeline gates on. The window total
    // is cast to double BEFORE division on both engines (DuckDB's SUM OVER
    // returns HUGEINT).
    "q_stratified_split" -> QueryDef.sql(
      (s, dir) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100
        Tables.documents(s, dir)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
          .withColumn("pct", round(col("n_docs") * lit(100.0) /
            sum(col("n_docs")).over(Window.partitionBy(col("lang"))).cast("double"), 4))
          .orderBy("lang", "split")
      },
      """WITH a AS (
        |  SELECT lang,
        |    CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |g AS (SELECT lang, split, COUNT(*) AS n_docs FROM a GROUP BY lang, split)
        |SELECT lang, split, n_docs,
        |  ROUND(n_docs * 100.0 / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 4) AS pct
        |FROM g ORDER BY lang, split""".stripMargin,
      doc = "deterministic hash-bucketed train/val/test split + per-language balance"),

    // -------------------------------------------------- vocabulary build
    // Corpus vocabulary: term frequency + document frequency, top 100 by tf.
    // limit() runs BEFORE the rank window, so the global window orders 100
    // rows, not the vocabulary (TakeOrderedAndProject does the heavy top-k).
    "q_vocab_topk" -> QueryDef.sql(
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        tf.orderBy(col("tf").desc, col("term").asc).limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("tf").desc, col("term").asc)))
          .select("rnk", "term", "tf", "df")
      },
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),'[a-z0-9]+')) AS term
        |           FROM documents),
        |g AS (SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
        |top AS (SELECT term, tf, df FROM g ORDER BY tf DESC, term LIMIT 100)
        |SELECT ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rnk, term, tf, df
        |FROM top ORDER BY rnk""".stripMargin,
      doc = "corpus vocabulary: tf + df per term, ranked top 100"),

    // ------------------------------------------- embedding quantization
    // Int8 scalar quantization (per-vector absmax scale): the standard
    // storage/serving compression for embedding tables. All arithmetic is
    // identical IEEE shape on both engines (max is order-free; v/scale,
    // floor(x+0.5) elementwise), so the quantized codes carry a full
    // oracle. floor(x+0.5) is used instead of round() to pin down the
    // half-way rule explicitly on both engines.
    "q_emb_quantize" -> QueryDef.sql(
      (s, dir) => {
        val ex = Tables.embeddings(s, dir).select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        ex.withColumn("scale", max(abs(col("v")))
            .over(Window.partitionBy(col("vec_id"))) / 127.0)
          .withColumn("qv", when(col("scale") === 0, 0L)
            .otherwise(floor(col("v") / col("scale") + 0.5)))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            round(col("scale"), 9).as("scale_r"), col("qv"))
          .orderBy("vec_id", "pos")
      },
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |        unnest(CAST(embedding AS DOUBLE[])) AS v
        |      FROM embeddings),
        |s AS (SELECT vec_id, pos, v,
        |        MAX(ABS(v)) OVER (PARTITION BY vec_id) / 127.0 AS scale FROM e)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos, ROUND(scale, 9) AS scale_r,
        |  CASE WHEN scale = 0 THEN 0 ELSE CAST(FLOOR(v/scale + 0.5) AS BIGINT) END AS qv
        |FROM s ORDER BY vec_id, pos""".stripMargin,
      doc = "int8 absmax quantization of the embedding column, fully oracle-checked")
  )
}
