package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Maintain
import graft.sources.Tables

/** Table-maintenance / data-engineering tier (ops/Maintain): CDC merge
  * application, migration checksums, bloom semi-join reduction, skyline
  * pruning, and short-field edit-distance dedup — the operational jobs
  * that surround the analytics at 100 TB. Change sets and probe inputs
  * are derived DETERMINISTICALLY from the fixture (modular key
  * predicates), so every query keeps a full DuckDB oracle.
  */
object MaintenanceQueries {

  /** Benford expected first-digit shares, micro-units: round(log10(1 +
    * 1/d)·1e6). Scala-computed once, embedded as literals in BOTH engines'
    * plans so no cross-engine log10 bit-parity is assumed. */
  private val BenfordMicro: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1e6))

  val defs: Map[String, QueryDef] = Map(

    // -------------------------------------------------- CDC merge apply
    // MERGE INTO classification: a deterministic change set (upserts on
    // keys % 7 = 0, deletes on % 31 = 0 excluding the upserts, inserts at
    // key+1000000 for % 97 = 0) full-outer joined onto customer; every
    // key emits its action + post-merge balance. ONE shuffle on the key.
    "q_merge_upsert" -> QueryDef.sql(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val upd = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"),
            lit("u").as("op"))
        val del = cust.filter(col("c_custkey") % 31 === 0 && col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey"), lit(null).cast("double").as("c_acctbal"),
            lit("d").as("op"))
        val ins = cust.filter(col("c_custkey") % 97 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            lit(50.0).as("c_acctbal"), lit("u").as("op"))
        Maintain.mergeClassify(cust, upd.unionAll(del).unionAll(ins),
            "c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      """WITH chg AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS chg_val, 'u' AS op
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, CAST(NULL AS DOUBLE), 'd'
        |  FROM customer WHERE c_custkey % 31 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 50.0, 'u'
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT COALESCE(b.c_custkey, chg.c_custkey) AS c_custkey,
        |  CASE WHEN op = 'd' THEN 'delete'
        |       WHEN op = 'u' AND b.c_custkey IS NOT NULL THEN 'update'
        |       WHEN op = 'u' THEN 'insert' ELSE 'keep' END AS action,
        |  CASE WHEN op = 'd' THEN CAST(NULL AS DOUBLE)
        |       WHEN op = 'u' THEN chg_val ELSE b.c_acctbal END AS new_val
        |FROM customer b FULL OUTER JOIN chg ON b.c_custkey = chg.c_custkey
        |ORDER BY c_custkey""".stripMargin,
      doc = "MERGE INTO classification (CDC apply): full-outer join on the " +
        "key, per-row action + post-merge value, one shuffle"),

    // --------------------------------------------- migration checksums
    // Order-independent portable content fingerprint per source: count +
    // 60-bit XOR fold + 32-bit additive fold of md5(doc_id:text). Two
    // engines agree per group iff all three match — the cross-engine
    // equality certificate for 100 TB copies (and this oracle IS the
    // cross-engine check).
    "q_content_checksum" -> QueryDef.sql(
      (s, dir) => Maintain.contentChecksum(Tables.documents(s, dir), "source",
          concat(col("doc_id").cast("string"), lit(":"), col("text")))
        .orderBy("source"),
      """SELECT source, COUNT(*) AS n_rows,
        |  bit_xor(CAST(('0x' || substr(md5(doc_id || ':' || text), 1, 15)) AS BIGINT)) AS xor60,
        |  CAST(SUM(CAST(('0x' || substr(md5(doc_id || ':' || text), 16, 8)) AS BIGINT)) AS BIGINT) AS sum32
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      doc = "order-independent portable content checksum per source " +
        "(count + md5 xor/sum folds; partitioning cannot change it)"),

    // ------------------------------------------------- Benford audit
    // First-significant-digit distribution of order totals vs Benford's
    // law (Newcomb 1881/Benford 1938) — the classic fabricated-data smell
    // test for money columns. Expected shares are Scala-computed literals
    // embedded in BOTH plans (the q_dp_counts idiom: no cross-engine log10
    // bit-parity risk); observed shares are exact integer micro-division
    // against a window total over the ≤9-row digit table. Scale shape: one
    // partial-agg groupBy on a 9-value key; everything after is driver-
    // trivial. TPC-H totals cluster in a band, so deviations are LARGE —
    // the audit fires exactly as it should on synthetic money.
    "q_benford" -> QueryDef.sql(
      (s, dir) => {
        val expCol = BenfordMicro.foldLeft(lit(null).cast("long")) {
          case (acc, (d, m)) => when(col("digit") === d, lit(m)).otherwise(acc)
        }
        Tables.orders(s, dir)
          .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
            .cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
          .withColumn("n_tot", sum("n_obs").over(Window.partitionBy()))
          .select(col("digit"), col("n_obs"),
            call_function("div", col("n_obs") * 1000000L, col("n_tot")).as("obs_micro"),
            expCol.as("exp_micro"))
          .withColumn("dev_micro", col("obs_micro") - col("exp_micro"))
          .orderBy("digit")
      },
      {
        val caseSql = BenfordMicro
          .map { case (d, m) => s"WHEN $d THEN $m" }.mkString(" ")
        s"""WITH f AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
           |        AS VARCHAR), 1, 1) AS INT) AS digit FROM orders),
           |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM f GROUP BY 1),
           |t AS (SELECT digit, n_obs,
           |        CAST(SUM(n_obs) OVER () AS BIGINT) AS n_tot FROM g)
           |SELECT digit, n_obs,
           |  CAST((n_obs * 1000000) // n_tot AS BIGINT) AS obs_micro,
           |  CAST(CASE digit $caseSql END AS BIGINT) AS exp_micro,
           |  CAST((n_obs * 1000000) // n_tot - CASE digit $caseSql END AS BIGINT)
           |    AS dev_micro
           |FROM t ORDER BY digit""".stripMargin
      },
      doc = "Benford first-digit audit of o_totalprice: observed vs " +
        "expected digit shares in exact micro-units — the fabricated-" +
        "money smell test"),

    // ------------------------------------------ bloom semi-join reduce
    // Semi-join reduction: orders filtered through a 4096-bit broadcast
    // Bloom of the BUILDING-segment customer keys BEFORE the join shuffle;
    // the join removes the false positives, so the oracle is the PLAIN
    // join — the hash match proves the reduction lossless. The manual,
    // any-dim-size form of Spark's InjectRuntimeFilter.
    "q_bloom_join_reduce" -> QueryDef.sql(
      (s, dir) => {
        val dim = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_nationkey"))
        Maintain.bloomReduceJoin(
            Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
            "o_custkey", dim, "c_custkey")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            graft.ops.Exact.moneySum(col("o_totalprice")).as("revenue"))
          .orderBy("c_nationkey")
      },
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))),2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      doc = "bloom semi-join reduction: broadcast 4096-bit bitmap filters " +
        "the fact side pre-shuffle; oracle = plain join (lossless)"),

    // ----------------------------------------------------- 2-D skyline
    // Pareto front over part (maximize retail price, minimize size):
    // per-size max (partial agg) + sweep window over the <= 50-row size
    // domain + tie-preserving join-back. Oracle = the textbook quadratic
    // NOT-EXISTS dominance — the hash match proves the decomposition.
    "q_pareto_front" -> QueryDef.sql(
      (s, dir) => Maintain.paretoFront2D(
          Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"), col("p_size")),
          "p_retailprice", "p_size")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_size").asc, col("p_partkey").asc),
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_retailprice >= p.p_retailprice AND q.p_size <= p.p_size
        |    AND (q.p_retailprice > p.p_retailprice OR q.p_size < p.p_size))
        |ORDER BY p_size, p_partkey""".stripMargin,
      doc = "2-D Pareto front (max price, min size): per-size max + bounded " +
        "sweep window + tie join-back; quadratic NOT-EXISTS oracle referee"),

    // --------------------------------------- edit-distance name dedup
    // Near-duplicate SHORT-FIELD values by Levenshtein distance, blocked
    // on the last name token so candidates stay within a block: the
    // standard title/product-name dedup. Pairing runs over the DISTINCT
    // name domain (value dedup, not row dedup — 64 names at any corpus
    // size here), so the per-block quadratic is domain-bounded; at an
    // unbounded domain the winnow-style maxDf cap applies (Dedup.scala).
    "q_dedup_edit_names" -> QueryDef.sql(
      (s, dir) => {
        val names = Tables.part(s, dir)
          .select(col("p_name"), regexp_extract(col("p_name"), "[^ ]+$", 0).as("blk"))
          .distinct()
        val a = names.select(col("p_name").as("name_a"), col("blk"))
        val b = names.select(col("p_name").as("name_b"), col("blk"))
        a.join(b, Seq("blk"))
          .filter(col("name_a") < col("name_b"))
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 4)
          .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
          .orderBy("name_a", "name_b")
      },
      """WITH names AS (SELECT DISTINCT p_name,
        |    regexp_extract(p_name, '[^ ]+$') AS blk FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY name_a, name_b""".stripMargin,
      doc = "short-field near-dup by Levenshtein <= 4, last-token blocking " +
        "over the distinct value domain")
  )
}
