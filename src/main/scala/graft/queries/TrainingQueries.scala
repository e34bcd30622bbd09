package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{TextOps, TrainOps}
import graft.sources.Tables

/** Training-data assembly queries: the corpus→batches steps (packing,
  * quality gating, contamination screening, retrieval, mixing, graph
  * centrality) that complete the LLM-pipeline surface next to the dedup /
  * ANN / text-analysis tiers. Every query carries a full DuckDB oracle.
  */
object TrainingQueries {

  /** Portable uniform in [0,1): first 8 md5 hex chars of the id as a 32-bit
    * fraction — the q_sample_hash family, identical in both engines. */
  private def hashUniform(idSql: String): String =
    s"(('0x'||substr(md5(CAST($idSql AS VARCHAR)),1,8))::BIGINT / 4294967296.0)"

  /** Word-boundary alternation regex over a stopword list (the q_lang_id
    * oracle's `langRe`, rebuilt here for the pipeline composition). */
  private def wordsRe(ws: Seq[String]) = "\\b(" + ws.mkString("|") + ")\\b"

  /** BM25-scored documents for a fixed term set (only docs containing at
    * least one query term score): (doc_id, dl, tf_<term>…, score_micro).
    * All corpus statistics reduce to ONE broadcast row; the score is the
    * exact integer micro-unit contract of [[TrainOps.bm25TermMicro]].
    * Shared by q_bm25_search (top-20 report) and q_hybrid_search (the
    * lexical ranker of the RRF fusion). */
  private[queries] def bm25Scored(s: org.apache.spark.sql.SparkSession, dir: String,
                                  terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val lens = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tt = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tfCols = terms.map(t => sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val tf = tt.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val dfCols = terms.map(t =>
      count_distinct(when(col("term") === t, col("doc_id"))).cast("long").as(s"df_$t"))
    val stats = lens.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("sum_dl"))
      .crossJoin(tt.groupBy().agg(dfCols.head, dfCols.tail: _*))
    val scoreMicro = terms.map(t => TrainOps.bm25TermMicro(
      col(s"tf_$t"), col(s"df_$t"), col("n_docs"),
      col("dl"), col("sum_dl"))).reduce(_ + _)
    lens.join(tf, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score_micro", scoreMicro)
  }

  /** Fixed rank-ordered merge table for q_bpe_encode (common-English
    * pairs; earlier rank = applied first, so "i"+"n" precedes "in"+"g"
    * and "a"+"n" precedes "an"+"d" — the dependency order a learned table
    * would have). Shared verbatim by the Spark plan and the DuckDB oracle. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "e" -> "r",
    "a" -> "n", "an" -> "d", "o" -> "n", "r" -> "e", "a" -> "t",
    "e" -> "n", "o" -> "r", "s" -> "t", "e" -> "s", "o" -> "u")

  def defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------- sequence packing
    // Concat-and-chunk packing at window=512: the global token offset is a
    // distributed two-phase prefix sum in Spark (per-shard totals →
    // driver-side exclusive prefix over #shards rows → broadcast base +
    // per-shard cumsum), never a single-task global window. The oracle is
    // the single-window formulation — equality proves the sharded prefix
    // sum exact.
    "q_pack_sequences" -> QueryDef.sql(
      (s, dir) => TrainOps.packConcatChunk(
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", window = 512L, shardSize = 64L)
        .orderBy("doc_id"),
      """WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok
        |           FROM documents),
        |o AS (SELECT doc_id, n_tok,
        |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |      FROM t WHERE n_tok > 0)
        |SELECT doc_id, n_tok, tok_offset,
        |  tok_offset // 512 AS first_win,
        |  (tok_offset + n_tok - 1) // 512 AS last_win,
        |  (tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1 AS n_wins
        |FROM o ORDER BY doc_id""".stripMargin,
      doc = "concat-and-chunk sequence packing via a distributed two-phase " +
        "prefix sum; oracle is the naive global window"),

    // First-fit-decreasing BIN packing (docs packed whole, budget=512):
    // the real LLM batch-assembly shape q_pack_sequences' concat-chunker
    // approximates by splitting docs. Spark runs the sharded FFD fold
    // (decreasing rank via the two-phase per-length prefix, sequential
    // first-fit inside each 100-doc shard); the oracle replays the
    // IDENTICAL fold as a DuckDB recursive CTE carrying the bin-remainder
    // list, so the hash match proves the distributed fold == the
    // sequential reference. chunker_windows rides along as the packing
    // lower bound (efficiency vs the naive chunker in one column).
    "q_pack_bins" -> QueryDef.sql(
      (s, dir) => TrainOps.packBinsFfd(
        Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", budget = 512L, shardSize = 100)
        .orderBy("bin_id"),
      s"""WITH RECURSIVE t AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok FROM documents),
         |f AS (SELECT doc_id, n_tok FROM t WHERE n_tok > 0 AND n_tok <= 512),
         |r AS (SELECT doc_id, n_tok,
         |        ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS rn,
         |        (ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1) // 100 AS shard
         |      FROM f),
         |s AS (
         |  SELECT CAST(0 AS BIGINT) AS k, CAST(NULL AS BIGINT) AS doc_id,
         |         CAST(0 AS BIGINT) AS n_tok, CAST(-1 AS BIGINT) AS shard,
         |         CAST(0 AS BIGINT) AS bin_idx, CAST([] AS BIGINT[]) AS rems
         |  UNION ALL
         |  SELECT k, doc_id, n_tok, shard,
         |    CASE WHEN pos IS NULL OR pos = 0 THEN len(cur) + 1 ELSE pos END AS bin_idx,
         |    CASE WHEN pos IS NULL OR pos = 0 THEN list_append(cur, 512 - n_tok)
         |         ELSE list_transform(range(1, len(cur) + 1),
         |                i -> CASE WHEN i = pos THEN cur[i] - n_tok ELSE cur[i] END)
         |    END AS rems
         |  FROM (
         |    SELECT r.rn AS k, r.doc_id, r.n_tok, r.shard,
         |      CASE WHEN r.shard <> s.shard THEN CAST([] AS BIGINT[]) ELSE s.rems END AS cur,
         |      list_position(list_transform(
         |        CASE WHEN r.shard <> s.shard THEN CAST([] AS BIGINT[]) ELSE s.rems END,
         |        x -> x >= r.n_tok), true) AS pos
         |    FROM s JOIN r ON r.rn = s.k + 1)
         |),
         |a AS (SELECT shard, bin_idx, doc_id, n_tok FROM s WHERE k > 0),
         |b AS (SELECT shard * 100 + bin_idx - 1 AS bin_id, COUNT(*) AS n_docs,
         |        CAST(SUM(n_tok) AS BIGINT) AS bin_tokens FROM a GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_bins,
         |          CAST(SUM(bin_tokens) AS BIGINT) AS tt FROM b)
         |SELECT bin_id, n_docs, bin_tokens,
         |  (bin_tokens * 1000000) // 512 AS fill_ppm,
         |  total_bins, (tt + 511) // 512 AS chunker_windows
         |FROM b CROSS JOIN tot ORDER BY bin_id""".stripMargin,
      doc = "first-fit-decreasing bin packing (whole docs, 512-token " +
        "budget, sharded FFD fold); oracle = the sequential fold as a " +
        "recursive CTE; chunker_windows column = efficiency lower bound"),

    // -------------------------------------------- repetition/quality gate
    // Gopher-style repetition filters (Rae et al. 2021, §A1.1 adapted to
    // word level): fraction of tokens taken by the most frequent token,
    // fraction of duplicate 2-grams, mean token length, token count — and
    // the keep/drop verdict a pipeline gates on. Thresholds sit inside the
    // corpus distribution (frac_top p90≈0.14, dup2 p90≈0.065) so both
    // branches of the verdict are exercised. Metrics are truncating
    // integer micro-unit quotients (`a*10^k div b`, then /10^k back to
    // double) — a rounded double quotient can land exactly on the halfway
    // digit where the engines' rounding laws split (seen live in
    // q_lm_perplexity at sf0.1; FIXTURES.md), while integer division has
    // no rounding law, and the verdict compares the same computed number.
    "q_quality_gopher" -> QueryDef.sql(
      (s, dir) => {
        val t = Tables.documentsWide(s, dir)
          .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("toks"))
        val base = t.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          size(TextOps.shingles(col("text"), 2)).cast("long").as("n_d2"),
          length(array_join(col("toks"), "")).cast("long").as("sum_len"))
        val top = t.select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max("c").as("top_c"))
        base.join(top, "doc_id")
          .filter(col("n_tok") >= 2)
          .select(col("doc_id"), col("n_tok"),
            (expr("(top_c * 1000000) div n_tok").cast("double") / 1000000d).as("frac_top"),
            (expr("((n_tok - 1 - n_d2) * 1000000) div (n_tok - 1)").cast("double") / 1000000d).as("dup2_frac"),
            (expr("(sum_len * 10000) div n_tok").cast("double") / 10000d).as("mean_len"))
          .withColumn("keep",
            col("n_tok").between(20, 100000) && col("frac_top") <= 0.12 &&
              col("dup2_frac") <= 0.05 && col("mean_len").between(3.0, 10.0))
          .orderBy("doc_id")
      },
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |              FROM documents),
        |base AS (SELECT doc_id, len(t) AS n_tok,
        |    len(list_distinct([t[i]||'_'||t[i+1] for i in range(1, len(t))])) AS n_d2,
        |    length(list_aggregate(t, 'string_agg', '')) AS sum_len
        |  FROM toks),
        |tt AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |top AS (SELECT doc_id, MAX(c) AS top_c FROM
        |          (SELECT doc_id, term, COUNT(*) AS c FROM tt GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |m AS (SELECT doc_id, n_tok,
        |    CAST((top_c * 1000000) // n_tok AS DOUBLE) / 1000000.0 AS frac_top,
        |    CAST(((n_tok - 1 - n_d2) * 1000000) // (n_tok - 1) AS DOUBLE) / 1000000.0 AS dup2_frac,
        |    CAST((sum_len * 10000) // n_tok AS DOUBLE) / 10000.0 AS mean_len
        |  FROM base JOIN top USING (doc_id) WHERE n_tok >= 2)
        |SELECT doc_id, n_tok, frac_top, dup2_frac, mean_len,
        |  (n_tok BETWEEN 20 AND 100000 AND frac_top <= 0.12
        |   AND dup2_frac <= 0.05 AND mean_len BETWEEN 3.0 AND 10.0) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
      doc = "Gopher-style repetition metrics + keep/drop verdict per document"),

    // -------------------------------------------- benchmark contamination
    // Eval-set n-gram contamination screen (the GPT-3/PaLM decontamination
    // step): every corpus document sharing a distinct 4-gram with any
    // held-out eval document (here: doc_id % 50 = 0) is reported with how
    // many of its grams are tainted and by how many eval docs. Scale shape:
    // the eval side is tiny by construction → broadcast equi-join on the
    // gram; the corpus side streams through once. The per-doc gram-set size
    // rides the explode (no join-back to a count table).
    "q_contamination" -> QueryDef.sql(
      (s, dir) => {
        val g = Tables.documentsWide(s, dir)
          .select(col("doc_id"), TextOps.shingles(col("text"), 4).as("grams"))
          .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
            explode(col("grams")).as("g"))
        val ev = g.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("eval_id"), col("g"))
        g.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(ev), "g")
          .groupBy("doc_id", "n_grams")
          .agg(count_distinct(col("g")).as("n_tainted"),
            count_distinct(col("eval_id")).as("n_eval_docs"))
          .select(col("doc_id"), col("n_tainted"), col("n_eval_docs"),
            round(col("n_tainted").cast("double") / col("n_grams"), 6).as("tainted_frac"))
          .orderBy("doc_id")
      },
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |              FROM documents),
        |grams AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM
        |  (SELECT doc_id, list_distinct([t[i]||'_'||t[i+1]||'_'||t[i+2]||'_'||t[i+3]
        |     for i in range(1, len(t) - 2)]) AS gs FROM toks)),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % 50 = 0)
        |SELECT doc_id, COUNT(DISTINCT g) AS n_tainted,
        |  COUNT(DISTINCT eval_id) AS n_eval_docs,
        |  ROUND(CAST(COUNT(DISTINCT g) AS DOUBLE) / ANY_VALUE(n_grams), 6) AS tainted_frac
        |FROM grams JOIN ev USING (g)
        |WHERE doc_id % 50 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      doc = "4-gram eval-set contamination screen (broadcast eval side)"),

    // --------------------------------------------------- BM25 retrieval
    // Top-20 BM25(k1=1.2, b=0.75) ranking for a fixed 3-term query. All
    // corpus statistics (N, Σdl, per-term df) reduce to ONE broadcast row;
    // per-document term frequencies are conditional aggregates over one
    // exploded pass. The score follows the integer micro-unit contract
    // (TrainOps.bm25TermMicro): the round-4 rounded-double version split
    // the engines at the halfway digit of round(score, 4) — the same trap
    // q_lm_perplexity hit and fixed (FIXTURES.md). Only the idf `ln` stays
    // a double (rounded to 6 dp, exactly scaled to micros); the length
    // norm and the per-term score are truncating integer quotients.
    "q_bm25_search" -> QueryDef.sql(
      (s, dir) => bm25Scored(s, dir, Seq("spark", "join", "filter"))
        .select(col("doc_id"), col("dl"),
          col("tf_spark"), col("tf_join"), col("tf_filter"),
          (col("score_micro").cast("double") / 1000000d).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(20),
      {
        def bmTerm(t: String): String =
          s"""(CAST(round(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5)
             |        / (CAST(df_$t AS DOUBLE) + 0.5)), 6) * 1000000) AS BIGINT)
             |     * tf_$t * 2200000)
             |    // (tf_$t * 1000000 + 300000 + (900000 * dl * n_docs) // sum_dl)""".stripMargin
        s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          |              FROM documents),
          |lens AS (SELECT doc_id, len(t) AS dl FROM toks),
          |tt AS (SELECT doc_id, unnest(t) AS term FROM toks),
          |tf AS (SELECT doc_id,
          |    CAST(SUM(CASE WHEN term = 'spark'  THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
          |    CAST(SUM(CASE WHEN term = 'join'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
          |    CAST(SUM(CASE WHEN term = 'filter' THEN 1 ELSE 0 END) AS BIGINT) AS tf_filter
          |  FROM tt WHERE term IN ('spark', 'join', 'filter') GROUP BY doc_id),
          |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM lens),
          |dfs AS (SELECT
          |    COUNT(DISTINCT CASE WHEN term = 'spark'  THEN doc_id END) AS df_spark,
          |    COUNT(DISTINCT CASE WHEN term = 'join'   THEN doc_id END) AS df_join,
          |    COUNT(DISTINCT CASE WHEN term = 'filter' THEN doc_id END) AS df_filter
          |  FROM tt WHERE term IN ('spark', 'join', 'filter'))
          |SELECT doc_id, dl, tf_spark, tf_join, tf_filter,
          |  CAST(${bmTerm("spark")}
          |   + ${bmTerm("join")}
          |   + ${bmTerm("filter")} AS DOUBLE) / 1000000.0 AS score
          |FROM lens JOIN tf USING (doc_id) CROSS JOIN stats CROSS JOIN dfs
          |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      },
      doc = "BM25 top-20 for a fixed term set; one broadcast stats row; " +
        "integer micro-unit score contract"),

    // --------------------------------------------- smart sampling
    // Neyman-style stratified sampling: budget allocated across sources
    // proportionally to N_h·(MAD_h+1) via exact largest-remainder
    // apportionment, selection by the portable hash order through the
    // native bounded top-k aggregate (<= budget pairs per stratum cross
    // the exchange; no stratum-sized sort). The dispersion-aware
    // complement of q_stratified_split's fixed-rate buckets.
    "q_neyman_sample" -> QueryDef.sql(
      (s, dir) => TrainOps.neymanSample(Tables.documents(s, dir),
        "doc_id", "source", size(TextOps.tokens(col("text"))), budget = 60),
      """WITH s AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS score
        |  FROM documents),
        |b AS (SELECT source, score, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
        |cb AS (SELECT source, score,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY score
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM b),
        |q AS (SELECT source, MIN(CASE WHEN cum * 2 >= n THEN score END) AS p50,
        |      CAST(MAX(n) AS BIGINT) AS n FROM cb GROUP BY source),
        |d AS (SELECT s.source, abs(s.score - q.p50) AS dev
        |      FROM s JOIN q ON s.source = q.source),
        |db AS (SELECT source, dev, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |dcb AS (SELECT source, dev,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY dev
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM db),
        |m AS (SELECT source, MIN(CASE WHEN cum * 2 >= n THEN dev END) AS mad
        |      FROM dcb GROUP BY source),
        |st AS (SELECT q.source, q.n, q.n * (m.mad + 1) AS w
        |       FROM q JOIN m ON m.source = q.source),
        |al AS (SELECT source, n, w,
        |    CAST((w * 60) // CAST(SUM(w) OVER () AS BIGINT) AS BIGINT) AS f,
        |    w * 60 - ((w * 60) // CAST(SUM(w) OVER () AS BIGINT))
        |      * CAST(SUM(w) OVER () AS BIGINT) AS r
        |  FROM st),
        |al2 AS (SELECT *, ROW_NUMBER() OVER (ORDER BY r DESC, source ASC) AS extra_rank,
        |    60 - CAST(SUM(f) OVER () AS BIGINT) AS n_extra FROM al),
        |alloc AS (SELECT source, n AS n_stratum,
        |    LEAST(f + CASE WHEN extra_rank <= n_extra THEN 1 ELSE 0 END, n) AS n_h
        |  FROM al2),
        |pri AS (SELECT source, doc_id,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h FROM s),
        |rk AS (SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn FROM pri)
        |SELECT rk.source, doc_id, CAST(rn AS BIGINT) AS rn, n_h, n_stratum
        |FROM rk JOIN alloc ON alloc.source = rk.source
        |WHERE rn <= n_h ORDER BY rk.source, rn""".stripMargin,
      doc = "Neyman-style dispersion-proportional stratified sample: " +
        "exact largest-remainder allocation + native bounded top-k " +
        "selection by portable hash order, fully oracle-checked"),

    // --------------------------------------------- association mining
    // A-priori frequent triples + rules over document token baskets:
    // broadcast L1 prunes the per-doc item table first (Zipf keeps it
    // tiny at a 20% floor), downward-closure semi-joins prune triple
    // candidates, confidence in truncating integer micro-units.
    "q_freq_itemsets" -> QueryDef.sql(
      (s, dir) => TrainOps.freqItemsets(Tables.documents(s, dir),
        "doc_id", "text", supDenom = 5),
      TrainOps.freqItemsetsOracle(supDenom = 5),
      doc = "a-priori frequent token triples + association rules " +
        "(support >= 20% of docs, broadcast candidate prunes, " +
        "integer-micro confidence, ranked top-50)"),

    // --------------------------------------------- evaluation metric
    // Exact rank-sum ROC-AUC (Mann-Whitney U, midrank ties) of "token
    // count predicts English": the metric that grades the classifier
    // above. Doubled midrank units keep the halves integer; the cumulative
    // window runs over the bounded distinct-score table, never the corpus.
    "q_auc" -> QueryDef.sql(
      (s, dir) => TrainOps.rocAuc(Tables.documents(s, dir),
        size(TextOps.tokens(col("text"))), col("lang") === "en"),
      """WITH s AS (SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS score,
        |             lang = 'en' AS y
        |           FROM documents),
        |b AS (SELECT score, COUNT(*) AS c, COUNT(CASE WHEN y THEN 1 END) AS cp
        |      FROM s GROUP BY score),
        |cb AS (SELECT *, SUM(c) OVER (ORDER BY score
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cum_before
        |       FROM b),
        |a AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |        CAST(SUM(c) - SUM(cp) AS BIGINT) AS n_neg,
        |        CAST(SUM(cp * (2*cum_before + c + 1)) AS BIGINT) AS r2
        |      FROM cb)
        |SELECT n_pos, n_neg, (r2 - n_pos*(n_pos+1)) AS u2,
        |  ((r2 - n_pos*(n_pos+1)) * 1000000) // (2 * n_pos * n_neg) AS auc_micro
        |FROM a""".stripMargin,
      doc = "exact rank-sum ROC-AUC (midrank ties, doubled-unit integer " +
        "U statistic) over the bounded score-bucket table, fully " +
        "oracle-checked"),

    // --------------------------------------------- trained classifier
    // Distributed multinomial Naive Bayes (the GPT-3/LLaMA quality-
    // classifier and fastText lang-id shape): fit on the 80% train split
    // in one partial-agg pass, score the 20% test split against the
    // broadcast model. Every ln is rounded to integer micro-units, so
    // scores are exact BIGINT sums and the argmax is engine-invariant.
    "q_nb_classifier" -> QueryDef.sql(
      (s, dir) => graft.ops.Classify.naiveBayesPredict(
          Tables.documents(s, dir), "doc_id", "text", "lang",
          labels = Seq("de", "en", "es", "fr", "zh"),
          isTest = col("doc_id") % 5 === 0)
        .orderBy("doc_id"),
      """WITH toks AS (SELECT doc_id, lang, doc_id % 5 = 0 AS is_test,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |cnt AS (SELECT term,
        |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS c_de,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_en,
        |    CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS c_es,
        |    CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS c_fr,
        |    CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS c_zh
        |  FROM toks WHERE NOT is_test GROUP BY term),
        |wt AS (SELECT *, COUNT(*) OVER () AS v,
        |    SUM(c_de) OVER () AS t_de, SUM(c_en) OVER () AS t_en,
        |    SUM(c_es) OVER () AS t_es, SUM(c_fr) OVER () AS t_fr,
        |    SUM(c_zh) OVER () AS t_zh
        |  FROM cnt),
        |model AS (
        |  SELECT term, 0 AS lidx, CAST(round(ln((c_de + 1.0)/CAST(t_de + v AS DOUBLE))*1000000, 0) AS BIGINT) AS ll FROM wt
        |  UNION ALL SELECT term, 1, CAST(round(ln((c_en + 1.0)/CAST(t_en + v AS DOUBLE))*1000000, 0) AS BIGINT) FROM wt
        |  UNION ALL SELECT term, 2, CAST(round(ln((c_es + 1.0)/CAST(t_es + v AS DOUBLE))*1000000, 0) AS BIGINT) FROM wt
        |  UNION ALL SELECT term, 3, CAST(round(ln((c_fr + 1.0)/CAST(t_fr + v AS DOUBLE))*1000000, 0) AS BIGINT) FROM wt
        |  UNION ALL SELECT term, 4, CAST(round(ln((c_zh + 1.0)/CAST(t_zh + v AS DOUBLE))*1000000, 0) AS BIGINT) FROM wt),
        |pri AS (SELECT lang, COUNT(*) AS n_l FROM documents
        |        WHERE doc_id % 5 <> 0 GROUP BY lang),
        |priors AS (SELECT
        |    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
        |              WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS lidx,
        |    CAST(round(ln(CAST(n_l AS DOUBLE)/(SELECT SUM(n_l) FROM pri))*1000000, 0) AS BIGINT) AS prior
        |  FROM pri),
        |sc AS (SELECT t.doc_id, t.lang, m.lidx, SUM(m.ll) + MIN(p.prior) AS score
        |  FROM toks t JOIN model m USING (term) JOIN priors p ON p.lidx = m.lidx
        |  WHERE t.is_test GROUP BY 1, 2, 3),
        |best AS (SELECT doc_id, lang, lidx,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lidx ASC) AS rn
        |  FROM sc)
        |SELECT doc_id, ['de','en','es','fr','zh'][lidx + 1] AS pred, lang AS actual,
        |  (['de','en','es','fr','zh'][lidx + 1] = lang) AS correct
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,
      doc = "distributed multinomial Naive Bayes lang classifier: " +
        "one-pass fit, broadcast-model scoring, exact integer micro-unit " +
        "log-probabilities, fully oracle-checked"),

    // ------------------------------------------------- hybrid retrieval
    // Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) of the two
    // production rankers: BM25 lexical top-50 and IVF semantic top-50
    // (fixed seeded centroids — the oracle-checkable tier), fused as
    // Σ 1e6 // (60 + rank) over the TRUNCATED lists (a doc absent from a
    // list contributes 0 — the standard practical form, which also keeps
    // every rank window bounded at 50 rows instead of corpus-sized).
    // Exact integer micro-units throughout: ranks are integers and the
    // fusion is truncating division, so both engines agree bit-for-bit.
    "q_hybrid_search" -> QueryDef.sql(
      (s, dir) => {
        val kList = 50
        val lexTop = bm25Scored(s, dir, Seq("spark", "join", "filter"))
          .orderBy(col("score_micro").desc, col("doc_id")).limit(kList)
          .withColumn("lex_rn", row_number().over(
            Window.orderBy(col("score_micro").desc, col("doc_id"))))
          .select(col("doc_id"), col("lex_rn").cast("long").as("lex_rn"))
        val emb = Tables.embeddings(s, dir)
        val semTop = graft.ops.Similarity.ivfTopKFixed(emb,
            emb.filter(col("vec_id") === 7), k = kList, nList = 16, nProbe = 4)
          .select(col("nid").as("doc_id"), col("rn").cast("long").as("sem_rn"))
        def rrf(rn: org.apache.spark.sql.Column) = coalesce(
          call_function("div", lit(1000000L), lit(60L) + rn), lit(0L))
        lexTop.join(semTop, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (rrf(col("lex_rn")) + rrf(col("sem_rn"))).as("rrf_micro"),
            coalesce(col("lex_rn"), lit(0L)).as("lex_rn"),
            coalesce(col("sem_rn"), lit(0L)).as("sem_rn"))
          .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
      }, {
        def bmTermMicro(t: String): String =
          s"""(CAST(round(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5)
             |        / (CAST(df_$t AS DOUBLE) + 0.5)), 6) * 1000000) AS BIGINT)
             |     * tf_$t * 2200000)
             |    // (tf_$t * 1000000 + 300000 + (900000 * dl * n_docs) // sum_dl)""".stripMargin
        val centRows = (0 until 16).map { c =>
          val ctr = graft.ops.Similarity.fixedCentroid(c, 64)
          s"($c, ${ctr.mkString("[", ",", "]")}, ${ctr.map(x => x * x).sum})"
        }.mkString(",\n|    ")
        s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
           |              FROM documents),
           |lens AS (SELECT doc_id, len(t) AS dl FROM toks),
           |tt AS (SELECT doc_id, unnest(t) AS term FROM toks),
           |tf AS (SELECT doc_id,
           |    CAST(SUM(CASE WHEN term = 'spark'  THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
           |    CAST(SUM(CASE WHEN term = 'join'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
           |    CAST(SUM(CASE WHEN term = 'filter' THEN 1 ELSE 0 END) AS BIGINT) AS tf_filter
           |  FROM tt WHERE term IN ('spark', 'join', 'filter') GROUP BY doc_id),
           |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM lens),
           |dfs AS (SELECT
           |    COUNT(DISTINCT CASE WHEN term = 'spark'  THEN doc_id END) AS df_spark,
           |    COUNT(DISTINCT CASE WHEN term = 'join'   THEN doc_id END) AS df_join,
           |    COUNT(DISTINCT CASE WHEN term = 'filter' THEN doc_id END) AS df_filter
           |  FROM tt WHERE term IN ('spark', 'join', 'filter')),
           |sc AS (SELECT doc_id, ${bmTermMicro("spark")}
           |   + ${bmTermMicro("join")}
           |   + ${bmTermMicro("filter")} AS sm
           |  FROM lens JOIN tf USING (doc_id) CROSS JOIN stats CROSS JOIN dfs),
           |ltop AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sm DESC, doc_id) AS lex_rn
           |  FROM sc ORDER BY sm DESC, doc_id LIMIT 50),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
           |cent(cid, cv, cc) AS (VALUES
           |    $centRows),
           |ca AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, cent.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |        (list_inner_product(v, v) - 2.0*list_inner_product(v, cv) + cc), cid) AS rnk
           |    FROM e CROSS JOIN cent) WHERE rnk = 1),
           |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id = 7),
           |pr AS (SELECT qid, cid FROM (
           |    SELECT q.qid, cent.cid,
           |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
           |        (list_inner_product(qv, qv) - 2.0*list_inner_product(qv, cv) + cc), cid) AS rnk
           |    FROM q CROSS JOIN cent) WHERE rnk <= 4),
           |p AS (SELECT q.qid, n.vec_id AS nid,
           |        ROUND(list_inner_product(qv, n.v)/(qnrm*n.nrm), 6) AS cos
           |      FROM q JOIN pr ON pr.qid = q.qid
           |            JOIN ca ON ca.cid = pr.cid
           |            JOIN n ON n.vec_id = ca.vec_id AND n.vec_id <> q.qid),
           |stop AS (SELECT nid AS doc_id, rn AS sem_rn FROM (
           |    SELECT nid, ROW_NUMBER() OVER (ORDER BY cos DESC, nid) AS rn FROM p)
           |  WHERE rn <= 50),
           |f AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
           |    (COALESCE(1000000 // (60 + l.lex_rn), 0)
           |     + COALESCE(1000000 // (60 + r.sem_rn), 0))::BIGINT AS rrf_micro,
           |    COALESCE(l.lex_rn, 0)::BIGINT AS lex_rn,
           |    COALESCE(r.sem_rn, 0)::BIGINT AS sem_rn
           |  FROM ltop l FULL OUTER JOIN stop r ON l.doc_id = r.doc_id)
           |SELECT doc_id, rrf_micro, lex_rn, sem_rn FROM f
           |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin
      },
      doc = "hybrid retrieval: BM25 lexical + IVF semantic top-50 lists " +
        "fused by Reciprocal Rank Fusion in exact integer micro-units, " +
        "fully oracle-checked"),

    // ----------------------------------------------- temperature mixing
    // Temperature-weighted source mixing (T=2, the multilingual-sampling
    // rule): target share per source ∝ (n_s/N)^(1/T); documents accepted by
    // a deterministic content hash against the per-source rate, so the mix
    // is reproducible under re-partitioning and re-runs. Determinism: the
    // sqrt weight is the ONLY rounded double (transcendental — never lands
    // on a halfway digit), exactly scaled to BIGINT nano-units; the share
    // p, the rate, and the achieved ratio are all truncating integer
    // micro-unit quotients (`a*10^6 div b`). The round-4 version rounded
    // the rate/achieved double quotients and split the engines at the
    // halfway digit (same trap as q_lm_perplexity; FIXTURES.md).
    // Water-filling budget allocation: spread a 300-doc sampling budget
    // across sources as EQUALLY as capacity allows — small sources
    // saturate at their capacity, the leftover redistributes, and every
    // unsaturated source lands on one common water level. The classic
    // capped-fair-share allocator, in CLOSED FORM: sort sources by
    // capacity; a source saturates iff cap*(remaining sources) fits the
    // remaining budget (pure integer compare, no division); the first
    // unsaturated row's candidate level IS the final level. One ~20-row
    // window pass over the per-source agg table — no iteration to unroll,
    // at any corpus size the windows run on |sources| rows.
    "q_mix_waterfill" -> QueryDef.sql(
      (s, dir) => {
        val budget = 300L
        val w1 = Window.orderBy(col("n_docs"), col("source"))
        val whole = Window.partitionBy()
        Tables.documents(s, dir)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
          .withColumn("k", row_number().over(w1).cast("long"))
          .withColumn("p", sum("n_docs").over(w1))
          .withColumn("nn", count(lit(1)).over(whole))
          .withColumn("rem", lit(budget) - (col("p") - col("n_docs")))
          .withColumn("m", col("nn") - col("k") + 1L)
          .withColumn("sat", col("n_docs") * col("m") <= col("rem"))
          .withColumn("lvm", call_function("div", col("rem") * 1000000L, col("m")))
          .withColumn("kstar", min(when(not(col("sat")), col("k"))).over(whole))
          .withColumn("level_micro",
            max(when(col("k") === col("kstar"), col("lvm"))).over(whole))
          .withColumn("alloc_micro",
            when(col("sat"), col("n_docs") * 1000000L).otherwise(col("level_micro")))
          .select("source", "n_docs", "sat", "alloc_micro", "level_micro")
          .orderBy("source")
      },
      """WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |o AS (SELECT source, n_docs,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_docs, source) AS BIGINT) AS k,
        |    CAST(SUM(n_docs) OVER (ORDER BY n_docs, source
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS nn
        |  FROM s),
        |c AS (SELECT *, 300 - (p - n_docs) AS rem, nn - k + 1 AS m FROM o),
        |d AS (SELECT *, n_docs * m <= rem AS sat,
        |        CAST((rem * 1000000) // m AS BIGINT) AS lvm FROM c),
        |f AS (SELECT *, MIN(CASE WHEN NOT sat THEN k END) OVER () AS kstar FROM d),
        |g AS (SELECT *, MAX(CASE WHEN k = kstar THEN lvm END) OVER () AS level_micro
        |      FROM f)
        |SELECT source, n_docs, sat,
        |  CAST(CASE WHEN sat THEN n_docs * 1000000 ELSE level_micro END AS BIGINT)
        |    AS alloc_micro,
        |  level_micro
        |FROM g ORDER BY source""".stripMargin,
      doc = "water-filling budget allocation: capped fair share of a " +
        "300-doc budget per source via the closed-form breakpoint — " +
        "saturated sources at capacity, the rest on one water level"),

    "q_mix_temperature" -> QueryDef.sql(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nTarget = 200L
        val counts = docs.groupBy("source").agg(count(lit(1)).cast("long").as("n_docs"))
        val weighted = counts.withColumn("w_nano",
          round(round(sqrt(col("n_docs").cast("double") /
            sum("n_docs").over(Window.partitionBy()).cast("double")), 9)
            * 1000000000d).cast("long"))
        val rates = weighted
          .withColumn("sum_w_nano", sum("w_nano").over(Window.partitionBy()))
          .withColumn("p_micro", expr("(w_nano * 1000000) div sum_w_nano"))
          .withColumn("rate_micro",
            least(lit(1000000L), expr(s"(p_micro * $nTarget) div n_docs")))
          .withColumn("rate", col("rate_micro").cast("double") / 1000000d)
          .select("source", "n_docs", "rate")
        val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") / lit(4294967296.0)
        docs.join(broadcast(rates), "source")
          .withColumn("kept", (u < col("rate")).cast("long"))
          .groupBy("source", "n_docs", "rate")
          .agg(sum("kept").as("n_kept"))
          .select(col("source"), col("n_docs"), col("rate"), col("n_kept"),
            (expr("(n_kept * 1000000) div n_docs").cast("double") / 1000000d)
              .as("achieved"))
          .orderBy("source")
      },
      s"""WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs,
        |    CAST(ROUND(ROUND(sqrt(CAST(n_docs AS DOUBLE) /
        |      CAST(SUM(n_docs) OVER () AS DOUBLE)), 9) * 1000000000) AS BIGINT) AS w_nano
        |  FROM counts),
        |r AS (SELECT source, n_docs,
        |    CAST(LEAST(1000000,
        |      (((w_nano * 1000000) // SUM(w_nano) OVER ()) * 200) // n_docs)
        |      AS DOUBLE) / 1000000.0 AS rate
        |  FROM w)
        |SELECT d.source, r.n_docs, r.rate,
        |  CAST(SUM(CASE WHEN ${hashUniform("d.doc_id")} < r.rate THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST((SUM(CASE WHEN ${hashUniform("d.doc_id")} < r.rate THEN 1 ELSE 0 END)
        |    * 1000000) // r.n_docs AS DOUBLE) / 1000000.0 AS achieved
        |FROM documents d JOIN r USING (source)
        |GROUP BY d.source, r.n_docs, r.rate ORDER BY d.source""".stripMargin,
      doc = "temperature-weighted (T=2) deterministic source mixing report"),

    // --------------------------------------------------------- PageRank
    // Fixed-5-iteration PageRank over the customer↔supplier trade graph
    // (distinct pairs from lineitem⋈orders, walked both ways). The oracle
    // unrolls the same five Pregel rounds as chained CTEs — rank values are
    // bit-identical under the shared fixed-point micro-unit contract
    // (see TrainOps.pageRank). Top 50 by rank so the output stays readable.
    "q_pagerank" -> QueryDef.sql(
      (s, dir) => {
        // widen co-partitions both (column-pruned) sides on the join key
        // - the widen repartition IS the join's exchange - and the distinct
        // + 5 rank iterations inherit real parallelism.
        // r15 (guide §2.3, narrower types): node ids travel as PACKED
        // LONGS (cust = 2k, supp = 2k+1 — the ranges may overlap, the low
        // bit is the type tag) through the distinct, the degree table and
        // all 5 rank iterations; the 'c…'/'s…' STRINGS are reconstructed
        // only on the final node-sized table, before the same
        // orderBy(pr_micro, id)/limit — so the tie-break still compares
        // the exact string ids and the hash-ordered output is unchanged.
        // Join keys and groupBy keys shrink from ~8-byte strings +
        // per-row concat to primitive longs in every shuffle.
        val edges = Tables.widen(Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_suppkey")), "l_orderkey")
          .join(Tables.widen(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey")), "o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        TrainOps.pageRank(edges, iters = 5)
          .select(
            when(col("id") % 2 === 0, concat(lit("c"), shiftright(col("id"), 1)))
              .otherwise(concat(lit("s"), shiftright(col("id"), 1))).as("id"),
            col("pr_micro"), col("pr"))
          .orderBy(col("pr_micro").desc, col("id")).limit(50)
      },
      TrainOps.pageRankOracle(
        edgesSql = """SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
                     |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
        iters = 5, topK = 50),
      doc = "5-iteration PageRank on the customer-supplier graph, " +
        "bit-identical decimal-sum contract, top 50"),

    // ----------------------------------------------- tokenizer induction
    // BPE merge learning (Sennrich 2016) over the corpus token stream: 6
    // rounds of most-frequent-adjacent-pair + greedy LTR merge. The
    // learned merge table IS the output (round, pair, count) — the
    // deterministic artifact a tokenizer build step ships. The oracle
    // re-derives all 6 rounds from scratch as chained CTEs, so argmax
    // tie-breaks, island alternation, and the re-ranked rewrite are all
    // driver-checked.
    "q_bpe_merges" -> QueryDef.sql(
      (s, dir) => TrainOps.bpeMerges(
        Tables.documents(s, dir), "doc_id", "text", rounds = 6),
      TrainOps.bpeMergesOracle("SELECT doc_id, text FROM documents",
        rounds = 6),
      doc = "BPE tokenizer induction: 6 most-frequent-pair merge rounds " +
        "with greedy left-to-right application (island alternation), " +
        "full unrolled-CTE oracle"),

    // Tokenizer APPLY with the LEARNED merges (round-9 verdict #7): the
    // production step q_bpe_merges → THIS → q_pack_* — learn 6 merges on
    // a deterministic 1/8 document sample (production tokenizers fit on a
    // sample), then encode the FULL corpus with them and report the
    // top-20 subword vocabulary. The learned pairs are a bounded driver
    // artifact, so the corpus-wide apply is a pure-codegen literal
    // replace chain in the scan projection (bpeEncodeStream) — zero
    // shuffles before the final vocabulary count, the only shape that
    // works at 100 TB. The oracle re-learns the same sample's merges from
    // scratch (scale-adaptive) and applies them via scalar-subquery
    // replace args.
    "q_bpe_apply_learned" -> QueryDef.sql(
      (s, dir) => TrainOps.bpeApplyLearned(
        Tables.documents(s, dir), "doc_id", "text", rounds = 6, k = 20),
      TrainOps.bpeApplyOracle("SELECT doc_id, text FROM documents",
        rounds = 6, k = 20),
      doc = "sample-learned (1/8 docs, 6 rounds) BPE merges applied " +
        "corpus-wide as a map-only literal replace chain; top-20 subword " +
        "vocabulary, oracle re-learns and replays the merge sequence"),

    // The ENCODE side of the tokenizer story (q_bpe_merges is the LEARN
    // side): apply a fixed rank-ordered merge table to every corpus word
    // and report the top-20 subword vocabulary by usage. The merge chain
    // is a per-row codegen'd replace sequence inside the scan projection
    // (delimiter rendering makes one pass per merge exact — see
    // TrainOps.bpeEncode); the only shuffle is the final partial-aggregable
    // token count, and limit() runs before the rank window
    // (TakeOrderedAndProject, the q_vocab_topk pattern).
    "q_bpe_encode" -> QueryDef.sql(
      (s, dir) => {
        val toks = Tables.documentsWide(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .select(explode(TrainOps.bpeEncode(col("w"), BpeMerges)).as("token"))
        val g = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        g.orderBy(col("cnt").desc, col("token").asc).limit(20)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("cnt").desc, col("token").asc)))
          .select("rnk", "token", "cnt")
      },
      s"""WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |           FROM documents),
        |e AS (SELECT ${TrainOps.bpeEncodeSql("w", BpeMerges)} AS s FROM t),
        |tok AS (SELECT unnest(regexp_extract_all(s, '<([^>]+)>', 1)) AS token FROM e),
        |g AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
        |top AS (SELECT token, cnt FROM g ORDER BY cnt DESC, token LIMIT 20)
        |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk, token, cnt
        |FROM top ORDER BY rnk""".stripMargin,
      doc = "greedy BPE application of a fixed 15-merge table over the " +
        "corpus word stream; top-20 subword vocabulary, fully " +
        "oracle-checked (codegen'd replace chain, no UDF)"),

    // The OTHER tokenizer family: unigram-LM (SentencePiece-style)
    // segmentation by Viterbi minimum surprisal, next to the BPE tier's
    // merge-table greedy application. Corpus-fit piece vocabulary (all
    // substrings len<=4, micro-bit surprisals under the q_lm_perplexity
    // determinism contract, singles + top-200 multi pieces), then the
    // native DP kernel (graft_viterbi_seg) segments the DISTINCT-word
    // table map-only; the oracle replays the fit and unrolls the DP as
    // chained materialized CTEs with the identical (score ASC, j DESC)
    // tie-break.
    "q_unigram_segment" -> QueryDef.sql(
      (s, dir) => TrainOps.unigramSegment(Tables.documents(s, dir), "text")
        .orderBy("word"),
      TrainOps.unigramSegmentOracle(),
      doc = "unigram-LM (SentencePiece-family) Viterbi word segmentation " +
        "against a corpus-fit scored piece vocabulary, fully oracle-" +
        "checked (native DP kernel over the distinct-word table)"),

    // The unigram tokenizer's LEARN side: one EM-AND-PRUNE round
    // (SentencePiece's training loop) — round-1 Viterbi segmentation is
    // the E-step; the M-step re-scores pieces from usage with add-one
    // smoothing AND prunes the multi-char vocabulary to the top-16 by
    // usage (singles survive, preserving coverage). Pruned-away pieces
    // force their words to re-segment, so `changed` — the convergence
    // signal — is live by construction (pure re-scoring is a fixed point
    // of round 1: rich-get-richer reinforces the E-step's choices). The
    // oracle replays both rounds as two unrolled materialized DP chains.
    "q_unigram_em" -> QueryDef.sql(
      (s, dir) => TrainOps.unigramSegmentEm(Tables.documents(s, dir), "text")
        .orderBy("word"),
      TrainOps.unigramSegmentEmOracle(),
      doc = "unigram-LM tokenizer EM-and-prune round: E-step Viterbi " +
        "usage counts, add-one M-step re-score + top-16 multi-piece " +
        "prune, re-segmentation + per-word change flag, fully " +
        "oracle-checked"),

    // Tokenizer FERTILITY (subword tokens per word) per language — the
    // standard tokenizer-quality metric (a merge table induced on English
    // should show fertility near 1 on English and higher elsewhere).
    // Token counts come from the encoded string's size without exploding
    // subwords: per-word token count = size of the extracted array, summed
    // in the scan projection — ONE partial-aggregable groupBy(lang), no
    // explode-induced row blowup at all.
    "q_bpe_fertility" -> QueryDef.sql(
      (s, dir) => {
        val perDoc = Tables.documentsWide(s, dir).select(
          col("lang"),
          explode(TextOps.tokens(col("text"))).as("w"))
        val counted = perDoc.select(col("lang"),
          size(TrainOps.bpeEncode(col("w"), BpeMerges)).cast("long").as("n_sub"))
        counted.groupBy("lang").agg(
          count(lit(1)).cast("long").as("n_words"),
          sum(col("n_sub")).cast("long").as("n_subwords"),
          round(sum(col("n_sub")).cast("double") / count(lit(1)), 4)
            .as("fertility"))
          .orderBy("lang")
      },
      s"""WITH t AS (SELECT lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |c AS (SELECT lang,
        |    len(regexp_extract_all(${TrainOps.bpeEncodeSql("w", BpeMerges)},
        |        '<([^>]+)>', 1)) AS n_sub
        |  FROM t)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
        |  ROUND(CAST(SUM(n_sub) AS DOUBLE) / COUNT(*), 4) AS fertility
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
      doc = "per-language tokenizer fertility (subwords per word) under " +
        "the fixed merge table — the tokenizer-quality metric, " +
        "oracle-checked with no subword explode"),

    // Weighted sampling without replacement (Efraimidis-Spirakis
    // exponential keys): the corpus-subsampling standard — per-row key
    // projection + global top-k (TakeOrderedAndProject), no sort/shuffle
    // of non-winners. All-integer priorities (md5 uniform, ln in
    // micro-units, truncating /w) so the sample is oracle-identical.
    "q_weighted_sample" -> QueryDef.sql(
      (s, dir) => TrainOps.weightedSample(Tables.documents(s, dir),
        "doc_id", size(TextOps.tokens(col("text"))), k = 50),
      TrainOps.weightedSampleOracle(k = 50),
      doc = "token-count-weighted corpus sample of 50 docs via " +
        "Efraimidis-Spirakis exponential keys, fully oracle-checked"),

    // Per-source weighted sampling through the NATIVE bounded top-k
    // aggregate: <= k (priority, id) pairs per source cross the exchange
    // (no window sort, no skew cliff) — the stratified counterpart of
    // q_weighted_sample; oracle is the naive per-group window.
    "q_weighted_sample_grouped" -> QueryDef.sql(
      (s, dir) => TrainOps.weightedSampleGrouped(Tables.documents(s, dir),
        "doc_id", "source", size(TextOps.tokens(col("text"))), k = 5),
      TrainOps.weightedSampleGroupedOracle(k = 5),
      doc = "per-source Efraimidis-Spirakis weighted sample (k=5) via the " +
        "native graft_topk bounded aggregate, fully oracle-checked"),

    // Per-source quantile normalization of a quality score (cume_dist in
    // truncating micro-units) — the cross-source calibration step before
    // mixing. Two-phase bucket-count form: windows run over the BOUNDED
    // (source, score) bucket table, never over corpus-sized partitions,
    // so one dominant source cannot pin a task (the naive
    // cume_dist-over-source window would).
    "q_score_quantile_norm" -> QueryDef.sql(
      (s, dir) => TrainOps.quantileNormalize(Tables.documents(s, dir),
        "doc_id", "source", size(TextOps.tokens(col("text")))),
      TrainOps.quantileNormalizeOracle,
      doc = "per-source quantile normalization of token-count scores " +
        "(skew-safe two-phase cume_dist), fully oracle-checked"),

    // Outlier-robust per-source score statistics (median / MAD /
    // winsorized mean) — integer-exact order statistics by counting over
    // the bounded bucket table (the quantileNormalize discipline), never
    // a corpus-sized window partition.
    "q_robust_stats" -> QueryDef.sql(
      (s, dir) => TrainOps.robustStats(Tables.documents(s, dir),
        "source", size(TextOps.tokens(col("text")))),
      TrainOps.robustStatsOracle,
      doc = "per-source robust score stats: lower median, MAD, p10/p90 " +
        "winsorized mean in truncating micro-units, fully oracle-checked"),

    // PMI collocations (Church & Hanks 1990): adjacent-bigram pointwise
    // mutual information from the bigram table's own margins — the
    // phrase-vocabulary mining step. One corpus-sized shuffle (bigram
    // counts); margins re-aggregate the vocab-sized count table; N enters
    // as a driver-collected literal; ln in integer micro-units.
    "q_pmi_collocations" -> QueryDef.sql(
      (s, dir) => TextOps.pmiCollocations(
        Tables.documents(s, dir), "text", minCount = 5L, topK = 30),
      TextOps.pmiCollocationsOracle(minCount = 5L, topK = 30),
      doc = "top-30 PMI collocations over adjacent word bigrams " +
        "(margin-based Church–Hanks PMI in integer micro-units), fully " +
        "oracle-checked"),

    // Sliding-window chunking — the SPLIT side of context-window assembly
    // (q_pack_sequences is the CONCAT side): overlapping 64-token windows
    // every 48 tokens, chunk identity = md5 of the joined window so
    // downstream exact dedup collapses repeated chunks. Pure codegen
    // projection + a bounded per-doc explode; no shuffle in the operator.
    "q_chunk_sliding" -> QueryDef.sql(
      (s, dir) => TrainOps.chunkSliding(
          Tables.documents(s, dir), "doc_id", "text", window = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx"),
      TrainOps.chunkSlidingOracle("SELECT doc_id, text FROM documents",
        window = 64, stride = 48),
      doc = "overlapping token-window chunking (64/48): the long-document " +
        "split step of training-sequence assembly, chunk md5 for dedup"),

    // TextTiling topic segmentation (Hearst 1997) — the CONTENT-AWARE
    // chunking complement of q_chunk_sliding's fixed windows: gap cohesion
    // = exact integer dot of the k=2-segment block term counts, depth via
    // running maxima (deterministic stand-in for Hearst's climb-to-peak),
    // boundary iff 2*depth*nGaps >= 3*sumDepth (cross-multiplied integer
    // form of the 1.5x-mean cutoff — no division, no FP). All windows
    // partition by document and are bounded by its own gap count.
    "q_texttiling" -> QueryDef.sql(
      (s, dir) => graft.ops.TextOps.textTiling(
          Tables.documents(s, dir), "doc_id", "text", w = 10, k = 2)
        .orderBy("doc_id", "gap"),
      graft.ops.TextOps.textTilingOracle(w = 10, k = 2),
      doc = "TextTiling topic-boundary detection (integer block-cohesion " +
        "dot, depth scoring, 1.5x-mean cutoff) — content-aware RAG " +
        "chunk boundaries, fully oracle-checked"),

    // DSIR importance resampling (Xie et al. 2023): hashed-bigram
    // importance weights of every document against the target slice
    // (lang = 'en'). The bucket log-ratio table (≤ 256 rows) and the
    // one-row totals broadcast; the only transcendental (ln) is rounded to
    // integer micro-units, so per-doc scores are exact BIGINT sums and the
    // DuckDB twin matches bit-for-bit.
    "q_dsir_weights" -> QueryDef.sql(
      (s, dir) => TrainOps.dsirWeights(Tables.documents(s, dir),
        "doc_id", "text", targetPred = col("lang") === "en", buckets = 256),
      TrainOps.dsirOracle(buckets = 256),
      doc = "DSIR hashed-bigram importance weights vs the en target " +
        "slice: broadcast bucket log-ratios in integer micro-units, " +
        "fully oracle-checked"),

    // -------------------------------------------- end-to-end assembly
    // The flagship composition: the whole corpus→training-batches funnel as
    // ONE declared query — exact dedup (normalization fingerprint, min-id
    // winner via groupBy/min + semi join, never a window sort), language
    // gate (English stopword argmax), quality gate (integer points >= 2),
    // then concat-and-chunk packing of the survivors via the distributed
    // two-phase prefix sum. Every stage reuses the same operator the
    // stage's standalone query declares, so a regression anywhere in the
    // chain flips this hash too; the oracle is the equivalent CTE chain.
    "q_pipeline_assemble" -> QueryDef.sql(
      (s, dir) => {
        // three regex kernels (fingerprint, fused langScores, tokens) run
        // in the scan projection — widen floors their parallelism
        val docs = Tables.documentsWide(s, dir)
        val keep = docs
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
          .groupBy("fp").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
        // one fused scan for all four scores (TextOps.langScores)
        val sc = TextOps.langScores(col("text"))
        val scored = deduped
          .withColumn("en_c", sc.getItem(0))
          .withColumn("de_c", sc.getItem(1))
          .withColumn("fr_c", sc.getItem(2))
          .withColumn("es_c", sc.getItem(3))
          .filter(col("en_c") >= col("de_c") && col("en_c") >= col("fr_c") &&
            col("en_c") >= col("es_c"))
        val toks = TextOps.tokens(col("text"))
        val nToks = size(toks)
        val points =
          when(nToks.between(20, 2000), 1).otherwise(0) +
          when(col("en_c") * 20 >= nToks, 1).otherwise(0) +
          when(size(array_distinct(toks)) * 4 >= nToks, 1).otherwise(0) +
          when(length(col("text")).between(100, 10000), 1).otherwise(0)
        val kept = scored.withColumn("points", points)
          .filter(col("points") >= 2)
          .select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("n_tok"))
        TrainOps.packConcatChunk(kept, "doc_id", "n_tok",
          window = 512L, shardSize = 64L).orderBy("doc_id")
      },
      s"""WITH f AS (SELECT doc_id, text,
         |    md5(lower(trim(regexp_replace(text,'[ \\t\\n\\r\\f\\x0B]+',' ','g')))) AS fp
         |  FROM documents),
         |d AS (SELECT doc_id, text FROM f
         |      QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)),
         |m AS (SELECT doc_id, text, regexp_extract_all(lower(text),'[a-z0-9]+') AS toks,
         |    len(regexp_extract_all(lower(text),'${wordsRe(TextOps.StopwordsEn)}')) AS en_c,
         |    len(regexp_extract_all(lower(text),'${wordsRe(TextOps.StopwordsDe)}')) AS de_c,
         |    len(regexp_extract_all(lower(text),'${wordsRe(TextOps.StopwordsFr)}')) AS fr_c,
         |    len(regexp_extract_all(lower(text),'${wordsRe(TextOps.StopwordsEs)}')) AS es_c
         |  FROM d),
         |q AS (SELECT doc_id, text,
         |    (CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1 ELSE 0 END +
         |     CASE WHEN en_c*20 >= len(toks) THEN 1 ELSE 0 END +
         |     CASE WHEN len(list_distinct(toks))*4 >= len(toks) THEN 1 ELSE 0 END +
         |     CASE WHEN length(text) BETWEEN 100 AND 10000 THEN 1 ELSE 0 END) AS points
         |  FROM m
         |  WHERE en_c >= de_c AND en_c >= fr_c AND en_c >= es_c),
         |k AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tok
         |      FROM q WHERE points >= 2),
         |o AS (SELECT doc_id, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
         |  FROM k WHERE n_tok > 0)
         |SELECT doc_id, n_tok, tok_offset,
         |  tok_offset // 512 AS first_win,
         |  (tok_offset + n_tok - 1) // 512 AS last_win,
         |  (tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1 AS n_wins
         |FROM o ORDER BY doc_id""".stripMargin,
      doc = "end-to-end assembly funnel: exact dedup → language gate → " +
        "quality gate → sequence packing, one oracle-checked composition"),

    // ------------------------------------------------- split hygiene
    // Train/val/test leakage audit: the content-addressed split
    // (q_stratified_split's md5 bucket) is keyed on doc_id, so two docs
    // with IDENTICAL text can land in different splits — exactly the
    // contamination that inflates eval scores. Per split: docs,
    // distinct content fingerprints, and how many of those fingerprints
    // also appear in another split (with the doc count they cover).
    // Scale shape: one partial-aggregable groupBy(split, fp), a window
    // over fp (per-fp groups are ≤ #splits rows after the pre-aggregate,
    // so the window sort is bounded), and a 3-row final rollup — no join
    // back to the corpus, no quadratic anywhere.
    "q_split_leakage" -> QueryDef.sql(
      (s, dir) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100
        val a = Tables.documents(s, dir).select(
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
            .as("split"),
          md5(col("text")).as("fp"))
        val perSplitFp = a.groupBy("split", "fp").agg(count(lit(1)).as("n"))
        val withNs = perSplitFp.withColumn("ns",
          count(lit(1)).over(Window.partitionBy(col("fp"))))
        withNs.groupBy("split").agg(
          sum(col("n")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_fps"),
          count(when(col("ns") >= 2, 1)).cast("long").as("n_leaked_fps"),
          coalesce(sum(when(col("ns") >= 2, col("n"))), lit(0L)).cast("long")
            .as("n_leaked_docs"))
          .orderBy("split")
      },
      """WITH a AS (SELECT
        |    CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split,
        |    md5(text) AS fp
        |  FROM documents),
        |s AS (SELECT split, fp, COUNT(*) AS n FROM a GROUP BY split, fp),
        |w AS (SELECT split, fp, n, COUNT(*) OVER (PARTITION BY fp) AS ns FROM s)
        |SELECT split,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_fps,
        |  CAST(COUNT(CASE WHEN ns >= 2 THEN 1 END) AS BIGINT) AS n_leaked_fps,
        |  CAST(COALESCE(SUM(CASE WHEN ns >= 2 THEN n END), 0) AS BIGINT) AS n_leaked_docs
        |FROM w GROUP BY split ORDER BY split""".stripMargin,
      doc = "cross-split exact-content leakage audit: fingerprints shared " +
        "between train/val/test under the content-addressed hash split"),

    // ------------------------------------------------- dataset card
    // The per-(source, lang) summary a pipeline publishes with a dataset
    // release: volume (docs/chars/tokens), exact-dup density (docs whose
    // content fingerprint appears more than once ANYWHERE in the corpus),
    // mean length. Scale shape: pre-aggregate to (source, lang, fp) FIRST
    // (partial-aggregable, collapses a viral duplicate to one row per
    // group), then a window over fp whose partitions are bounded by the
    // number of (source, lang) groups — never by the dup count — then a
    // tiny final rollup. Two bounded shuffles at any corpus size.
    "q_dataset_card" -> QueryDef.sql(
      (s, dir) => {
        val base = Tables.documents(s, dir).select(
          col("source"), col("lang"), col("n_chars"),
          TextOps.wsTokenCount(col("text")).as("n_tok"),
          md5(col("text")).as("fp"))
        val perFp = base.groupBy("source", "lang", "fp").agg(
          count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
          sum(col("n_tok")).as("st"))
        val withDup = perFp.withColumn("n_same",
          sum(col("n")).over(Window.partitionBy(col("fp"))))
        withDup.groupBy("source", "lang").agg(
          sum(col("n")).cast("long").as("n_docs"),
          sum(col("sc")).cast("long").as("total_chars"),
          sum(col("st")).cast("long").as("total_tokens"),
          coalesce(sum(when(col("n_same") >= 2, col("n"))), lit(0L)).cast("long")
            .as("n_dup_docs"),
          round(sum(col("st")).cast("double") / sum(col("n")), 4).as("avg_tokens"))
          .orderBy("source", "lang")
      },
      """WITH b AS (SELECT source, lang, n_chars,
        |    len(regexp_extract_all(text, '\S+')) AS n_tok, md5(text) AS fp
        |  FROM documents),
        |g AS (SELECT source, lang, fp, COUNT(*) AS n, SUM(n_chars) AS sc,
        |        SUM(n_tok) AS st
        |      FROM b GROUP BY source, lang, fp),
        |w AS (SELECT *, SUM(n) OVER (PARTITION BY fp) AS n_same FROM g)
        |SELECT source, lang,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(sc) AS BIGINT) AS total_chars,
        |  CAST(SUM(st) AS BIGINT) AS total_tokens,
        |  CAST(COALESCE(SUM(CASE WHEN n_same >= 2 THEN n END), 0) AS BIGINT) AS n_dup_docs,
        |  ROUND(CAST(SUM(st) AS DOUBLE) / SUM(n), 4) AS avg_tokens
        |FROM w GROUP BY source, lang ORDER BY source, lang""".stripMargin,
      doc = "per-(source, lang) dataset card: volume, token counts, " +
        "exact-dup density, mean length — the release-summary query")
  )
}
