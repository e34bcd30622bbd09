package graft.ops

import graft.core.Materialize.StageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators for training-data pipelines: segment-level
  * exact dedup (the CCNet / FineWeb "drop repeated lines across the corpus"
  * step), cross-document n-gram duplication scoring (RefinedWeb-style), a
  * unigram-LM quality score (the cheap CCNet perplexity-gate shape), and
  * regex PII redaction. Like the rest of `graft.ops` these target the
  * reference's extension surface (fluent-plugin-sql moves rows; a training
  * pipeline needs content hygiene on top — reference `in_sql.rb:1` has no
  * analog, so these follow the public pipeline literature).
  *
  * Everything is codegen'd `functions._` column work; the only shuffles are
  * the ones the semantics force (one corpus-wide agg per statistic, one
  * join to bring it back). Where a join-back on a possibly-skewed key is
  * unavoidable (segment hash, n-gram), the corpus-side statistic is reduced
  * with a partially-aggregable `groupBy` (map-side combine shrinks the
  * shuffle to one row per distinct key) and the re-join leans on AQE skew
  * splitting — unlike a `Window.partitionBy(key)` formulation, which would
  * funnel every copy of a hot boilerplate segment into a single sort task.
  */
object CleanOps {

  /** Non-overlapping segments of up to `n` tokens each, as ONE codegen'd
    * regex pass over the whitespace-normalized text. The pattern ends on a
    * token character, so segments carry no trailing separator and need no
    * per-element `trim` HOF (higher-order functions are CodegenFallback —
    * see [[TextOps.shingles]]). On corpora with real line structure, pass
    * `split(text, "\n")` instead — [[segmentDedup]] only needs *some*
    * array<string> segmentation. */
  def tokenSegments(text: Column, n: Int): Column = {
    require(n >= 2, s"tokenSegments: n must be >= 2, got $n")
    val pat = s"(?:[a-z0-9]+ ){0,${n - 1}}[a-z0-9]+"
    regexp_extract_all(TextOps.normalizedText(text), lit(pat), lit(0))
  }

  /** Segment-level exact dedup across the corpus: every segment keeps its
    * first occurrence (min `(id, pos)`) and is dropped everywhere else;
    * documents are rebuilt from their surviving segments in order.
    *
    * Scale shape: the winner per segment hash is a `groupBy(h).agg(min)` —
    * partially aggregable, so a boilerplate segment repeated in 10^9
    * documents combines map-side instead of sorting 10^9 rows in one
    * window partition. The mark join re-keys on the same hash; AQE skew
    * handling splits the hot hash because the winner side is one row per
    * key. The rebuild groups by document id, whose group size is bounded
    * by document length.
    *
    * @param segs any `array<string>` segmentation of the document (lines,
    *             sentences, or [[tokenSegments]] chunks). */
  def segmentDedup(docs: DataFrame, idCol: String, segs: Column): DataFrame = {
    val ex = docs
      .select(col(idCol), posexplode(segs).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val winners = ex.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
    ex.join(winners, "h")
      .withColumn("keep", struct(col(idCol), col("pos")) === col("w"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_segs"),
        count(when(col("keep"), lit(1))).cast("long").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("kept_text"))
      .withColumn("retained_frac", // truncating micro-units: no halfway
        (expr("(n_kept * 1000000) div n_segs").cast("double") / 1000000d))
  }

  /** C4 cleaning filters (Raffel et al. 2020 §2.2 — the "Colossal Clean
    * Crawled Corpus" rules, word-level): a line survives iff it ends in
    * terminal punctuation, has at least `minWords` words, and does not
    * mention "javascript"; the page survives iff at least `minKeptLines`
    * lines survived and no line carries a curly brace (code) or the
    * "lorem ipsum" placeholder. Emits per-document counts, the page
    * verdict, and the document rebuilt from surviving lines — the
    * filter-and-rewrite shape every crawl pipeline runs first.
    *
    * Scale shape: line flags ride the exploded rows (one codegen'd pass,
    * no joins); the only shuffle is the rebuild `groupBy(id)`, whose group
    * size is bounded by document length. Page-level flags aggregate as
    * `bool_or` — partially aggregable like the counts.
    *
    * @param lines any `array<string>` line split of the document
    *              (`split(text, "\n")` on corpora with real line
    *              structure). */
  def c4Filter(docs: DataFrame, idCol: String, lines: Column,
               minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val ex = docs.select(col(idCol), posexplode(lines).as(Seq("pos", "line")))
    val flagged = ex
      .withColumn("words",
        size(regexp_extract_all(lower(col("line")), lit("[a-z0-9]+"), lit(0))))
      .withColumn("line_keep",
        col("line").rlike("[.!?\"]$") && col("words") >= minWords &&
          !lower(col("line")).contains("javascript"))
      .withColumn("brace", col("line").contains("{"))
      .withColumn("lorem", lower(col("line")).contains("lorem ipsum"))
    flagged.groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        count(when(col("line_keep"), lit(1))).cast("long").as("n_kept"),
        bool_or(col("brace")).as("has_brace"),
        bool_or(col("lorem")).as("has_lorem"),
        array_join(
          transform(
            array_sort(collect_list(when(col("line_keep"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          "\n").as("cleaned_text"))
      .withColumn("keep",
        col("n_kept") >= minKeptLines && !col("has_brace") && !col("has_lorem"))
  }

  /** Cross-document n-gram duplication fraction (RefinedWeb's
    * "duplicated n-gram" quality signal): for each document, the fraction
    * of its distinct `n`-gram shingles that also occur in at least one
    * other document. The document frequency per gram is a partially
    * aggregable `groupBy(gram).count` joined back on the gram (same skew
    * reasoning as [[segmentDedup]]); per-doc distinct-gram counts ride the
    * exploded rows instead of a second join. */
  def crossDocNgramDup(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val grams = graft.sources.Tables.widen(
      docs.select(col(idCol), col(textCol)), idCol).select(col(idCol),
      explode(TextOps.shingles(col(textCol), n)).as("gram"))
    val df = grams.groupBy("gram")
      .agg(count(lit(1)).cast("long").as("gram_df"))
    grams.join(df, "gram")
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_grams"),
        count(when(col("gram_df") > 1, lit(1))).cast("long").as("n_dup"))
      .withColumn("dup_frac", // truncating micro-units: no halfway
        (expr("(n_dup * 1000000) div n_grams").cast("double") / 1000000d))
  }

  /** Unigram language-model quality score: the mean per-token negative
    * log2-likelihood under an add-one-smoothed unigram model fit on the
    * corpus itself — the cheap, fully-relational shape of CCNet's
    * perplexity gate (gibberish and heavy-repetition documents score far
    * from the corpus mode). p(w) = (c(w)+1) / (T+V).
    *
    * Determinism across engines: each per-term surprisal is ROUNDED to 6
    * decimals *before* the per-document sum, scaled to exact BIGINT
    * micro-bits, and the per-doc mean is INTEGER division — `sum div n`
    * has no rounding law for the engines to disagree on. (The first
    * version rounded a double quotient to 6 decimals; at sf0.1, 2 of
    * ~5000 documents landed exactly on the halfway digit, where Spark's
    * BigDecimal HALF_UP and DuckDB's double rounding split — the same
    * trap FIXTURES.md catalogues for PageRank.) Corpus totals (T, V)
    * reduce to one broadcast row; the term-count join is a plain shuffle
    * join on the term (vocabulary per split is Zipf — orders of magnitude
    * smaller than the corpus). */
  def lmUnigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val docTf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val termC = tok.groupBy("term")
      .agg(count(lit(1)).cast("long").as("c"))
    val stats = termC.agg(
      sum(col("c")).cast("long").as("t_total"),
      count(lit(1)).cast("long").as("v_size"))
    docTf.join(termC, "term")
      .crossJoin(broadcast(stats))
      // micro-bits: round(-log2(p), 6) * 1e6 is within 1e-9 of an integer
      // (same double in both engines), so round-to-int is exact
      .withColumn("nll_micro",
        round(round(-log2((col("c") + 1).cast("double") /
          (col("t_total") + col("v_size")).cast("double")), 6) * 1000000d)
          .cast("long"))
      .groupBy(idCol)
      .agg(
        sum(col("tf")).cast("long").as("n_tok"),
        sum(col("tf") * col("nll_micro")).cast("long").as("nll_sum_micro"))
      .select(col(idCol), col("n_tok"),
        (expr("nll_sum_micro div n_tok").cast("double") / 1000000d).as("avg_nll"))
  }

  /** Interpolated Kneser–Ney BIGRAM language-model score — the realistic
    * form of the CCNet/KenLM perplexity gate (the unigram model above
    * cannot see word order; this one scores every adjacent pair, so
    * shuffled-word salad and stitched boilerplate finally separate from
    * fluent text). Discount D = 3/4, the standard KN value:
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1·) + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/NT
    *
    * evaluated in the EXACT cross-multiplied integer form
    *   num = (4·c − 3)·NT + 3·N1L·N1R,   den = 4·c_left·NT
    * (the model is self-fit, so every scored bigram has c ≥ 1 and the
    * max(c−D, 0) clamp is vacuous; num < den always, so surprisals are
    * positive and the truncating/flooring integer-mean divergence cannot
    * arise). The one transcendental, −log2(num/den), follows the
    * q_lm_perplexity determinism contract: IEEE-identical double division,
    * round to 6 decimals, exact BIGINT micro-bits, integer per-doc mean.
    *
    * Scale shape: bigram occurrences come from the ONE-PASS lookahead
    * regex over the joined token string (the TextOps.shingles trick —
    * no transform() lambda, no per-doc window shuffle for lead()); the
    * model tables (bigram types, left margins, right margins) are all
    * Zipf-bounded far below corpus size, partially aggregable, and meet
    * the per-doc bigram table on one (w1,w2) shuffle; the corpus total NT
    * reduces to a single broadcast row. */
  def lmKneserNeyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val joined = array_join(TextOps.tokens(col(textCol)), "_")
    val bigPat = "(?<![a-z0-9])(?=([a-z0-9]+_[a-z0-9]+))"
    val docBig = graft.sources.Tables.widen(
        docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol),
        explode(regexp_extract_all(joined, lit(bigPat), lit(1))).as("gram"))
      .select(col(idCol),
        substring_index(col("gram"), "_", 1).as("w1"),
        substring_index(col("gram"), "_", -1).as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // typeC (the bigram-TYPE model table, << corpus) feeds four branches
    // (left/right continuation counts, n_types, the score join); unstaged,
    // each branch re-ran the corpus bigram regex + two groupBys — five
    // corpus passes for one query. Stage the model table once.
    val typeC = docBig.groupBy("w1", "w2")
      .agg(sum(col("tf")).cast("long").as("c_big"))
      .staged()
    val leftC = typeC.groupBy("w1")
      .agg(sum(col("c_big")).cast("long").as("c_left"),
        count(lit(1)).cast("long").as("n1_left"))
    val rightC = typeC.groupBy("w2")
      .agg(count(lit(1)).cast("long").as("n1_right"))
    val nt = typeC.agg(count(lit(1)).cast("long").as("n_types"))
    docBig
      .join(typeC, Seq("w1", "w2"))
      .join(leftC, Seq("w1"))
      .join(rightC, Seq("w2"))
      .crossJoin(broadcast(nt))
      .withColumn("nll_micro",
        round(round(-log2(
          ((col("c_big") * 4 - 3) * col("n_types") +
            col("n1_left") * col("n1_right") * 3).cast("double") /
            (col("c_left") * col("n_types") * 4).cast("double")), 6) * 1000000d)
          .cast("long"))
      .groupBy(idCol)
      .agg(
        sum(col("tf")).cast("long").as("n_big"),
        sum(col("tf") * col("nll_micro")).cast("long").as("s"))
      .select(col(idCol), col("n_big"),
        (expr("s div n_big").cast("double") / 1000000d).as("avg_nll"))
  }

  /** Per-document lexical entropy (Shannon entropy of the doc's own
    * unigram distribution) + type-token ratio — the lexical-diversity
    * gate: template/boilerplate pages and keyword-stuffed spam sit far
    * below fluent text at equal length, and unlike [[lmUnigramScore]]
    * (surprisal under the CORPUS model) it needs no model tables at all.
    * H = Σ (tf/n)·(−log2(tf/n)); each per-term surprisal is rounded to 6
    * decimals, scaled to BIGINT micro-bits, tf-weighted, and the per-doc
    * mean is integer division — the q_lm_perplexity determinism contract.
    *
    * Scale shape: one groupBy to the (doc, term) table, then per-doc
    * totals via windows partitioned by doc (bounded by per-doc distinct
    * terms, never corpus-sized); no joins. */
  def lexicalEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = graft.sources.Tables.widen(
        docs.select(col(idCol), col(textCol)), idCol).select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val w = Window.partitionBy(idCol)
    tf.withColumn("n", sum(col("tf")).over(w))
      .withColumn("n_types", count(lit(1)).over(w))
      .withColumn("s_micro",
        round(round(-log2(col("tf").cast("double") / col("n").cast("double")), 6)
          * 1000000d).cast("long"))
      .groupBy(idCol)
      .agg(max(col("n")).as("n_tok"), max(col("n_types")).cast("long").as("n_types"),
        sum(col("tf") * col("s_micro")).cast("long").as("sw"))
      .select(col(idCol), col("n_tok"), col("n_types"),
        (expr("sw div n_tok").cast("double") / 1000000d).as("entropy_bits"),
        call_function("div", col("n_types") * 1000000L, col("n_tok")).as("ttr_micro"))
  }

  /** DuckDB twin of [[lexicalEntropy]] over the `documents` table. */
  val LexicalEntropyOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |             FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |d AS (SELECT doc_id, tf,
      |    SUM(tf) OVER (PARTITION BY doc_id) AS n,
      |    COUNT(*) OVER (PARTITION BY doc_id) AS n_types
      |  FROM tf),
      |s AS (SELECT doc_id, tf, n, n_types,
      |    CAST(ROUND(ROUND(-log2(CAST(tf AS DOUBLE) / CAST(n AS DOUBLE)), 6)
      |      * 1000000) AS BIGINT) AS s_micro
      |  FROM d)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tok,
      |  CAST(MAX(n_types) AS BIGINT) AS n_types,
      |  CAST(CAST(SUM(tf * s_micro) AS BIGINT) // MAX(n) AS DOUBLE) / 1000000.0
      |    AS entropy_bits,
      |  CAST((MAX(n_types) * 1000000) // MAX(n) AS BIGINT) AS ttr_micro
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Maximum adjacent repeated-token run per document — the degenerate-
    * loop detector ("the the the …" tails from broken extractors and
    * model-generated collapse) that Gopher's top-token/dup-n-gram
    * fractions miss when the loop is short relative to the document.
    * Java regex could find runs with a backreference, but RE2 (the
    * oracle's engine) has none — so runs are built relationally:
    * gaps-and-islands over per-document token positions (break flag via
    * lag, run id via cumulative sum), then the per-doc argmax run with a
    * total (len desc, term asc, start asc) order so ties cannot diverge.
    *
    * Scale shape: ONE shuffle on the doc id; every window partitions by
    * document (bounded by max doc length, never corpus-sized); the run
    * table is token-bounded and partially aggregable. */
  def repeatRuns(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = graft.sources.Tables.widen(
      docs.select(col(idCol), col(textCol)), idCol).select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val lagTerm = lag(col("term"), 1).over(w)
    val runs = tok
      .withColumn("brk",
        when(lagTerm.isNull || lagTerm =!= col("term"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("run_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("run_len"),
        min(col("pos")).cast("long").as("start"))
    val rank = Window.partitionBy(idCol)
      .orderBy(col("run_len").desc, col("term").asc, col("start").asc)
    runs.withColumn("rn", row_number().over(rank)).filter(col("rn") === 1)
      .select(col(idCol), col("run_len").as("max_run"), col("term").as("run_term"),
        (col("run_len") > 1).as("loopy"))
  }

  /** DuckDB twin of [[repeatRuns]] over the `documents` table. */
  val RepeatRunsOracle: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |           FROM documents),
      |tok AS (SELECT doc_id, i AS pos, toks[i + 1] AS term
      |        FROM t, unnest(range(len(toks))) AS u(i)),
      |b AS (SELECT doc_id, pos, term,
      |    CASE WHEN lag(term) OVER w IS NULL OR lag(term) OVER w <> term
      |         THEN 1 ELSE 0 END AS brk
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |r AS (SELECT doc_id, term,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id,
      |    pos
      |  FROM b),
      |runs AS (SELECT doc_id, run_id, term,
      |    CAST(COUNT(*) AS BIGINT) AS run_len, CAST(MIN(pos) AS BIGINT) AS start
      |  FROM r GROUP BY 1, 2, 3),
      |rk AS (SELECT doc_id, run_len, term, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY run_len DESC, term ASC, start ASC) AS rn
      |  FROM runs)
      |SELECT doc_id, run_len AS max_run, term AS run_term, run_len > 1 AS loopy
      |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** PII patterns: the common ASCII subset expressible identically in Java
    * regex (Spark) and RE2 (DuckDB) — no lookaround, `\b` is the ASCII
    * word boundary in both. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Redact emails, dotted-quad IPs, and NANP-style short phone numbers.
    * Email runs first (its local part may contain digits and dots that the
    * narrower patterns would otherwise bite into). Pure chained
    * `regexp_replace` — stays inside whole-stage codegen. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of matches of a PII pattern in the original text. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Blocklist page screen (C4's "dirty word" filter, Raffel et al. 2020
    * §2.2: drop any page containing a listed phrase): per-document
    * occurrence counts of a literal phrase dictionary, total hits, distinct
    * patterns present, and the keep verdict.
    *
    * The dictionary scan is ONE Aho–Corasick pass per document
    * ([[graft.functions.AcSummary]] — cost independent of dictionary
    * size), not |dict| `contains` scans, and the summary `[n_hits,
    * n_pats]` is computed INSIDE the kernel: a per-pattern array consumed
    * by a |dict|-term `element_at` fold builds a |dict|-deep expression
    * tree — interpreted-speed past ~64 terms and an analyzer
    * StackOverflow past ~512 (ProbeAc measured it; the k-wide-tree trap).
    * Per-pattern detail remains available via [[graft.functions
    * .AcCounts]] for callers that need it. Scale shape: a map-only
    * projection — no shuffle at all; the verdict filter pushes to the
    * scan at 100 TB.
    *
    * Counting semantics (oracle-expressible, overlap-inclusive): for each
    * pattern p, the number of positions i with `substr(text,i,len(p)) = p`.
    */
  def blocklistScreen(docs: DataFrame, idCol: String, textCol: String,
                      patterns: Seq[String]): DataFrame =
    docs.select(col(idCol),
        graft.functions.AcSummary.of(col(textCol), patterns).as("s"))
      .select(col(idCol),
        element_at(col("s"), 1).as("n_hits"),
        element_at(col("s"), 2).as("n_pats"),
        element_at(col("s"), 1).===(0L).as("keep"))

  /** DuckDB twin of [[blocklistScreen]]: the per-pattern count is a literal
    * position scan (list comprehension over every start offset), the
    * overlap-inclusive definition the automaton reproduces. Single quotes
    * in patterns are SQL-escaped (doubled), so any ASCII phrase the
    * automaton accepts produces well-formed oracle SQL. */
  def blocklistScreenOracle(idCol: String, textCol: String,
                            patterns: Seq[String]): String = {
    val vals = patterns.zipWithIndex
      .map { case (p, i) => s"($i, '${p.replace("'", "''")}')" }.mkString(", ")
    s"""WITH pats(pid, p) AS (VALUES $vals),
       |hit AS (SELECT $idCol, pid,
       |    len([i FOR i IN range(1, len($textCol) - len(p) + 2)
       |         IF substr($textCol, i, len(p)) = p]) AS c
       |  FROM documents, pats)
       |SELECT $idCol,
       |  CAST(SUM(c) AS BIGINT) AS n_hits,
       |  CAST(COUNT(CASE WHEN c > 0 THEN 1 END) AS BIGINT) AS n_pats,
       |  SUM(c) = 0 AS keep
       |FROM hit GROUP BY $idCol ORDER BY $idCol""".stripMargin
  }

  /** URL canonicalization — the standard web-crawl dedup key (one fetch
    * identity per page, not per tracking-decorated variant):
    *   1. strip the fragment (`#…` is client-side only);
    *   2. drop tracking parameters (`utm_*`, `ref`) and tidy dangling
    *      `?`/`&` separators — content-selecting params are KEPT;
    *   3. lowercase the scheme://host[:port] prefix (case-insensitive per
    *      RFC 3986) and drop the https default port `:443`;
    *   4. collapse trailing slashes on the path.
    * Pure chained `regexp_replace` — whole-stage codegen, no UDF; every
    * regex is shared Java/RE2 syntax so the DuckDB twin differs only in
    * the `'g'` flag and `\1` (vs `$1`) backreference spelling.
    *
    * Scale shape: a scan-side projection; the downstream dedup is one
    * partial-agg'd groupBy on the canonical string. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag, "(utm_[a-z0-9_]*|ref)=[^&#]*&?", "")
    val tidy = regexp_replace(noTrack, "[?&]+$", "")
    val hostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"
    val prefix = regexp_extract(tidy, s"($hostRe)", 1)
    val rest = regexp_replace(tidy, hostRe, "")
    concat(
      regexp_replace(lower(prefix), ":443$", ""),
      regexp_replace(rest, "/+(\\?|$)", "$1"))
  }

  /** DuckDB twin of [[canonicalizeUrl]] over a URL-valued SQL expression.
    * Emitted as ONE line: callers interpolate it into stripMargin oracle
    * strings, and a multi-line fragment would be margin-stripped twice. */
  def canonicalizeUrlSql(urlExpr: String): String = {
    val hostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"
    val tidy = s"regexp_replace(regexp_replace(regexp_replace($urlExpr, " +
      "'#.*$', ''), '(utm_[a-z0-9_]*|ref)=[^&#]*&?', '', 'g'), '[?&]+$', '')"
    s"regexp_replace(lower(regexp_extract($tidy, '($hostRe)', 1)), ':443$$', '') || " +
      s"regexp_replace(regexp_replace($tidy, '$hostRe', ''), '/+(\\?|$$)', '\\1')"
  }

  /** Exact substring-level dedup (the ExactSubstr shape of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"):
    * every character position opening a `gram`-char substring that also
    * occurs in ANOTHER document is marked, overlapping marks merge into
    * maximal ranges (gaps-and-islands), and the document is rebuilt with
    * the duplicated ranges cut out. Character granularity, cross-document
    * only (within-document repetition is q_quality_gopher's signal);
    * ALL copies of a duplicated substring are removed — the conservative
    * "boilerplate is noise in every document" policy (the paper's
    * suffix-array variant keeps one occurrence; keeping the min-doc copy
    * here would just re-rank the winners, the range machinery is
    * identical).
    *
    * Scale shape: instead of a global suffix array (which does not
    * distribute), every position hashes its gram — O(total chars) rows,
    * partially aggregable on the hash, so a boilerplate string repeated in
    * 10^9 documents combines map-side. The dup-hash set joins back as a
    * left-semi (no payload carried); range merge is a per-document window
    * whose partition is bounded by document length; the rebuild walks the
    * per-document range array (bounded the same way) with one
    * `aggregate()` HOF — per-row arrays of a few structs, NOT the
    * per-corpus lambda-reevaluation trap. At 100 TB the md5-per-position
    * hashing is the cost knob: stride the positions or swap in the
    * [[graft.functions.Winnow]] rolling-hash kernel; the oracle-parity
    * tier here hashes every position.
    *
    * Output: idCol, n_ranges, dup_chars, clean_text (one row per input
    * document; untouched documents pass through with 0/0/original). */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
                     gram: Int = 64): DataFrame = {
    require(gram >= 2, s"substringDedup: gram must be >= 2, got $gram")
    // scan-parallelism floor: the rolling gram-hash kernel is the op's
    // single heaviest scan projection (Tables.widen is a no-op at
    // production scan widths)
    val base = graft.sources.Tables.widen(
        docs.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol), col(textCol).as("t"),
        length(col(textCol)).as("len"))
    // the gram hash never reaches the output — only dup VERDICTS do — so
    // the engines need not share a hash family: Spark rolls all gram
    // hashes in ONE O(len) pass per doc (graft_gram_hashes — the
    // explode+substr+xxhash64 formulation recopied and rehashed 64 chars
    // PER POSITION, and the round-8 ladder already measured the hash-key
    // shape dominating: md5 13.0 s → xxhash 5.1 s at sf0.1), the oracle
    // md5; outputs agree absent collisions (~n_grams^2 / 2^64).
    // r14 duph+duppos fusion (r13 verdict #3): the old shape ran the gram
    // kernel TWICE and shuffled the corpus-sized mark table TWICE — once
    // as count_distinct(id)'s (h, id) pre-aggregation, once for the
    // left-semi join back (ProbeSubstr r13: duph 13.3 s + duppos 2.2 s of
    // the 21.9 s sf1xd total). "h occurs in >1 document" is equivalent to
    // min(doc) != max(doc) within the h-group, and min/max are computable
    // as window aggregates over ONE exchange of the mark table — the dup
    // verdict and the positions travel together, so the semi-join (and
    // the second kernel scan) disappear. (id, p) ride packed into a
    // single long — the packing is monotone, so the group's min/max
    // packed value carries the group's min/max doc id in its high 32
    // bits; rows shrink from 3 longs to 2. Packing contract: p < 2^31
    // (Java string length) and 0 <= id < 2^31 — guarded per row (two
    // long compares in codegen, free next to the hash itself).
    val packed =
      base.filter(col("len") >= gram)
        .select(
          when(col(idCol) >= 0 && col(idCol) < lit(1L << 31), col(idCol))
            .otherwise(raise_error(concat(lit(
              "substringDedup: doc id out of packing range [0, 2^31): "),
              col(idCol).cast("string")))).as("id"),
          posexplode(graft.functions.GramHashes.hashes(col("t"), gram)))
        .select((col("id") * lit(1L << 32) + col("pos")).as("ip"), col("col").as("h"))
    // Skew posture (r14 verdict #3 / r15 measured rationale): a
    // corpus-wide repeated gram (boilerplate header) puts ALL its
    // positions in one window task — a straggler at 100 TB. The two-phase
    // fix the verdict suggested — salted (h, salt) min/max pre-aggregation
    // + left-semi attach over one shared exchange — was IMPLEMENTED and
    // REJECTED on measurement (plans/r15/q_dedup_substring_salted_
    // rejected.txt): Catalyst replaces the probe branch's
    // REPARTITION_BY_COL exchange with the join's own ENSURE_REQUIREMENTS
    // exchange, and ReuseExchange cannot bridge the two origins, so the
    // gram kernel ran TWICE and the corpus shuffled TWICE — sf1xd
    // 3.90 → 8.89 s (2.3×), sf0.1 1.77 → 2.00 s. Every variant that
    // bounds the hot key needs a second corpus pass or a corpus-sized
    // materialization (the r13 mark-table persist, measured worse at
    // every scale). The single-exchange window stays: its straggler cost
    // is ONE narrow (2-long) pass over the hot group's rows, and the
    // gaps-and-islands step right after re-partitions by doc id, so the
    // skew does not propagate.
    val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val dupPos = packed
      .withColumn("mn", min(col("ip")).over(wh))
      .withColumn("mx", max(col("ip")).over(wh))
      .filter(shiftright(col("mn"), 32) =!= shiftright(col("mx"), 32))
      .select(shiftright(col("ip"), 32).as(idCol),
        (col("ip") % lit(1L << 32)).as("p"))
    // gaps-and-islands: a new island opens when this mark starts past the
    // furthest end seen so far in the document
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("p"))
    val prevMaxEnd = max(col("p") + gram)
      .over(w.rowsBetween(Long.MinValue, -1))
    val ranges = dupPos
      .withColumn("ni", when(prevMaxEnd.isNull || col("p") > prevMaxEnd, 1)
        .otherwise(0))
      .withColumn("island", sum(col("ni")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("p")).cast("long").as("s"),
        (max(col("p")) + gram).cast("long").as("e"))
    val perDoc = ranges.groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_ranges"),
        sum(col("e") - col("s")).cast("long").as("dup_chars"),
        array_sort(collect_list(struct(col("s"), col("e")))).as("rs"))
    base
      .join(perDoc, Seq(idCol), "left_outer")
      .withColumn("acc", aggregate(
        coalesce(col("rs"), array().cast("array<struct<s:bigint,e:bigint>>")),
        struct(lit(0L).as("pos"), lit("").as("txt")),
        (acc, r) => struct(
          r.getField("e").as("pos"),
          concat(acc.getField("txt"),
            col("t").substr((acc.getField("pos") + 1).cast("int"),
              (r.getField("s") - acc.getField("pos")).cast("int"))).as("txt"))))
      .select(col(idCol),
        coalesce(col("n_ranges"), lit(0L)).as("n_ranges"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        concat(col("acc.txt"),
          col("t").substr((col("acc.pos") + 1).cast("int"),
            (col("len") - col("acc.pos")).cast("int"))).as("clean_text"))
  }

  /** DuckDB SQL reproducing [[substringDedup]] bit-for-bit over the
    * `documents` table. */
  def substringDedupOracle(gram: Int = 64): String =
    s"""WITH base AS (SELECT doc_id, text, LENGTH(text) AS len FROM documents),
       |g AS (SELECT doc_id, p, md5(substr(text, CAST(p+1 AS INT), $gram)) AS h
       |      FROM (SELECT doc_id, text, unnest(range(len-$gram+1)) AS p
       |            FROM base WHERE len >= $gram)),
       |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
       |d AS (SELECT g.doc_id, g.p FROM g JOIN dup USING (h)),
       |i0 AS (SELECT doc_id, p,
       |         CASE WHEN p > COALESCE(MAX(p+$gram) OVER (PARTITION BY doc_id
       |              ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |              -1) THEN 1 ELSE 0 END AS ni
       |       FROM d),
       |i1 AS (SELECT doc_id, p,
       |         SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM i0),
       |rng AS (SELECT doc_id, MIN(p) AS s, MAX(p)+$gram AS e
       |        FROM i1 GROUP BY doc_id, island),
       |seg AS (SELECT doc_id,
       |          COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ks,
       |          s AS ke
       |        FROM rng
       |        UNION ALL
       |        SELECT doc_id, MAX(e) AS ks, NULL AS ke FROM rng GROUP BY doc_id),
       |kept AS (SELECT seg.doc_id, ks,
       |           CASE WHEN ke IS NULL THEN substr(b.text, CAST(ks+1 AS INT))
       |                ELSE substr(b.text, CAST(ks+1 AS INT), CAST(ke-ks AS INT))
       |           END AS st
       |         FROM seg JOIN base b USING (doc_id)),
       |agg AS (SELECT doc_id, string_agg(st, '' ORDER BY ks) AS clean_text
       |        FROM kept GROUP BY doc_id),
       |stats AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ranges,
       |            CAST(SUM(e-s) AS BIGINT) AS dup_chars
       |          FROM rng GROUP BY doc_id)
       |SELECT b.doc_id,
       |  COALESCE(stats.n_ranges, 0) AS n_ranges,
       |  COALESCE(stats.dup_chars, 0) AS dup_chars,
       |  COALESCE(agg.clean_text, b.text) AS clean_text
       |FROM base b
       |LEFT JOIN stats USING (doc_id) LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- cross-source overlap audit

  /** Pairwise n-gram overlap between corpus sources — the "is source A
    * scraping source B" leakage audit (the cross-SOURCE complement of the
    * doc-level q_split_leakage and the eval-set q_contamination screens):
    * for every source pair, the count of shared distinct shingles and the
    * Jaccard of their shingle sets, in truncating micro-units.
    *
    * Scale shape: one explode→distinct pass to the (source, shingle) set
    * (the only corpus-sized shuffle, partial-agg'd); the pair join runs on
    * the shingle key with fan-out ≤ C(sources-with-gram, 2), hard-capped
    * by `maxSrc` — shingles present in more than `maxSrc` sources are
    * boilerplate with no discriminative value and are dropped from the
    * SHARED counts (per-source totals keep them, so capped Jaccards are
    * lower bounds); single-source shingles can't pair and are dropped by
    * the same eligibility filter. Output is C(|sources|, 2) rows.
    *
    * @return source_a, source_b, n_a, n_b, n_shared, jaccard_micro */
  def sourceOverlap(docs: DataFrame, groupCol: String, textCol: String,
                    n: Int = 3, maxSrc: Int = 64): DataFrame = {
    // the (source, shingle) set feeds THREE consumers (eligibility df,
    // capped pair join, per-source totals) — materialize it once instead
    // of re-running the explode+distinct per consumer (the
    // connectedComponents lineage pattern)
    val sh = graft.sources.Tables.widen(
        docs.select(col(groupCol), col(textCol)), groupCol)
      .select(col(groupCol).as("g"),
        explode(TextOps.shingles(col(textCol), n)).as("s"))
      .distinct()
      .staged()
    val elig = sh.groupBy("s").agg(count(lit(1)).as("nsrc"))
      .filter(col("nsrc").between(2, maxSrc))
      .select("s")
    val shE = sh.join(elig, Seq("s"), "left_semi")
    val a = shE.select(col("s"), col("g").as("source_a"))
    val b = shE.select(col("s"), col("g").as("source_b"))
    val shared = a.join(b, "s").filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    val cnt = sh.groupBy("g").agg(count(lit(1)).as("n"))
    shared
      .join(cnt.select(col("g").as("source_a"), col("n").as("n_a")), "source_a")
      .join(cnt.select(col("g").as("source_b"), col("n").as("n_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        call_function("div", col("n_shared") * lit(1000000L),
          col("n_a") + col("n_b") - col("n_shared")).as("jaccard_micro"))
      .orderBy("source_a", "source_b")
  }

  /** DuckDB twin of [[sourceOverlap]] over `documents`. */
  def sourceOverlapOracle(n: Int = 3, maxSrc: Int = 64): String = {
    val gram = (1 to n).map(i => s"toks[i${if (i == 1) "" else s"+${i - 1}"}]")
      .mkString("||'_'||")
    s"""WITH sh AS (SELECT DISTINCT g, s FROM (
       |    SELECT source AS g,
       |      unnest(list_distinct([$gram for i in range(1, len(toks)-${n - 2})])) AS s
       |    FROM (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |          FROM documents))),
       |elig AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND $maxSrc),
       |she AS (SELECT sh.g, sh.s FROM sh JOIN elig USING (s)),
       |shared AS (SELECT a.g AS source_a, b.g AS source_b, COUNT(*) AS n_shared
       |    FROM she a JOIN she b ON a.s = b.s AND a.g < b.g GROUP BY 1, 2),
       |cnt AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY g)
       |SELECT source_a, source_b, ca.n AS n_a, cb.n AS n_b, n_shared,
       |  CAST((n_shared * 1000000) // (ca.n + cb.n - n_shared) AS BIGINT)
       |    AS jaccard_micro
       |FROM shared JOIN cnt ca ON ca.g = source_a JOIN cnt cb ON cb.g = source_b
       |ORDER BY source_a, source_b""".stripMargin
  }
}
