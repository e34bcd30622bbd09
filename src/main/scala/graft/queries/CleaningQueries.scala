package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.CleanOps
import graft.sources.Tables

/** Corpus-cleaning queries: segment-level exact dedup, cross-document
  * n-gram duplication scoring, unigram-LM quality scoring, and PII
  * redaction — the content-hygiene steps between raw ingest and the
  * training-assembly tier in `TrainingQueries`. Every query carries a full
  * DuckDB oracle.
  */
object CleaningQueries {

  /** Deterministic fixture-derived synthetic PII appended to the text (the
    * corpus itself carries none): md5-local-part emails, doc_id-derived
    * dotted quads and short phone numbers. Shared by q_pii_redact and the
    * streaming parity spec. */
  def plantedPiiText(docId: org.apache.spark.sql.Column,
                     text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      text,
      when(docId % 3 === 0,
        concat(lit(" contact "), substring(md5(docId.cast("string")), 1, 8),
          lit("@example.com"))).otherwise(lit("")),
      when(docId % 4 === 1,
        concat(lit(" from 10."), (docId % 256).cast("string"),
          lit(".0."), (docId % 100).cast("string"))).otherwise(lit("")),
      when(docId % 5 === 2,
        concat(lit(" call 555-"),
          lpad((docId % 10000).cast("string"), 4, "0"))).otherwise(lit("")))

  /** Deterministic fixture-derived C4 hazards: the corpus text has no line
    * structure, terminal punctuation, code, or boilerplate, so "lines" are
    * 10-token segments and the hazards C4 §2.2 screens for are planted by
    * doc_id/pos arithmetic — the same discipline as [[plantedPiiText]].
    * Most lines get terminal punctuation (2 in 3), some mention
    * javascript, some carry a code brace, and 1 doc in 17 ends with the
    * lorem-ipsum placeholder line. */
  def plantedC4Lines(docId: org.apache.spark.sql.Column,
                     text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val segs = CleanOps.tokenSegments(text, 10)
    val planted = transform(segs, (s, i) => concat(
      s,
      when((docId + i) % 7 === 3, lit(" javascript alert")).otherwise(lit("")),
      when((docId * 31 + i) % 23 === 5, lit(" function() {")).otherwise(lit("")),
      when((docId + i) % 3 =!= 2, lit(".")).otherwise(lit(""))))
    concat(planted,
      when(docId % 17 === 7, array(lit("lorem ipsum dolor sit amet.")))
        .otherwise(lit(Array.empty[String])))
  }

  def defs: Map[String, QueryDef] = Map(

    // -------------------------------------------- source drift audit
    // KL(P_source || P_corpus) over unigram distributions — which
    // source's language has drifted from the corpus: the information-
    // theoretic complement of q_source_overlap's shingle-leakage audit.
    "q_source_kl" -> QueryDef.sql(
      (s, dir) => graft.ops.TextOps.sourceKl(Tables.documents(s, dir), "source", "text"),
      graft.ops.TextOps.SourceKlOracle,
      doc = "per-source unigram KL divergence from the corpus marginal " +
        "in exact integer micro-units (observed-term form, no dense " +
        "completion), fully oracle-checked"),

    // ------------------------------------------------- C4 cleaning filters
    // Raffel et al. 2020 §2.2 line+page rules over the planted-hazard line
    // split: per-line terminal-punctuation / min-words / javascript
    // screens, page-level brace & lorem-ipsum & min-kept-lines verdict,
    // and the document rebuilt from surviving lines. The one shuffle is
    // the per-document rebuild; every flag is a codegen'd column op on the
    // exploded rows.
    "q_quality_c4" -> QueryDef.sql(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        CleanOps.c4Filter(
          docs.select(col("doc_id"),
            plantedC4Lines(col("doc_id"), col("text")).as("lines")),
          "doc_id", col("lines"))
          .orderBy("doc_id")
      },
      """WITH raw AS (SELECT doc_id,
        |    regexp_extract_all(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))),
        |                       '(?:[a-z0-9]+ ){0,9}[a-z0-9]+') AS arr
        |  FROM documents),
        |seg AS (SELECT doc_id, unnest(arr) AS s, unnest(range(len(arr))) AS i FROM raw),
        |pl AS (SELECT doc_id, i, s
        |    || CASE WHEN (doc_id + i) % 7 = 3 THEN ' javascript alert' ELSE '' END
        |    || CASE WHEN (doc_id * 31 + i) % 23 = 5 THEN ' function() {' ELSE '' END
        |    || CASE WHEN (doc_id + i) % 3 <> 2 THEN '.' ELSE '' END AS line
        |  FROM seg
        |  UNION ALL
        |  SELECT doc_id, len(arr), 'lorem ipsum dolor sit amet.' FROM raw
        |  WHERE doc_id % 17 = 7),
        |fl AS (SELECT doc_id, i, line,
        |    len(regexp_extract_all(lower(line), '[a-z0-9]+')) AS words,
        |    regexp_matches(line, '[.!?"]$') AS terminal,
        |    contains(lower(line), 'javascript') AS js,
        |    contains(line, '{') AS brace,
        |    contains(lower(line), 'lorem ipsum') AS lorem
        |  FROM pl),
        |fk AS (SELECT *, (terminal AND words >= 5 AND NOT js) AS line_keep FROM fl),
        |ag AS (SELECT doc_id,
        |    COUNT(*)::BIGINT AS n_lines,
        |    COUNT(CASE WHEN line_keep THEN 1 END)::BIGINT AS n_kept,
        |    bool_or(brace) AS has_brace,
        |    bool_or(lorem) AS has_lorem,
        |    COALESCE(string_agg(CASE WHEN line_keep THEN line END, chr(10) ORDER BY i), '')
        |      AS cleaned_text
        |  FROM fk GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_kept, has_brace, has_lorem, cleaned_text,
        |  (n_kept >= 3 AND NOT has_brace AND NOT has_lorem) AS keep
        |FROM ag ORDER BY doc_id""".stripMargin,
      doc = "C4 line+page cleaning filters (terminal punct / min words / " +
        "javascript / brace / lorem-ipsum) + document rebuild, fully " +
        "oracle-checked"),

    // ------------------------------------------- segment-level exact dedup
    // CCNet/FineWeb line-dedup shape: segments keep only their first
    // corpus-wide occurrence; documents are rebuilt from survivors. The
    // fixture text is single-line, so segments are non-overlapping 8-token
    // chunks (`CleanOps.tokenSegments`) — the operator itself takes any
    // array<string> segmentation (lines, sentences). The winner per segment
    // hash is a partially-aggregable min, NOT a window sort, so a hot
    // boilerplate segment cannot pin one task (see CleanOps scaladoc).
    "q_dedup_segments" -> QueryDef.sql(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        CleanOps.segmentDedup(docs, "doc_id",
            CleanOps.tokenSegments(col("text"), 8))
          .orderBy("doc_id")
      },
      """WITH raw AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))),
        |                       '(?:[a-z0-9]+ ){0,7}[a-z0-9]+') AS arr
        |  FROM documents),
        |ex AS (SELECT doc_id, unnest(arr) AS seg, unnest(range(len(arr))) AS pos
        |       FROM raw),
        |mk AS (SELECT doc_id, pos, seg,
        |         row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) = 1 AS keep
        |       FROM ex)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS kept_text,
        |  CAST((COUNT(*) FILTER (WHERE keep) * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0 AS retained_frac
        |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      doc = "corpus-wide segment (pseudo-line) exact dedup with first-" +
        "occurrence winners and in-order document rebuild"),

    // --------------------------------------- substring-level exact dedup
    // ExactSubstr (Lee et al. 2022) at character granularity: positions
    // opening a 64-char substring shared with ANOTHER document merge into
    // maximal ranges (gaps-and-islands) and are cut out of the rebuilt
    // text. The fixture's planted near-dup docs carry real cross-doc runs
    // (45 docs, ~10k duplicate positions at sf0.01), so ranges, counts,
    // and the surgically-cleaned text are all exercised non-trivially.
    "q_dedup_substring" -> QueryDef.sql(
      (s, dir) => CleanOps.substringDedup(
          Tables.documents(s, dir), "doc_id", "text", gram = 64)
        .orderBy("doc_id"),
      CleanOps.substringDedupOracle(gram = 64),
      doc = "exact substring-level dedup (ExactSubstr shape): cross-doc " +
        "64-char duplicate runs merged into ranges and removed from the " +
        "rebuilt text"),

    // -------------------------------- cross-document n-gram duplication
    // RefinedWeb's duplicated-n-gram quality signal: the fraction of a
    // document's distinct 4-gram shingles that occur in >= 1 other
    // document (or twice here — df counts occurrences, and shingles are
    // distinct per doc, so df>1 means another document shares the gram).
    "q_quality_dup_ngrams" -> QueryDef.sql(
      (s, dir) => CleanOps.crossDocNgramDup(
          Tables.documents(s, dir), "doc_id", "text", n = 4)
        .orderBy("doc_id"),
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([toks[i] || '_' || toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3]
        |                          for i in range(1, len(toks) - 2)])) AS gram
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |        FROM documents)),
        |df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gram_df FROM sh GROUP BY 1)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(COUNT(*) FILTER (WHERE gram_df > 1) AS BIGINT) AS n_dup,
        |  CAST((COUNT(*) FILTER (WHERE gram_df > 1) * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0 AS dup_frac
        |FROM sh JOIN df USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      doc = "fraction of each doc's distinct 4-grams shared with another " +
        "document (RefinedWeb duplicated-n-gram signal)"),

    // ------------------------------------------ unigram LM quality score
    // CCNet-shaped perplexity gate on a self-fit add-one unigram model.
    // Per-term surprisals are rounded to 6 decimals BEFORE the per-doc
    // sum, scaled to exact BIGINT micro-bits, and the per-doc mean is
    // INTEGER division — no double summation order and no halfway-digit
    // rounding for the engines to disagree on (a rounded double quotient
    // diverged on 2/5000 docs at sf0.1; FIXTURES.md pagerank trap).
    "q_lm_perplexity" -> QueryDef.sql(
      (s, dir) => CleanOps.lmUnigramScore(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |st AS (SELECT CAST(SUM(c) AS BIGINT) AS t_total, CAST(COUNT(*) AS BIGINT) AS v_size FROM tc),
        |sc AS (SELECT doc_id, tf.tf,
        |         CAST(ROUND(ROUND(-log2(CAST(c + 1 AS DOUBLE) / CAST(t_total + v_size AS DOUBLE)), 6) * 1000000) AS BIGINT) AS nll_micro
        |       FROM tf JOIN tc USING (term) CROSS JOIN st)
        |SELECT doc_id,
        |  CAST(SUM(tf) AS BIGINT) AS n_tok,
        |  CAST(CAST(SUM(tf * nll_micro) AS BIGINT) // SUM(tf) AS DOUBLE) / 1000000.0 AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      doc = "mean per-token surprisal under a corpus-fit add-one unigram " +
        "model (cheap CCNet-style perplexity gate, integer micro-bit mean)"),

    // -------------------------------- Kneser-Ney bigram LM quality score
    // The order-aware upgrade of q_lm_perplexity: interpolated Kneser-Ney
    // bigrams (D = 3/4) in the exact cross-multiplied integer form
    // num = (4c-3)NT + 3*N1L*N1R, den = 4*c_left*NT — the only double op
    // is the -log2(num/den) surprisal, which follows the established
    // round-6 micro-bit contract. Bigrams via the one-pass lookahead
    // regex (no lead() window, no transform lambda); all model tables
    // Zipf-bounded; NT broadcasts as one row.
    "q_lm_kneser_ney" -> QueryDef.sql(
      (s, dir) => CleanOps.lmKneserNeyScore(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      """WITH raw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |             FROM documents),
        |big AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
        |        FROM raw, unnest(range(len(toks) - 1)) AS t(i)),
        |db AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf FROM big GROUP BY 1, 2, 3),
        |tc AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c_big FROM db GROUP BY 1, 2),
        |lc AS (SELECT w1, CAST(SUM(c_big) AS BIGINT) AS c_left,
        |              CAST(COUNT(*) AS BIGINT) AS n1_left FROM tc GROUP BY 1),
        |rc AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1_right FROM tc GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM tc),
        |sc AS (SELECT db.doc_id, db.tf,
        |         CAST(ROUND(ROUND(-log2(
        |           CAST((4 * c_big - 3) * n_types + 3 * n1_left * n1_right AS DOUBLE)
        |           / CAST(4 * c_left * n_types AS DOUBLE)), 6) * 1000000) AS BIGINT) AS nll_micro
        |       FROM db JOIN tc USING (w1, w2) JOIN lc USING (w1)
        |         JOIN rc USING (w2) CROSS JOIN nt)
        |SELECT doc_id,
        |  CAST(SUM(tf) AS BIGINT) AS n_big,
        |  CAST(CAST(SUM(tf * nll_micro) AS BIGINT) // SUM(tf) AS DOUBLE) / 1000000.0 AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      doc = "interpolated Kneser-Ney bigram surprisal (D=3/4, exact " +
        "integer cross-multiplied form; order-aware perplexity gate)"),

    // --------------------------------------------- lexical diversity
    // Shannon entropy of each doc's own unigram distribution + type-token
    // ratio: the model-free diversity gate (templates/keyword stuffing
    // score low at equal length). Micro-bit integer contract; windows
    // bounded by per-doc distinct terms; no joins.
    "q_lexical_entropy" -> QueryDef.sql(
      (s, dir) => CleanOps.lexicalEntropy(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      CleanOps.LexicalEntropyOracle,
      doc = "per-doc lexical entropy + type-token ratio (model-free " +
        "diversity gate, integer micro-bit mean)"),

    // --------------------------------------------- repeated-run detector
    // Max adjacent repeated-token run per doc: the degenerate-loop signal
    // (broken extractors, model-collapse tails) Gopher's corpus-fraction
    // filters miss on short loops. RE2 has no backreferences, so runs are
    // relational gaps-and-islands; argmax run under a total order.
    "q_repeat_runs" -> QueryDef.sql(
      (s, dir) => CleanOps.repeatRuns(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      CleanOps.RepeatRunsOracle,
      doc = "max adjacent repeated-token run per doc (gaps-and-islands, " +
        "doc-bounded windows; loop-collapse quality gate)"),

    // ------------------------------------------------- Zipf-law slope
    // Least-squares slope of ln(freq) vs ln(rank) over the top bigrams:
    // the corpus-health number (natural text ≈ −1; boilerplate floods
    // flatten, token soup steepens). Milli-unit ln inputs keep the pure-
    // BIGINT regression under 2^63; sign-decomposed final quotient
    // (negative numerator: Spark div truncates, DuckDB // floors).
    "q_zipf_slope" -> QueryDef.sql(
      (s, dir) => graft.ops.TextOps.zipfSlope(Tables.documents(s, dir), "text"),
      graft.ops.TextOps.zipfSlopeOracle(),
      doc = "Zipf-law slope of the bigram frequency-rank distribution " +
        "(integer least squares over the bounded top-200 table)"),

    // -------------------------------------------- Heaps vocabulary growth
    // Distinct-bigram vocabulary after each eighth of the doc-id range:
    // the "is new data still adding language" acquisition curve. One
    // partial-agg min per term; the curve explodes the vocab-bounded
    // first-doc table against 8 literal thresholds — no join.
    "q_vocab_growth" -> QueryDef.sql(
      (s, dir) => graft.ops.TextOps.vocabGrowth(Tables.documents(s, dir),
        "doc_id", "text"),
      graft.ops.TextOps.vocabGrowthOracle(),
      doc = "Heaps-law vocabulary growth at 8 doc-range checkpoints " +
        "(per-term first-occurrence min, vocab-bounded curve)"),

    // ------------------------------------------------------ PII redaction
    // The fixture corpus carries no PII, so the query PLANTS deterministic
    // synthetic PII derived from fixture ids (md5-local-part emails,
    // doc_id-derived dotted quads and short phone numbers) identically in
    // both engines, then counts and redacts it. Both the match and
    // no-match branches are exercised (~1/3, 1/4, 1/5 of docs each).
    "q_pii_redact" -> QueryDef.sql(
      (s, dir) => {
        val aug = Tables.documentsWide(s, dir).select(col("doc_id"),
          plantedPiiText(col("doc_id"), col("text")).as("aug"))
        aug.select(col("doc_id"),
            CleanOps.piiCount(col("aug"), CleanOps.EmailRe).as("n_email"),
            CleanOps.piiCount(col("aug"), CleanOps.Ipv4Re).as("n_ip"),
            CleanOps.piiCount(col("aug"), CleanOps.PhoneRe).as("n_phone"),
            CleanOps.redactPii(col("aug")).as("redacted"))
          .orderBy("doc_id")
      },
      s"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 1 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 2 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${CleanOps.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '${CleanOps.Ipv4Re}')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(aug, '${CleanOps.PhoneRe}')) AS BIGINT) AS n_phone,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '${CleanOps.EmailRe}', '<EMAIL>', 'g'),
         |    '${CleanOps.Ipv4Re}', '<IP>', 'g'),
         |    '${CleanOps.PhoneRe}', '<PHONE>', 'g') AS redacted
         |FROM aug ORDER BY doc_id""".stripMargin,
      doc = "regex PII redaction (email/IP/phone) with per-doc match counts " +
        "over deterministically planted fixture-derived PII"),

    // ------------------------------------------------ blocklist screen
    // C4's "dirty word" page filter (Raffel et al. 2020 §2.2): drop any
    // page containing a listed phrase. One Aho-Corasick pass per document
    // (graft_ac_counts — cost independent of dictionary size), map-only,
    // no shuffle. The fixture dictionary is built from corpus phrases with
    // deliberate automaton structure: nested patterns ("slow" inside
    // "slow scan", "low" a proper suffix inside "slow" — fail-link hits),
    // self-overlapping phrases ("a a" twice inside "a a a"), and shared
    // words across phrases. 90/500 docs pass clean at sf0.01, so both
    // verdict branches are exercised.
    "q_blocklist_filter" -> QueryDef.sql(
      (s, dir) => CleanOps.blocklistScreen(
          Tables.documents(s, dir), "doc_id", "text", BlocklistPats)
        .orderBy("doc_id"),
      CleanOps.blocklistScreenOracle("doc_id", "text", BlocklistPats),
      doc = "blocklist page screen via one Aho-Corasick dictionary pass " +
        "(overlap-inclusive per-pattern counts, keep verdict), fully " +
        "oracle-checked"),

    // --------------------------------------------- URL canonicalization
    // Web-crawl URL dedup: the fixture carries no URL column, so one is
    // planted deterministically from (source, lang, doc_id) with every
    // canonicalization hazard present — uppercase scheme/host, https
    // default port, trailing slash, tracking params around a KEPT content
    // param, fragment. Docs whose URLs differ only in those decorations
    // collapse to one canonical fetch identity.
    "q_url_canonical" -> QueryDef.sql(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        d.select(col("doc_id"),
            CleanOps.canonicalizeUrl(
              plantedUrl(col("source"), col("lang"), col("doc_id"))).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
          .orderBy("canonical_url")
      },
      s"""WITH u AS (SELECT doc_id, $PlantedUrlSql AS url FROM documents)
         |SELECT ${CleanOps.canonicalizeUrlSql("url")} AS canonical_url,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS keep_doc
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
      doc = "URL canonicalization dedup (fragment/tracking-param/port/case/" +
        "trailing-slash normalization), fully oracle-checked"),

    // Cross-source n-gram overlap matrix — the "is source A scraping
    // source B" leakage audit. One explode→distinct corpus pass; the pair
    // join fans out per shingle bounded by C(maxSrc, 2); output is
    // C(|sources|, 2) rows of shared-shingle counts + Jaccard.
    "q_source_overlap" -> QueryDef.sql(
      (s, dir) => CleanOps.sourceOverlap(Tables.documents(s, dir),
        "source", "text", n = 3, maxSrc = 64),
      CleanOps.sourceOverlapOracle(n = 3, maxSrc = 64),
      doc = "pairwise cross-source shingle overlap + Jaccard in " +
        "micro-units (boilerplate-capped pair join), fully oracle-checked")
  )

  /** Fixture blocklist with deliberate Aho-Corasick structure (nested /
    * suffix-overlapping / self-overlapping phrases) — see q_blocklist_filter. */
  private val BlocklistPats: Seq[String] = Seq(
    "slow", "low", "slow scan", "scan slow",
    "table table", "a a", "merge batch", "big vector")

  /** Deterministic fixture-derived URL with every canonicalization hazard:
    * mixed-case scheme+host, conditional default port, conditional trailing
    * slash, tracking params flanking a kept `id` param, conditional
    * fragment. Spark and SQL twins build the IDENTICAL string. */
  private def plantedUrl(source: org.apache.spark.sql.Column,
                         lang: org.apache.spark.sql.Column,
                         docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("HTTPS://"), source, lit(".Example.COM"),
      when(docId % 2 === 0, lit(":443")).otherwise(lit("")),
      lit("/"), lang, lit("/p"), (docId % 7).cast("string"),
      when(docId % 3 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), (docId % 4).cast("string"),
      lit("&ref="), (docId % 3).cast("string"),
      when(docId % 5 === 0, lit("#sec")).otherwise(lit("")))

  private val PlantedUrlSql: String =
    """'HTTPS://' || source || '.Example.COM' ||
      |    CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END ||
      |    '/' || lang || '/p' || CAST(doc_id % 7 AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      |    '?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR) ||
      |    '&ref=' || CAST(doc_id % 3 AS VARCHAR) ||
      |    CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END""".stripMargin
}
