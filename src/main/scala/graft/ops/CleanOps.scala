package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cross-document n-gram duplication fraction (RefinedWeb's
    * "duplicated n-gram" quality signal): for each document, the fraction
    * of its distinct `n`-gram shingles that also occur in at least one
    * other document. The document frequency per gram is a partially
    * aggregable `groupBy(gram).count` joined back on the gram (same skew
    * reasoning as [[segmentDedup]]); per-doc distinct-gram counts ride the
    * exploded rows instead of a second join. */
  def crossDocNgramDup(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val grams = docs.select(col(idCol),
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
}
