package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, stopword/language scoring, normalization
  * fingerprints, quality scoring. Everything is a codegen'd column
  * expression (`functions._` only — no UDFs), so Catalyst collapses these
  * into the scan projection and they vectorize over 100 TB of documents
  * as well as over the local testdata.
  */
object TextOps {

  /** Word tokens: maximal `[a-z0-9]+` runs of the lowercased text. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace-separated tokens (Unix `wc -w` semantics). */
  def wsTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish pre-tokenization: letter runs | digit runs | punctuation runs —
    * the usual byte-pair pre-split shape (public GPT-2-style pre-tokenizer,
    * simplified to ASCII classes). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0)))

  /** Distinct word n-gram shingles of the text, joined with '_'.
    *
    * Implemented as ONE codegen'd regex pass: tokens are '_'-joined, then
    * overlapping n-grams are captured through a zero-width lookahead anchored
    * at token starts (`(?<![a-z0-9])`). A `transform(sequence(...),
    * element_at(toks,...))` formulation is the obvious alternative, but
    * higher-order functions are CodegenFallback and re-evaluate the embedded
    * tokenizer regex per lambda call — measured ~150x slower per document.
    * Docs shorter than n tokens naturally yield an empty array. */
  def shingles(text: Column, n: Int = 3): Column = {
    val joined = array_join(tokens(text), "_")
    val pat = "(?<![a-z0-9])(?=(" + List.fill(n)("[a-z0-9]+").mkString("_") + "))"
    array_distinct(regexp_extract_all(joined, lit(pat), lit(1)))
  }

  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Tiny public stopword lists per language for n-gram language ID. */
  val StopwordsEn = Seq("the", "and", "of", "to", "in", "is")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht")
  val StopwordsFr = Seq("le", "la", "les", "et", "est", "dans")
  val StopwordsEs = Seq("el", "los", "las", "y", "es", "en")

  /** Whitespace-collapsed, trimmed, lowercased canonical form. The
    * whitespace class is EXPLICIT ASCII, not `\s`: Java's `\s` includes
    * U+000B (vertical tab) but RE2's does not, so an oracle mirroring
    * `\s` silently diverges on VT-bearing text. `\x0B` parses identically
    * in both engines. */
  val WsClassRe = "[ \\t\\n\\r\\f\\x0B]+"
  def normalizedText(text: Column): Column =
    lower(trim(regexp_replace(text, WsClassRe, " ")))

  /** Content fingerprint of the normalized text (normalization-invariant
    * exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalizedText(text))
}
