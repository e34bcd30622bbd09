package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The complete native-function surface of the library in one table, with
  * the two installation paths a Spark library is expected to offer:
  *
  *  - `GraftFunctions.registerAll(spark)` — imperative, for an existing
  *    session (tests, notebooks). Idempotent.
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — declarative,
  *    at session build; survives `newSession()` clones and applies to every
  *    session of the cluster (the standard library-installation path, same
  *    mechanism Delta/Iceberg use). Registration happens in the session's
  *    `FunctionRegistry`, so the functions are callable from pure SQL
  *    (`SELECT graft_dot(a, b) FROM ...`) as well as via `call_function`.
  *
  * Each entry reuses the SAME builder the per-object `register` helpers
  * install, so SQL-surface and Column-API callers construct identical
  * expression trees (one analysis/codegen contract to test).
  */
object GraftFunctions {

  /** name → (usage, builder) for every graft native expression. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (DotProduct.FunctionName,
      "graft_dot(a, b) - dot product of two array<double> (codegen'd loop)",
      DotProduct.builder),
    (FirstEqIndex.FunctionName,
      "graft_first_eq(a, b) - first index where the arrays agree, -1 if none",
      FirstEqIndex.builder),
    (CollectCapped.FunctionName,
      "graft_collect_capped(col, cap) - collect_list bounded at cap elements per group",
      CollectCapped.builder),
    (MinHash.FunctionName,
      "graft_minhash_md5(shingles, num_perm) - portable md5-derived MinHash signature array",
      MinHash.builder),
    (SimHash.FunctionName,
      "graft_simhash_md5(shingles) - portable md5-derived SimHash 16-bit chunk array",
      SimHash.builder),
    (Winnow.FunctionName,
      "graft_winnow(text, k, w) - winnowed k-gram rolling-hash fingerprints (MOSS)",
      Winnow.builder),
    (Winnow.Md5FunctionName,
      "graft_winnow_md5(text, k, w) - portable md5-hash winnowed fingerprints",
      Winnow.md5Builder),
    (LshSigs.FunctionName,
      "graft_lsh_sigs(v, planes_flat, rows_per_band, dim) - sign-LSH band signature array",
      LshSigs.builder),
    (TopKPairs.FunctionName,
      "graft_topk(ord, id, k) - k smallest (ord, id) pairs per group as a sorted struct array",
      TopKPairs.builder),
    (AhashBmp.FunctionName,
      "graft_ahash(content) - 8x8 average-hash of a BMP payload as 4x16-bit chunks",
      AhashBmp.builder),
    (MisraGries.FunctionName,
      "graft_mg(term, k) - Misra-Gries <=k-counter heavy-hitter summary per group",
      MisraGries.builder),
    (NearestCell.FunctionName,
      "graft_nearest_cell(v, centers_flat, num_cells, dim) - nearest-centroid id (codegen'd loop)",
      NearestCell.builder),
    (MatVec.FunctionName,
      "graft_matvec(v, mat_flat, n_rows, dim) - literal matrix x vector projection (codegen'd loop)",
      MatVec.builder),
    (SortedIntersectCount.FunctionName,
      "graft_sorted_inter(a, b) - distinct-intersection count of two sorted array<bigint> (codegen'd merge)",
      SortedIntersectCount.builder),
    (HashRangeHist.FunctionName,
      "graft_range_hist(hs) - 128-range 4-bit saturating count histogram of a hash array (8 longs)",
      HashRangeHist.builder),
    (HistMinSum.FunctionName,
      "graft_hist_min_sum(ct_a, ct_b) - sum of per-range count minimums: lossless overlap upper bound",
      HistMinSum.builder),
    (GramHashes.FunctionName,
      "graft_gram_hashes(text, k) - all k-gram rolling hashes of a document (one O(len) pass)",
      GramHashes.builder),
    (StopwordCounts.FunctionName,
      "graft_stopword_counts(text, sets_spec) - per-word-set \\b-exact stopword counts in one pass",
      StopwordCounts.builder),
    (AcCounts.FunctionName,
      "graft_ac_counts(text, patterns_spec) - per-pattern overlap-inclusive occurrence counts (Aho-Corasick, one pass)",
      AcCounts.builder),
    (AcSummary.FunctionName,
      "graft_ac_summary(text, patterns_spec) - [total hits, distinct patterns hit] (Aho-Corasick, one pass)",
      AcSummary.builder),
    (ViterbiSeg.FunctionName,
      "graft_viterbi_seg(word, vocab_spec, max_piece_len) - min-surprisal unigram-LM segmentation, pieces joined by '|'",
      ViterbiSeg.builder),
    (TextTilingDots.FunctionName,
      "graft_texttiling_dots(text, w, k) - TextTiling per-gap block-cohesion dot products (one pass)",
      TextTilingDots.builder)
  )

  /** Register every graft function in an existing session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** Session-extensions installer: `.config("spark.sql.extensions",
  * "graft.functions.GraftExtensions")` (or `withExtensions`) makes every
  * graft function available to SQL in all sessions built from that config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    // optimizer surface: boolean contains-match predicates short-circuit
    // via RLIKE instead of materializing every regex match (see
    // graft.plans.ContainsMatchRewrite for the null-regime scope rules),
    // and literal regexp_replace chains fuse into one sequential-semantics
    // node (graft.plans.CollapseRegexpReplaceChains)
    ext.injectOptimizerRule(_ => graft.plans.ContainsMatchRewrite)
    ext.injectOptimizerRule(_ => graft.plans.CollapseRegexpReplaceChains)
    // planner surface: the native whole-operator as-of join
    // (graft.plans.AsOfJoinPlan -> AsOfJoinExec single-pass merge)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
