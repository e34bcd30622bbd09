package graft.ops

import graft.core.Materialize.StageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly operators: sequence packing, BM25 retrieval and
  * PageRank — the steps between "clean corpus" and "training batches" that
  * a 100 TB pipeline runs after dedup/quality filtering.
  */
object TrainOps {

  /** Concat-and-chunk sequence packing (the standard LLM pretraining pack):
    * documents are concatenated in `idCol` order into one virtual token
    * stream, then the stream is chunked into fixed windows of `window`
    * tokens; a document's global token offset decides which window(s) it
    * lands in (documents may straddle a boundary).
    *
    * The global running offset is a distributed two-phase prefix sum, NOT a
    * single `Window.orderBy` (which would drag the whole corpus through one
    * task):
    *   1. shard by `idCol div shardSize` (range-ordered, so shard order ==
    *      id order), aggregate one token total per shard;
    *   2. collect the per-shard totals (one row per shard — thousands of
    *      rows at 100 TB, not data rows), exclusive-prefix-sum them on the
    *      driver, broadcast the shard→base map back;
    *   3. a per-shard window cumsum (bounded partitions) plus the shard base
    *      gives every document its exact global offset.
    *
    * @param docs   input with `idCol` (dense numeric id) and `tokCol`
    *               (per-document token count, > 0)
    * @param window tokens per training window (e.g. 512, 4096)
    * @param shardSize documents per prefix-sum shard; tune so one shard's
    *                  rows fit a task comfortably (1 << 20 at scale)
    * @return idCol, n_tok, tok_offset, first_win, last_win, n_wins
    */
  def packConcatChunk(docs: DataFrame, idCol: String, tokCol: String,
                      window: Long, shardSize: Long = 1L << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sharded = docs
      .select(col(idCol).cast("long").as("id"), col(tokCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("shard", expr(s"id div $shardSize"))
    // phase 1+2: one row per shard to the driver, exclusive prefix on the
    // driver, broadcast back. Deterministic and O(#shards) driver memory.
    val totals = sharded.groupBy("shard").agg(sum("n_tok").as("shard_tok"))
      .orderBy("shard").as[(Long, Long)].collect()
    var acc = 0L
    val bases = totals.toSeq.map { case (shard, tok) =>
      val b = (shard, acc); acc += tok; b
    }
    val baseDf = spark.createDataset(bases).toDF("shard", "shard_base")
    // phase 3: per-shard cumsum — partitions are bounded by shardSize
    val wsum = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded.join(broadcast(baseDf), "shard")
      .withColumn("tok_offset", col("shard_base") + coalesce(sum("n_tok").over(wsum), lit(0L)))
      .withColumn("first_win", expr(s"tok_offset div $window"))
      .withColumn("last_win", expr(s"(tok_offset + n_tok - 1) div $window"))
      .select(col("id").as(idCol), col("n_tok"), col("tok_offset"),
        col("first_win"), col("last_win"),
        (col("last_win") - col("first_win") + 1L).as("n_wins"))
  }

  /** First-fit-decreasing BIN packing — the batch-assembly counterpart of
    * [[packConcatChunk]]: variable-length docs are packed WHOLE into
    * fixed-`budget` bins (no document straddles a bin boundary), greedily
    * into the first bin that still fits, longest docs first — the classic
    * FFD heuristic (≤ 11/9·OPT + 1 bins).
    *
    * Distribution shape (the packConcatChunk two-phase idiom, adapted):
    *   1. the global decreasing rank comes from one row per DISTINCT length
    *      to the driver (≤ `budget` rows), exclusive-prefix-summed and
    *      broadcast back as per-length base ranks; within a length,
    *      row_number over length-bounded partitions — never a global
    *      single-task sort;
    *   2. the rank stream is sharded into contiguous `shardSize`-doc runs;
    *      each shard runs the sequential FFD fold in its own task with
    *      ≤ shardSize bin remainders in memory (bins are shard-local, so
    *      the fold never crosses tasks). Sharding trades a bounded amount
    *      of packing efficiency for parallelism; each shard is still a
    *      decreasing run, so per-shard quality IS FFD quality.
    *
    * Output: one row per BIN — (bin_id = shard·shardSize + idx, n_docs,
    * bin_tokens, fill_ppm) plus the global (total_bins, chunker_windows =
    * ⌈Σtok/budget⌉, the concat-chunker's window count = the packing lower
    * bound) so efficiency-vs-chunker is a column, not a side calculation.
    * Ratios are truncating parts-per-million (integer div — the halfway-
    * digit rounding law trap, FIXTURES.md). Docs longer than `budget` are
    * excluded (they can never fit a bin; [[chunkSliding]] is their path);
    * skew note: the per-length row_number bounds a partition by that
    * length's multiplicity — uniform-length corpora should pre-salt.
    */
  def packBinsFfd(docs: DataFrame, idCol: String, tokCol: String,
                  budget: Long, shardSize: Int = 100): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0 && col("n_tok") <= budget)
    val lens = d.groupBy("n_tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("n_tok")).as[(Long, Long)].collect()
    var acc = 0L
    val bases = lens.toSeq.map { case (len, c) => val b = (len, acc); acc += c; b }
    val baseDf = spark.createDataset(bases).toDF("n_tok", "rank_base")
    val wlen = Window.partitionBy("n_tok").orderBy("id")
    val ranked = d.join(broadcast(baseDf), "n_tok")
      .withColumn("rn", col("rank_base") + row_number().over(wlen))
      .withColumn("shard", expr(s"(rn - 1) div $shardSize"))
    val bs = budget
    val ss = shardSize.toLong
    // per-shard sequential FFD fold: rows arrive (shard, rn)-sorted, so a
    // task holding several shards resets its ≤ shardSize remainders at
    // each shard boundary — bounded memory, no cross-task state
    val assigned = ranked.select(col("id"), col("n_tok"), col("rn"), col("shard"))
      .as[(Long, Long, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "rn")
      .mapPartitions { it =>
        var curShard = -1L
        val rems = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (id, nTok, _, sh) =>
          if (sh != curShard) { curShard = sh; rems.clear() }
          var i = 0
          while (i < rems.length && rems(i) < nTok) i += 1
          if (i == rems.length) rems += (bs - nTok) else rems(i) -= nTok
          (id, nTok, sh * ss + i)
        }
      }.toDF("id", "n_tok", "bin_id")
    val bins = assigned.groupBy("bin_id").agg(
      count(lit(1)).as("n_docs"), sum("n_tok").as("bin_tokens"))
    val tot = bins.agg(count(lit(1)).as("total_bins"), sum("bin_tokens").as("tt"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"),
        call_function("div", col("bin_tokens") * lit(1000000L), lit(bs)).as("fill_ppm"),
        col("total_bins"),
        call_function("div", col("tt") + lit(bs - 1), lit(bs)).as("chunker_windows"))
  }

  /** Fixed-iteration PageRank over an undirected edge list (each edge walks
    * both ways). The Pregel shape: one equi-join (ranks onto out-edges) and
    * one sum-aggregate (contributions by destination) per iteration — both
    * plain shuffles on the node id, no driver-side data beyond one count.
    *
    * Determinism contract (shared with the DuckDB oracle): FIXED-POINT
    * integer arithmetic. Ranks are BIGINT micro-units at scale 1e12; the
    * per-edge contribution is integer division `pr div outdeg`, the damping
    * step is `(85 * sum) div 100`, the teleport term `(15 * S div 100) div
    * n`. Rounded double math was tried first and diverged at 1-2e-12: an
    * exact 12-decimal rank over a small out-degree lands exactly ON the
    * halfway point, where Spark's BigDecimal HALF_UP and DuckDB's
    * double-arithmetic ROUND disagree. Integer division has no rounding law
    * to disagree about; truncation leaks <1 micro-unit of mass per edge per
    * round, deterministically in both engines.
    *
    * @param edges columns `src`, `dst`; interpreted undirected
    * @return (id, pr_micro BIGINT, pr DOUBLE = pr_micro/1e12)
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               dampingPct: Long = 85L): DataFrame = {
    val S = 1000000000000L // 1e12 micro-units of rank mass
    // Stage the BARE symmetric edge list — an earlier version joined
    // outdeg onto every edge here, which materialized a second, wider copy
    // of the whole edge list before the first iteration (the single most
    // expensive step of the job at sf0.1). Out-degree instead rides on the
    // node-sized rank table below.
    //
    // Symmetrize in ONE pass: each edge row explodes into its two
    // directions inside the scan stage, so materializing `sym` holds ONE
    // edge-list copy (the staged blocks) instead of three — the round-12
    // shape (persist(e) + union of two scans of it) kept the persisted
    // original alive while writing the doubled copy, and was the largest
    // line item of q_pagerank's sf10 24g OOM. Row ORDER differs from the
    // union form, but every consumer is an integer aggregate/join —
    // order-independent by the fixed-point design.
    val sym = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .staged()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .staged() // node-sized; computed once
    val n = deg.count() // every node has out-edges under the symmetric closure
    val teleport = (S * (100L - dampingPct) / 100L) / n
    // Per iteration, the per-source contribution (pr div outdeg) is built
    // on the NODE-sized side (ranks ⋈ deg — two tiny tables) and joined
    // onto the edges. Both small tables sit behind Materialize.stage cuts, which
    // hide their size from the planner (LogicalRDD reports
    // spark.sql.defaultSizeInBytes), so without an explicit hint every
    // iteration falls back to sort-merge — re-sorting the full edge list
    // per round. While n is broadcast-sized, hint it; beyond that the
    // shuffle join is the right plan and the edge side dominates anyway.
    // The cutoff is ~1M nodes (~tens of MB as a HashedRelation) — each
    // round COLLECTS the hinted table to the driver, so a multi-hundred-MB
    // broadcast near a larger cutoff would OOM small drivers where the
    // shuffle join merely runs slower.
    def maybeBcast(df: DataFrame): DataFrame =
      if (n <= 1000000L) broadcast(df) else df
    var ranks = deg.select(col("src").as("id"), lit(S / n).as("pr_micro"))
    for (_ <- 1 to iters) {
      val contrib = maybeBcast(
        ranks.join(deg, ranks("id") === deg("src"))
          .select(col("id"), expr("pr_micro div outdeg").as("c")))
      ranks = sym.join(contrib, sym("src") === contrib("id"))
        .select(sym("dst").as("id"), col("c"))
        .groupBy("id")
        .agg((lit(teleport) + expr(s"($dampingPct * sum(c)) div 100")).as("pr_micro"))
      // r15: NOT staged per iteration. Unlike the CC loops (whose round
      // plan references its predecessor 2-6× and so doubles without a
      // cut), each rank iteration references the previous ranks exactly
      // ONCE — the plan grows LINEARLY (~8 ops/iter over the staged
      // sym/deg leaves), so the lineage cut bought nothing and cost one
      // checkpoint job + one node-table store per iteration. The whole
      // 5-iteration chain now plans and runs as one query.
    }
    ranks.withColumn("pr", col("pr_micro").cast("double") / lit(1.0e12))
  }

  /** DuckDB oracle for [[pageRank]]: the same fixed iteration count
    * unrolled as chained CTEs (DuckDB disallows aggregates in a recursive
    * CTE term, so the rounds are generated, not recursive). Shares the
    * fixed-point micro-unit contract — all-integer arithmetic, so the two
    * engines agree bit-for-bit with no rounding law in play. */
  def pageRankOracle(edgesSql: String, iters: Int, topK: Int,
                     dampingPct: Long = 85L): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT s.dst AS id,
         |  (SELECT tele FROM nn) +
         |    ($dampingPct * CAST(SUM(r.pr_micro // d.outdeg) AS BIGINT)) // 100 AS pr_micro
         |FROM sym s JOIN r${i - 1} r ON s.src = r.id JOIN deg d ON d.src = s.src
         |GROUP BY s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src),
       |nn AS (SELECT (1000000000000 * ${100L - dampingPct} // 100) // COUNT(*) AS tele,
       |              1000000000000 // COUNT(*) AS r0_micro FROM deg),
       |r0 AS (SELECT src AS id, (SELECT r0_micro FROM nn) AS pr_micro FROM deg),
       |$rounds
       |SELECT id, pr_micro, CAST(pr_micro AS DOUBLE) / 1e12 AS pr
       |FROM r$iters ORDER BY pr_micro DESC, id LIMIT $topK""".stripMargin
  }

  /** One BM25(k1=1.2, b=0.75) term's score in integer MICRO-units.
    *
    * Determinism contract (the q_lm_perplexity / PageRank fixed-point rule —
    * a rounded double chain over transcendentals split the engines at the
    * halfway digit in round 4): the only double op is the idf `ln`, rounded
    * to 6 dp and scaled to BIGINT micros (round→int is exact because
    * round(x,6)*1e6 is within 1e-9 of an integer in both engines); the
    * length norm `k1*(1-b+b*dl/avgdl)` is cleared of its divisions —
    * avgdl = sum_dl/n_docs, so norm_micro = 300000 + (900000*dl*n_docs) div
    * sum_dl, all-integer truncating division with no rounding law to
    * disagree on; the term score is one more integer quotient. Caller sums
    * the term micros and divides by 1e6 at the end.
    *
    * All inputs are BIGINT columns. Intermediates stay under 2^63 up to
    * ~1e18 token corpora (idf_micro<3e7 · tf<1e5 · 2.2e6 ≈ 6e18 worst case;
    * 9e5·dl·n_docs needs dl·n_docs < 1e13 — at larger scale drop the micro
    * scale one decade). */
  def bm25TermMicro(tf: Column, df: Column, nDocs: Column, dl: Column,
                    sumDl: Column): Column = {
    val idfMicro = round(round(log(lit(1.0) +
      (nDocs.cast("double") - df.cast("double") + 0.5) / (df.cast("double") + 0.5)),
      6) * 1000000d).cast("long")
    val normMicro = lit(300000L) + intDiv(lit(900000L) * dl * nDocs, sumDl)
    intDiv(idfMicro * tf * lit(2200000L), tf * lit(1000000L) + normMicro)
  }

  /** Integer `div` on positive BIGINT columns (the Column API has no
    * operator; `floor(a/b)` would round through a double and lose exactness
    * past 2^53). `div` is Spark's registered name for IntegralDivide;
    * matches DuckDB `//` on positive operands. */
  private def intDiv(a: Column, b: Column): Column = call_function("div", a, b)

  // ------------------------------------------------------------ BPE merges

  /** Byte-pair-encoding merge learning (Sennrich, Haddow, Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") at
    * token granularity: `rounds` iterations of "count adjacent pairs, pick
    * the most frequent, merge every occurrence greedily left-to-right" —
    * the tokenizer-induction step of an LLM data pipeline, here inducing
    * word-level merges over the corpus token stream.
    *
    * Greedy LTR without sequential scanning: a merge at position i consumes
    * i+1, so of a RUN of consecutive candidate positions only alternate
    * ones merge (runs longer than 1 arise only for self-pairs a==b, e.g.
    * "a a a" -> "aa a"). Runs are gaps-and-islands over the CANDIDATE rows
    * only (a candidate continues a run iff its position is the previous
    * candidate's next-live position) and "alternate" is rank-odd within the
    * island — all window work bounded by the best pair's occurrence count,
    * never the corpus.
    *
    * Scale shape per round (the round-9 verdict's incremental pair
    * rewrite): the corpus lives as an ADJACENCY table (id, pos, tok, nxt,
    * nxt_pos) with ORIGINAL, gap-preserving positions — built by ONE lead()
    * window at round 0 and never re-windowed. Each round is then: one
    * PARTIALLY AGGREGABLE pair count over the maintained `nxt` column
    * (state = vocab-squared at worst, Zipf in practice), a ONE-ROW argmax
    * collect (the bounded-driver-fit pattern of [[packConcatChunk]]'s
    * shard table — the merged pair then re-enters the plan as a LITERAL),
    * tiny windows over the candidate subset, and ONE rewrite pass applying
    * the kept-merge deltas through equi-joins on (id, pos)/(id, nxt_pos)
    * against the small kept set (broadcast at page scale, shuffled
    * hash-join beyond) — positions adjacent to the merged pair are the
    * only rows that change, everything else streams through the join
    * untouched, and no full-corpus sort ever runs again. Materialize.stage
    * keeps the plan O(1)-deep across rounds (the [[pageRank]] contract).
    * `rounds` passes of scan+join is BPE's inherent cost — production
    * tokenizers fit on a corpus SAMPLE; pair counts are deterministic,
    * ties broken (count desc, a asc, b asc).
    *
    * @return one row per learned merge: round (1-based), tok_a, tok_b,
    *         pair_count — ordered by round. */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeLearn(docs, idCol, textCol, rounds)._1
      .toDF("round", "tok_a", "tok_b", "pair_count")
      .orderBy("round")
  }

  /** Shared BPE induction loop: returns (learned merges, final adjacency
    * table) so [[bpeMerges]] exposes the merge table and the
    * kernel-equivalence spec the encoded corpus — one machinery, two
    * outputs. (A dictionary-encoded variant — int token ids, strings only
    * on the post-aggregation argmax join — was measured SLOWER at sf0.1:
    * the vocab rank + per-round name joins cost more than the string
    * hashing they saved. Strings stay.)
    *
    * The adjacency invariant (nxt == token at nxt_pos, post all merges so
    * far) is maintained by construction; see the case analysis inline. */
  private def bpeLearn(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 32, s"rounds must be in [1,32], got $rounds")
    // adjacency with ORIGINAL positions: merged-away positions leave gaps,
    // so no re-rank window is ever needed — adjacency is carried by
    // nxt_pos, not by pos arithmetic.
    //
    // Partition count is SIZE-DERIVED (AQE's own coalescing law applied
    // manually): stagedKeepLayout must plan its job with AQE off so the
    // staged adjacency advertises its hash(id) layout, which also disables
    // AQE's partition coalescing — left at spark.sql.shuffle.partitions,
    // a page-scale corpus ran every per-round argmax over 32 near-empty
    // partitions whose un-coalesced partial aggregates dominated the round
    // (ProbeBpe: argmax 1.27 s → 2.42 s). The count mirrors AQE's OWN
    // coalescing law (parallelism-first, SPARK-39915): at least one
    // advisory-sized chunk per partition, but never coalescing below the
    // context's default parallelism while partitions still clear
    // minPartitionSize — on the (uncompressed, exploded) token stream,
    // estimated at 8× the source's compressed bytes. sf0.1 lands at ~5
    // partitions, a 100 TB corpus at ~bytes/advisory — scale-adaptive,
    // no local[32] constant (defaultParallelism is the cluster's total
    // cores, the same signal AQE uses).
    val spark = docs.sparkSession
    def confBytes(key: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get(key, dflt))
    val advisory = confBytes("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    val minSize = confBytes("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
    val adjBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes * 8
    val parallel = BigInt(spark.sparkContext.defaultParallelism)
      .min(BigInt(1).max(adjBytes / minSize))
    val nParts = (adjBytes / advisory).max(parallel).max(BigInt(1))
      .min(BigInt(1 << 20)).toInt
    var adj = docs
      .repartition(nParts, col(idCol))
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .withColumn("nxt_pos", lead(col("pos"), 1).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .stagedKeepLayout()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = adj.filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc, col("nxt").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((r.toLong, a, b, c))
        val ab = a + b
        // ONE zero-shuffle window pass per round (r14 — replaced the kept
        // table + its four rewrite joins, which ProbeBpe measured as 3.0 s
        // of the 4.45 s query: kept 0.75 + rewrite 2.28 at sf0.1). The
        // adjacency invariant makes every rewrite participant a NEIGHBOR
        // ROW in (id, pos) order — nxt_pos IS the next live row's pos — so
        // the consumed row q is lag-1 of its merge start p, the merged
        // row's new nxt/nxt_pos are lead-2 of p, and a predecessor whose
        // nxt merges is lead-1 of a merge start. stagedKeepLayout()
        // preserves the round-0 window's hash(id) partitioning and
        // (id, pos) ordering through LogicalRDD (plain staged() under AQE
        // loses both — AdaptiveSparkPlanExec reports Unknown — and every
        // round re-pays one exchange + sort), so the per-round WindowExec
        // plans with NO exchange and NO sort: the round is one in-memory
        // scan (ProbeBpe prints the round-2 plan as the receipt).
        //
        // Merge-start selection (the island alternation):
        //  - a != b: a candidate's successor row q has tok = b != a, so no
        //    candidate can sit at another's nxt_pos — every island is a
        //    singleton and EVERY candidate is a merge start.
        //  - a == b: islands are maximal RUNS of consecutive candidate
        //    rows ("a a a a"); greedy LTR keeps the 1st, 3rd, ... of each
        //    run. Run index = running candidate count minus the count at
        //    the run's start — three running frames over the same window,
        //    one WindowExec.
        val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val candC = col("tok") === a && col("nxt") === b // null nxt => false
        val withP =
          if (a != b) adj.withColumn("is_p", candC)
          else {
            // brk: candidate whose previous row is not a candidate (run
            // start); cum: running candidate count; runCum: cum at the most
            // recent run start (running max over a monotone sequence).
            // Island index within the run = cum - runCum + 1; keep odd.
            adj
              .withColumn("cnd", candC)
              .withColumn("cum",
                sum(when(col("cnd"), 1L).otherwise(0L)).over(wRun))
              .withColumn("runcum",
                max(when(col("cnd") &&
                    !coalesce(lag(col("cnd"), 1).over(w), lit(false)),
                  col("cum"))).over(wRun))
              .withColumn("is_p",
                col("cnd") && (col("cum") - col("runcum")) % 2 === 0)
              .drop("cnd", "cum", "runcum")
          }
        // Rewrite from neighbor rows: delete q (= row after a merge
        // start); a merge start takes tok = ab and inherits the deleted
        // q's nxt/nxt_pos (= lead-2), except when the next live row after
        // q is ITSELF a merge start this round (the "a a a a" chain) —
        // then its token becomes ab too; a row immediately before a merge
        // start repoints its nxt at ab.
        adj = withP
          .withColumn("is_q", coalesce(lag(col("is_p"), 1).over(w), lit(false)))
          .withColumn("nx_p", coalesce(lead(col("is_p"), 1).over(w), lit(false)))
          .withColumn("n2_p", coalesce(lead(col("is_p"), 2).over(w), lit(false)))
          .withColumn("tok2", lead(col("tok"), 2).over(w))
          .withColumn("pos2", lead(col("pos"), 2).over(w))
          .filter(!col("is_q"))
          .select(col(idCol), col("pos"),
            when(col("is_p"), lit(ab)).otherwise(col("tok")).as("tok"),
            when(col("is_p"),
                when(col("n2_p"), lit(ab)).otherwise(col("tok2")))
              .when(col("nx_p"), lit(ab))
              .otherwise(col("nxt")).as("nxt"),
            when(col("is_p"), col("pos2"))
              .otherwise(col("nxt_pos")).as("nxt_pos"))
          .stagedKeepLayout()
        r += 1
      }
    }
    (merges.toSeq, adj)
  }

  /** Tokenizer APPLY with the LEARNED merges (the production step between
    * [[bpeMerges]] induction and [[packConcatChunk]]/[[packBinsFfd]]
    * packing): LEARN the merge table on a deterministic 1/`sampleMod`
    * document sample (production tokenizers fit on a sample — Sennrich
    * 2016 §5), then APPLY it corpus-wide as a MAP-ONLY pass and report the
    * top-`k` subword vocabulary of the encoded stream.
    *
    * The learned merges are a bounded driver artifact (`rounds` rows, the
    * argmax-collect contract of [[bpeLearn]]), so they re-enter the
    * corpus-wide plan as LITERALS: the apply is [[bpeEncodeStream]]'s
    * render + replace chain inside the scan projection — pure codegen,
    * zero shuffles until the final partial-aggregable vocabulary count.
    * At 100 TB this is the shape that works: induction touches only the
    * sample, and the expensive corpus-wide step is embarrassingly
    * parallel.
    *
    * @return rnk, token, cnt — the [[bpeEncode]] vocabulary shape. */
  def bpeApplyLearned(docs: DataFrame, idCol: String, textCol: String,
                      rounds: Int, k: Int, sampleMod: Int = 8): DataFrame = {
    val sample = if (sampleMod <= 1) docs
      else docs.filter(col(idCol) % sampleMod === 0)
    val merges = bpeLearn(sample, idCol, textCol, rounds)._1
      .map { case (_, a, b, _) => (a, b) }
    bpeEncodeStream(docs, idCol, textCol, merges)
      .groupBy(col("tok").as("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token").asc)))
      .select(col("rnk"), col("token"), col("cnt"))
  }

  /** Spec accessor: [[bpeLearn]]'s final adjacency as the encoded token
    * stream (id, pos, tok) — the relational fold the replace-chain kernel
    * must reproduce (Round10OpsSpec). */
  private[graft] def bpeFoldStream(docs: DataFrame, idCol: String,
      textCol: String, rounds: Int): DataFrame =
    bpeLearn(docs, idCol, textCol, rounds)._2
      .select(col(idCol), col("pos"), col("tok"))

  /** Corpus-stream twin of [[bpeEncode]]: render each document's WORD
    * stream as `<w1><w2>…` (one concat + array_join, no per-element
    * lambda) and run the literal merge replace chain over it — the same
    * delimiter argument as [[bpeEncode]] makes one `replace` pass per
    * merge exactly the greedy-LTR island rewrite, so the result equals
    * [[bpeLearn]]'s relational fold (spec-pinned). Map-only: linear in
    * corpus bytes, no shuffle.
    *
    * @return (idCol, pos, tok) — the encoded, positioned token stream. */
  private[graft] def bpeEncodeStream(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (x, y) =>
      x.nonEmpty && y.nonEmpty && !(x + y).exists(c => c == '<' || c == '>') },
      "merges must be non-empty symbol pairs without delimiter chars")
    val rendered = concat(lit("<"),
      array_join(TextOps.tokens(col(textCol)), "><"), lit(">"))
    val encoded = merges.foldLeft(rendered) { case (c, (x, y)) =>
      call_function("replace", c, lit(s"<$x><$y>"), lit(s"<$x$y>"))
    }
    docs.select(col(idCol),
      posexplode(regexp_extract_all(encoded, lit("<([^>]+)>"), lit(1)))
        .as(Seq("pos", "tok")))
  }

  /** DuckDB oracle for [[bpeMerges]]: each round unrolled as chained CTEs
    * (the [[pageRankOracle]] convention) — pair lead, one-row argmax,
    * island-alternation merge, position re-rank. `docsSql` must yield
    * (doc_id, text). */
  def bpeMergesOracle(docsSql: String, rounds: Int): String = {
    val union = (1 to rounds)
      .map(i => s"SELECT CAST($i AS BIGINT) AS round, a AS tok_a, b AS tok_b, c AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""${bpeRoundCtePrefix(docsSql, rounds)}
       |$union
       |ORDER BY round""".stripMargin
  }

  /** Shared WITH-prefix of the BPE oracles: tokenized t0 plus the chained
    * per-round (pair lead, argmax, island merge, re-rank) CTEs — the b_i
    * CTEs carry the learned merges, t_rounds the encoded (t0-scoped)
    * corpus. `srcWhere` restricts t0 to a learn sample (TRUE = full). */
  private def bpeRoundCtePrefix(docsSql: String, rounds: Int,
                                srcWhere: String = "TRUE"): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (SELECT doc_id, pos, tok,
         |  LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |FROM t${i - 1}),
         |b$i AS MATERIALIZED (SELECT tok AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM p$i WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY c DESC, a, b LIMIT 1),
         |k$i AS MATERIALIZED (SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, ROW_NUMBER() OVER (PARTITION BY doc_id, grp
         |        ORDER BY pos) AS rn
         |    FROM (SELECT p.doc_id, p.pos,
         |            p.pos - ROW_NUMBER() OVER (PARTITION BY p.doc_id
         |              ORDER BY p.pos) AS grp
         |          FROM p$i p JOIN b$i ON p.tok = b$i.a AND p.nxt = b$i.b))
         |  WHERE rn % 2 = 1),
         |t$i AS MATERIALIZED (SELECT doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos,
         |    CASE WHEN m1 THEN (SELECT a || b FROM b$i) ELSE tok END AS tok
         |  FROM (SELECT t.doc_id, t.pos, t.tok,
         |          k1.pos IS NOT NULL AS m1, k2.pos IS NOT NULL AS m2
         |        FROM t${i - 1} t
         |        LEFT JOIN k$i k1 ON k1.doc_id = t.doc_id AND k1.pos = t.pos
         |        LEFT JOIN k$i k2 ON k2.doc_id = t.doc_id AND k2.pos + 1 = t.pos)
         |  WHERE NOT m2)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS ($docsSql),
       |t0 AS MATERIALIZED (SELECT doc_id, CAST(pos AS INT) AS pos, tok FROM (
       |    SELECT doc_id,
       |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
       |      unnest(range(len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos
       |    FROM d WHERE $srcWhere)),
       |$roundCtes""".stripMargin
  }

  /** DuckDB oracle for [[bpeApplyLearned]]: the SAME learn chain as
    * [[bpeMergesOracle]] (so the merges are re-derived from scratch,
    * scale-adaptively), then the top-k vocabulary of the final rewritten
    * stream t_rounds — the encode step replayed relationally. */
  def bpeApplyOracle(docsSql: String, rounds: Int, k: Int,
                     sampleMod: Int = 8): String = {
    // the learned pairs live in the b_i CTEs; the corpus-wide APPLY is the
    // same render + replace chain as bpeEncodeStream, with each literal
    // replaced by a scalar subquery on b_i. COALESCE('<>') no-ops a round
    // the induction exhausted before reaching (the '<>' pattern can never
    // match — symbols are non-empty).
    val renderedSql = s"'<' || array_to_string(" +
      s"regexp_extract_all(lower(text), '[a-z0-9]+'), '><') || '>'"
    val encodedSql = (1 to rounds).foldLeft(renderedSql) { (s0, i) =>
      s"replace($s0,\n    COALESCE((SELECT '<' || a || '><' || b || '>' FROM b$i), '<>')," +
        s"\n    COALESCE((SELECT '<' || a || b || '>' FROM b$i), '<>'))"
    }
    s"""${bpeRoundCtePrefix(docsSql, rounds, srcWhere = s"doc_id % $sampleMod = 0")},
       |enc AS (SELECT $encodedSql AS e FROM d),
       |tok AS (SELECT unnest(regexp_extract_all(e, '<([^>]+)>', 1)) AS token FROM enc),
       |g AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
       |top AS (SELECT token, cnt FROM g ORDER BY cnt DESC, token LIMIT $k)
       |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk, token, cnt
       |FROM top ORDER BY rnk""".stripMargin
  }

  // ------------------------------------------------------- BPE encoding

  /** Greedy BPE APPLICATION — the encode side of [[bpeMerges]]: apply a
    * fixed, rank-ordered merge table to a word, returning its subword
    * tokens (Sennrich et al. 2016's sequential-merge application: each
    * merge is applied fully, in rank order).
    *
    * Pure codegen'd string work, no UDF, via a delimiter rendering that
    * makes ONE `replace` pass per merge exact:
    *
    *   - each symbol is rendered `<sym>` (chars `<`/`>` never occur inside
    *     a symbol), so the pattern `<x><y>` can only match a genuine
    *     adjacent symbol pair — never mid-symbol;
    *   - adjacent occurrences share no characters (unlike space-separated
    *     renderings, where the shared boundary space hides every second
    *     occurrence from a single pass), so `replace`'s left-to-right
    *     non-overlapping scan merges a self-pair run leftmost-first in one
    *     pass — the same greedy-LTR convention as [[bpeMerges]]' island
    *     alternation;
    *   - a replacement cannot create a NEW occurrence of the SAME pair
    *     (neighboring symbols are untouched and `xy` differs from both `x`
    *     and `y`), so one pass IS the fixpoint for that merge.
    *
    * Scale shape: a per-row chain of `merges.size` codegen'd string
    * replaces inside the scan projection — linear in corpus bytes, no
    * shuffle, no lambda re-evaluation (the HOF trap in CLAUDE.md).
    *
    * @return array column of subword tokens for the word. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty && merges.forall { case (x, y) =>
      x.nonEmpty && y.nonEmpty && !(x + y).exists(c => c == '<' || c == '>') },
      "merges must be non-empty symbol pairs without delimiter chars")
    val rendered = regexp_replace(word, "(.)", "<$1>")
    val encoded = merges.foldLeft(rendered) { case (c, (x, y)) =>
      call_function("replace", c, lit(s"<$x><$y>"), lit(s"<$x$y>"))
    }
    regexp_extract_all(encoded, lit("<([^>]+)>"), lit(1))
  }

  /** DuckDB twin of [[bpeEncode]]: the same render + replace chain over a
    * word-valued SQL expression, returning the ENCODED STRING (callers
    * extract tokens with `regexp_extract_all(..., '<([^>]+)>', 1)`). */
  def bpeEncodeSql(wordExpr: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(s"regexp_replace($wordExpr, '(.)', '<\\1>', 'g')") {
      case (s0, (x, y)) => s"replace($s0, '<$x><$y>', '<$x$y>')"
    }

  // ------------------------------------------------------ sliding chunks

  /** Overlapping token-window chunking — the SPLIT side of context-window
    * assembly ([[packConcatChunk]] is the CONCAT side): each document is cut
    * into windows of `window` tokens every `stride` tokens (overlap =
    * window - stride), the standard long-document treatment when training
    * sequences must not lose cross-boundary context. Chunk identity is the
    * md5 of the space-joined window, so downstream exact-dedup can collapse
    * identical chunks across documents.
    *
    * Scale shape: tokenization and the chunk-count arithmetic are codegen'd
    * scan projections; the only fan-out is `posexplode` over the per-doc
    * chunk-start sequence — bounded by ceil(len/stride), i.e. linear in
    * corpus token count, no shuffle at all until a downstream consumer
    * aggregates. Empty documents produce zero chunks (nothing to window).
    * LONG-DOC CAVEAT: the explode carries each doc's FULL token array into
    * every chunk row until the final slice, i.e. O(len²/stride) transient
    * bytes per document — fine for web-scale docs (len ≤ ~10⁴ tokens ⇒ MBs),
    * but a book-length outlier (10⁶ tokens ⇒ ~TB transient) must be
    * pre-split or length-capped upstream. The per-chunk-row re-tokenize
    * alternative avoids the carry but re-runs the regex len/stride times
    * (the known-slow HOF path, CLAUDE.md); at typical doc lengths the carry
    * is the right trade.
    *
    * @return doc_id, chunk_idx (0-based), chunk_len, chunk_hash */
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-bigram profile is under a TARGET
    * distribution than under the RAW corpus distribution,
    * `score(d) = Σ_grams log(p_target[bucket] / p_raw[bucket])` with
    * Laplace-smoothed bucket probabilities over `buckets` hashed bins.
    * Positive score → resample toward the target. Here the target slice is
    * a predicate over the corpus itself (the fixture has no separate
    * target corpus); the estimator is unchanged.
    *
    * Engine-parity contract: the gram hash is the md5/`conv` portable
    * family, the per-bucket log-ratio is the ONLY transcendental — rounded
    * to integer micro-units (ln never lands on a rounding half-digit,
    * FIXTURES.md) — and per-document scores are exact BIGINT sums of those
    * micro-units, so the DuckDB twin matches bit-for-bit.
    *
    * Scale shape (100 TB): one explode pass over bigrams; the bucket
    * statistics table is ≤ `buckets` rows (conditional partial-agg counts)
    * and the totals are ONE row — both broadcast; the per-doc score is one
    * doc-keyed partial-agg'd shuffle. Nothing holds more than O(buckets)
    * driver/executor state, and no join key exceeds doc cardinality. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 256): DataFrame = {
    val joined = array_join(TextOps.tokens(col(textCol)), "_")
    val bigramPat = "(?<![a-z0-9])(?=([a-z0-9]+_[a-z0-9]+))"
    val grams = docs.select(col(idCol), targetPred.as("is_t"),
        explode(regexp_extract_all(joined, lit(bigramPat), lit(1))).as("s"))
      .withColumn("b", conv(substring(md5(col("s")), 1, 7), 16, 10)
        .cast("long") % buckets)
    val cnt = grams.groupBy("b").agg(
      count(lit(1)).as("cr"), count(when(col("is_t"), 1)).as("ct"))
    // corpus totals = sums over the bucket table itself: an unpartitioned
    // window over ≤ `buckets` rows (bounded state at any corpus size) —
    // NOT a join against a one-row aggregate, which constant-folds into a
    // nested-loop product (see Sketch.kmvSetOps)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bTbl = cnt
      .withColumn("nr", sum(col("cr")).over(wAll))
      .withColumn("nt", sum(col("ct")).over(wAll))
      .select(col("b"),
        round(log(((col("ct") + lit(1.0)) * (col("nr") + lit(buckets.toDouble))) /
          ((col("cr") + lit(1.0)) * (col("nt") + lit(buckets.toDouble)))) * lit(1e6), 0)
          .cast("long").as("rm"))
    val sc = grams.join(broadcast(bTbl), "b")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("rm")).as("s"))
    docs.select(col(idCol), col("lang"))
      .join(sc, Seq(idCol), "left_outer")
      .select(col(idCol), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("s"), lit(0L)).as("score_micro"),
        (coalesce(col("s"), lit(0L)) > 0L).as("keep"))
      .orderBy(idCol)
  }

  /** DuckDB oracle for [[dsirWeights]] over the `documents` table with
    * target predicate `lang = 'en'`. */
  def dsirOracle(buckets: Int = 256): String =
    s"""WITH t0 AS (SELECT doc_id, lang,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
       |g AS (SELECT doc_id, lang = 'en' AS is_t,
       |    unnest([toks[i]||'_'||toks[i+1] for i in range(1, len(toks))]) AS s
       |  FROM t0),
       |bl AS (SELECT doc_id, is_t,
       |    ('0x'||substr(md5(s),1,7))::BIGINT % $buckets AS b FROM g),
       |cnt AS (SELECT b, COUNT(*) AS cr,
       |    COUNT(*) FILTER (WHERE is_t) AS ct FROM bl GROUP BY b),
       |tot AS (SELECT COUNT(*) AS nr, COUNT(*) FILTER (WHERE is_t) AS nt FROM bl),
       |r AS (SELECT b, CAST(round(ln(((ct + 1.0) * (nr + $buckets.0)) /
       |      ((cr + 1.0) * (nt + $buckets.0))) * 1000000.0) AS BIGINT) AS rm
       |  FROM cnt, tot),
       |sc AS (SELECT bl.doc_id, COUNT(*) AS n_bigrams, SUM(rm) AS s
       |  FROM bl JOIN r USING (b) GROUP BY bl.doc_id)
       |SELECT d.doc_id, d.lang, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       |  CAST(COALESCE(sc.s, 0) AS BIGINT) AS score_micro,
       |  COALESCE(sc.s, 0) > 0 AS keep
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Sliding-window token chunking (the context-window packer's overlap
    * variant): chunk i covers tokens [i·stride, i·stride + window).
    *
    * Scale shape / long-doc bound (round-6 advisor, enforced in code
    * since round 8): the explode carries each doc's full token array
    * into every chunk row before the `slice`, so a document of `len`
    * tokens materializes ~len/stride copies — O(len²/stride) bytes
    * through the explode. `maxDocTokens` pre-truncates every doc's token
    * array BEFORE the explode, hard-capping bytes-through-explode at
    * O(maxDocTokens²/stride) per doc no matter what the corpus contains;
    * a no-op at the fixture's web-page doc lengths (oracle mirrors the
    * cap). Inputs genuinely longer than the cap should be pre-split
    * upstream — truncation here is the blow-up guard, not a chunking
    * policy. The transform()-based alternative that avoids the copy is
    * the known-150×-slower HOF trap (CLAUDE.md), so the bounded explode
    * form is the right default. */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 64, stride: Int = 48,
                   maxDocTokens: Int = 1 << 20): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    require(maxDocTokens >= window, "need maxDocTokens >= window")
    val toks = slice(TextOps.tokens(col(textCol)), 1, maxDocTokens)
    val n = size(col("toks")).cast("long")
    val nChunks = lit(1L) + when(n > window,
      call_function("div", n - window + (stride - 1), lit(stride.toLong)))
      .otherwise(lit(0L))
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n_chunks", nChunks)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk",
        slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(window)))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).cast("long").as("chunk_len"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** DuckDB oracle for [[chunkSliding]]. `docsSql` must yield (doc_id, text). */
  def chunkSlidingOracle(docsSql: String, window: Int = 64,
                         stride: Int = 48,
                         maxDocTokens: Int = 1 << 20): String =
    s"""WITH toks AS (SELECT doc_id,
       |        regexp_extract_all(lower(text), '[a-z0-9]+')[1:$maxDocTokens] AS t
       |      FROM ($docsSql)),
       |n AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks
       |      WHERE len(t) > 0),
       |idx AS (SELECT doc_id, t,
       |        unnest(range(0, 1 + CASE WHEN n > $window
       |                                 THEN (n - $window + ${stride - 1}) // $stride
       |                                 ELSE 0 END)) AS chunk_idx
       |      FROM n),
       |c AS (SELECT doc_id, chunk_idx,
       |        t[(chunk_idx * $stride + 1):(chunk_idx * $stride + $window)] AS chunk
       |      FROM idx)
       |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(chunk, ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------- weighted subsampling

  /** Weighted sampling WITHOUT replacement via exponential keys
    * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    * reservoir"): keep the k items with the smallest `Exp(w)` draw
    * `e = -ln(u)/w` — exactly equivalent to drawing k items one by one
    * with probability ∝ weight. The corpus-subsampling standard because it
    * is embarrassingly parallel: the key is a per-row projection and the
    * selection is a global top-k (TakeOrderedAndProject — per-partition
    * k-heaps, no sort, no shuffle of non-winners).
    *
    * Determinism/parity: u = (h+1)/2^60 from the portable md5 hash of the
    * id (never 0); the one transcendental -ln(u) is rounded to integer
    * micro-units (the repo ln convention), then the /w is a truncating
    * integer division at 1e6 scale — priorities are exact BIGINTs, so the
    * DuckDB twin selects the identical sample.
    *
    * @param weight positive integer weight (rows with w <= 0 are excluded
    *               — zero-weight items have sampling probability 0) */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val eMicro = round(-log(u) * lit(1e6), 0).cast("long")
    docs.select(col(idCol), weight.cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("priority", call_function("div", eMicro * lit(1000000L), col("w")))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Per-GROUP weighted sampling without replacement: the same
    * Efraimidis–Spirakis exponential keys as [[weightedSample]], selected
    * per group through the native bounded top-k aggregate
    * (`graft.functions.TopKPairs`) instead of a global limit — ≤ k
    * (priority, id) pairs per group cross the exchange, no input sort, no
    * per-group window skew cliff. The stratified-subsampling counterpart
    * of the global sample (k docs from EVERY source, weight-proportional
    * within each).
    *
    * @return groupCol, rn (1-based within group), id, priority */
  def weightedSampleGrouped(docs: DataFrame, idCol: String, groupCol: String,
                            weight: Column, k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(1152921504606846976.0) // 2^60
    val eMicro = round(-log(u) * lit(1e6), 0).cast("long")
    val pr = docs.select(col(groupCol), col(idCol), weight.cast("long").as("w"),
        call_function("div", eMicro * lit(1000000L), weight.cast("long")).as("priority"))
      .filter(col("w") > 0)
    pr.groupBy(col(groupCol))
      .agg(graft.functions.TopKPairs.topK(col("priority"), col(idCol), k).as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col(groupCol), (col("i") + 1).cast("long").as("rn"),
        col("e.id").as(idCol), col("e.ord").as("priority"))
      .orderBy(groupCol, "rn")
  }

  /** DuckDB twin of [[weightedSampleGrouped]] over `documents` grouped by
    * source, weight = token count (oracle is the naive per-group window). */
  def weightedSampleGroupedOracle(k: Int): String =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
       |  FROM documents),
       |p AS (SELECT source, doc_id,
       |    CAST((CAST(round(-ln((h + 1) / 1152921504606846976.0) * 1000000.0)
       |          AS BIGINT) * 1000000) // w AS BIGINT) AS priority
       |  FROM t WHERE w > 0),
       |r AS (SELECT source, doc_id, priority,
       |    row_number() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rn
       |  FROM p)
       |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, priority
       |FROM r WHERE rn <= $k ORDER BY source, rn""".stripMargin

  /** DuckDB twin of [[weightedSample]] with weight = token count. */
  def weightedSampleOracle(k: Int): String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w,
       |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
       |  FROM documents),
       |p AS (SELECT doc_id, w,
       |    CAST((CAST(round(-ln((h + 1) / 1152921504606846976.0) * 1000000.0)
       |          AS BIGINT) * 1000000) // w AS BIGINT) AS priority
       |  FROM t WHERE w > 0)
       |SELECT doc_id, w, priority FROM p
       |ORDER BY priority, doc_id LIMIT $k""".stripMargin

  // --------------------------------------------- per-group quantile rank

  /** Per-group quantile normalization: map each row's integer score to its
    * within-group cumulative fraction `pct_micro = ⌊10⁶·|{score' ≤ s}|/n⌋`
    * (cume_dist in truncating micro-units) — the calibration step that
    * makes quality scores comparable ACROSS sources whose raw scales
    * differ (a FineWeb/DCLM mixing prerequisite).
    *
    * Scale shape: a naive `cume_dist().over(partitionBy(group))` window
    * sorts every row of a group in one task — a skew cliff when one source
    * is half the corpus. Instead: (1) partial-agg'd (group, score) bucket
    * counts — corpus-sized shuffle but combiner-compressed to the distinct
    * score values; (2) the running/total sums as windows over the BOUNDED
    * bucket table (partitions = distinct scores per group, thousands not
    * billions); (3) a broadcastable join back on (group, score). Same
    * output as the naive window, provably, at any skew. */
  def quantileNormalize(docs: DataFrame, idCol: String, groupCol: String,
                        score: Column): DataFrame = {
    val scored = docs.select(col(idCol), col(groupCol), score.cast("long").as("score"))
    val buckets = scored.groupBy(col(groupCol), col("score")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bCum = buckets
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wTot))
      .select(col(groupCol), col("score"), col("cum"), col("n"))
    scored.join(bCum, Seq(groupCol, "score"))
      .withColumn("pct_micro", call_function("div", col("cum") * lit(1000000L), col("n")))
      .select(col(idCol), col(groupCol), col("score"), col("pct_micro"))
      .orderBy(idCol)
  }

  /** Outlier-robust per-group statistics of an integer score — the
    * quality-filter calibration numbers that survive heavy-tailed score
    * distributions where mean/stddev are dragged by outliers:
    *   - `p50` — lower median (smallest score with 2·cum ≥ n);
    *   - `mad` — median absolute deviation |score − p50|, same rule;
    *   - `mean_micro` — plain mean in truncating micro-units;
    *   - `winsor_mean_micro` — mean after clipping to [p10, p90] (both
    *     lower-quantile by the same 10·cum ≥ n / 10·cum ≥ 9n rule).
    * Every statistic is integer-exact (order statistics by counting, means
    * as truncating BIGINT quotients), so the DuckDB twin matches
    * bit-for-bit.
    *
    * Scale shape: the [[quantileNormalize]] discipline twice — order
    * statistics come from cumulative sums over the BOUNDED (group, score)
    * bucket table (never a corpus-sized window partition); the deviation
    * pass re-buckets |score − p50| against the broadcastable per-group
    * quantile row; means are partial-agg'd sums. Three bounded shuffles
    * total, none carrying more than the bucket table. */
  def robustStats(docs: DataFrame, groupCol: String, score: Column,
                  widenKey: String = null): DataFrame = {
    // widen: the score expression is typically a token-regex kernel over
    // an unsplittable narrow scan (see Tables.widen). r14 advice suggested
    // a ROW-UNIQUE widen key (groupCol hashing leaves ~|groups| non-empty
    // partitions, capping the kernel at a handful of cores) — MEASURED and
    // REJECTED at sf0.1/32c: doc_id-keyed widen regressed q_robust_stats
    // 1.20→1.49 s and q_neyman_sample 1.18→1.81 s (stable across reps),
    // because all three downstream bucket passes inherit the staged
    // 32-partition layout (3× 32 near-empty tasks of scheduling) while the
    // score kernel was already adequately spread at |groups| partitions.
    // `widenKey` stays available for callers whose kernel dominates.
    val scored = graft.sources.Tables.widen(docs, Option(widenKey).getOrElse(groupCol))
      .select(col(groupCol), score.cast("long").as("score"))
    def buckets(df: DataFrame, c: String) =
      df.groupBy(col(groupCol), col(c)).agg(count(lit(1)).as("cnt"))
    def cums(b: DataFrame, c: String) = {
      val wCum = Window.partitionBy(col(groupCol)).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      b.withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wTot))
    }
    // lower quantile q/den: the SMALLEST score with den*cum >= q*n, i.e.
    // the first bucket crossing the rank — a min over qualifying buckets
    def quantile(cb: DataFrame, c: String, q: Int, den: Int, out: String) =
      cb.filter(col("cum") * den >= col("n") * q)
        .groupBy(col(groupCol)).agg(min(col(c)).as(out))
    // cb (bounded bucket table) feeds three quantile branches and qs
    // (groups x 3 quantiles) feeds both the deviation and the mean pass:
    // unstaged, every branch re-ran the corpus score pass — ~11 token-regex
    // scans for one call. Stage the two bounded tables.
    val cb = cums(buckets(scored, "score"), "score").staged()
    val qs = quantile(cb, "score", 1, 2, "p50")
      .join(quantile(cb, "score", 1, 10, "p10"), Seq(groupCol))
      .join(quantile(cb, "score", 9, 10, "p90"), Seq(groupCol))
      .staged()
    val withQ = scored.join(broadcast(qs), Seq(groupCol))
    val dev = withQ.select(col(groupCol), abs(col("score") - col("p50")).as("dev"))
    val mad = quantile(cums(buckets(dev, "dev"), "dev"), "dev", 1, 2, "mad")
    val means = withQ.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      call_function("div", sum(col("score")) * lit(1000000L), count(lit(1)))
        .as("mean_micro"),
      call_function("div",
        sum(greatest(col("p10"), least(col("p90"), col("score")))) * lit(1000000L),
        count(lit(1))).as("winsor_mean_micro"))
    qs.join(mad, Seq(groupCol)).join(means, Seq(groupCol))
      .select(col(groupCol), col("n"), col("p10"), col("p50"), col("p90"),
        col("mad"), col("mean_micro"), col("winsor_mean_micro"))
      .orderBy(groupCol)
  }

  /** Neyman-style stratified sampling: a fixed budget of rows allocated
    * across strata PROPORTIONALLY TO VARIABILITY (survey-sampling's
    * optimal allocation n_h ∝ N_h·σ_h), so a heterogeneous stratum gets
    * more of the budget than a uniform one of the same size — the
    * smarter cousin of q_stratified_split's fixed-rate buckets. The
    * dispersion term is the MAD (integer-exact, from the robustStats
    * counting machinery) rather than σ: same allocation intent, no
    * irrational sqrt to break the integer contract; weight_h =
    * N_h·(MAD_h+1) (the +1 keeps zero-dispersion strata sampleable).
    *
    * The allocation is exact largest-remainder (Hamilton) apportionment
    * in pure BIGINT arithmetic over the |strata|-row table: floor shares
    * B·w div W, then the B − Σfloor leftovers go to the largest
    * remainders (ties to the smaller stratum key). Shares are clamped at
    * the stratum size (the clamped slack is NOT redistributed — the
    * standard single-pass simplification, reported via n_h vs n_stratum).
    *
    * Selection is deterministic "random": the portable md5-derived long
    * orders each stratum, and the per-stratum cut runs through the
    * NATIVE bounded top-k aggregate (graft_topk, k = the whole budget —
    * a superset of any n_h ≤ B) so at most B (hash, id) pairs per
    * stratum cross the exchange and NO stratum-sized sort ever happens;
    * the variable per-stratum cutoff is a post-filter on the exploded
    * rank. Fully reproducible across partitionings and engines. */
  def neymanSample(docs: DataFrame, idCol: String, stratumCol: String,
                   score: Column, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val stats = robustStats(docs, stratumCol, score)
      .select(col(stratumCol), col("n"), (col("n") * (col("mad") + 1)).as("w"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("r").desc, col(stratumCol).asc)
    val alloc = stats
      .withColumn("w_tot", sum(col("w")).over(wAll))
      .withColumn("f", intDiv(col("w") * budget, col("w_tot")))
      .withColumn("r", col("w") * budget - col("f") * col("w_tot"))
      .withColumn("extra_rank", row_number().over(wRank))
      .withColumn("n_extra", lit(budget) - sum(col("f")).over(wAll))
      .withColumn("n_h",
        least(col("f") + when(col("extra_rank") <= col("n_extra"), 1L)
          .otherwise(0L), col("n")))
      .select(col(stratumCol), col("n").as("n_stratum"), col("n_h"))
    val pri = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val picked = docs.select(col(stratumCol), col(idCol))
      .groupBy(stratumCol)
      .agg(graft.functions.TopKPairs.topK(pri, col(idCol), budget).as("tk"))
    picked.select(col(stratumCol), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col(stratumCol), (col("i") + 1).cast("long").as("rn"),
        col("e.id").as(idCol))
      .join(broadcast(alloc), Seq(stratumCol))
      .filter(col("rn") <= col("n_h"))
      .select(col(stratumCol), col(idCol), col("rn"),
        col("n_h"), col("n_stratum"))
      .orderBy(col(stratumCol), col("rn"))
  }

  /** Exact rank-sum ROC-AUC of an integer score against a binary label —
    * the evaluation metric for the quality/lang classifiers, computed as
    * the Mann–Whitney U statistic with MIDRANK tie handling (AUC =
    * P(s⁺ > s⁻) + ½·P(s⁺ = s⁻)). All integer: midranks carry the ½ in
    * doubled units (2·midrank(s) = 2·cumBefore + c + 1), so
    * U2 = Σ_s cp(s)·(2·cumBefore + c + 1) − n⁺(n⁺+1) is an exact BIGINT
    * and auc_micro = U2·10⁶ div (2·n⁺·n⁻) a truncating quotient both
    * engines compute bit-for-bit.
    *
    * Scale shape: the [[quantileNormalize]] discipline — one partial-agg'd
    * (score → count, posCount) bucket shuffle, then the cumulative window
    * runs over the BOUNDED distinct-score table (bucket continuous scores
    * first), and one scalar aggregate. Never a corpus-sized rank window. */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val scored = df.select(score.cast("long").as("score"), label.cast("boolean").as("y"))
    val buckets = scored.groupBy("score").agg(
      count(lit(1)).as("c"), count(when(col("y"), 1)).as("cp"))
    val wCum = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = buckets.withColumn("cum_before", sum(col("c")).over(wCum) - col("c"))
    b.agg(
        sum(col("cp")).cast("long").as("n_pos"),
        (sum(col("c")) - sum(col("cp"))).cast("long").as("n_neg"),
        sum(col("cp") * (col("cum_before") * 2 + col("c") + 1)).cast("long").as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).as("u2"))
      .withColumn("auc_micro", call_function("div",
        col("u2") * lit(1000000L), col("n_pos") * col("n_neg") * lit(2L)))
  }

  /** DuckDB twin of [[robustStats]] over `documents` grouped by source,
    * score = token count. */
  def robustStatsOracle: String =
    """WITH s AS (SELECT source,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS score
      |  FROM documents),
      |b AS (SELECT source, score, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
      |cb AS (SELECT source, score,
      |    SUM(cnt) OVER (PARTITION BY source ORDER BY score
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER (PARTITION BY source) AS n
      |  FROM b),
      |q AS (SELECT source,
      |    MIN(CASE WHEN cum * 2 >= n THEN score END) AS p50,
      |    MIN(CASE WHEN cum * 10 >= n THEN score END) AS p10,
      |    MIN(CASE WHEN cum * 10 >= n * 9 THEN score END) AS p90
      |  FROM cb GROUP BY source),
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
      |mn AS (SELECT s.source, COUNT(*) AS n,
      |    CAST((SUM(s.score) * 1000000) // COUNT(*) AS BIGINT) AS mean_micro,
      |    CAST((SUM(GREATEST(q.p10, LEAST(q.p90, s.score))) * 1000000) // COUNT(*)
      |         AS BIGINT) AS winsor_mean_micro
      |  FROM s JOIN q ON s.source = q.source GROUP BY s.source)
      |SELECT q.source, mn.n, q.p10, q.p50, q.p90, m.mad,
      |  mn.mean_micro, mn.winsor_mean_micro
      |FROM q JOIN m ON m.source = q.source JOIN mn ON mn.source = q.source
      |ORDER BY q.source""".stripMargin

  /** DuckDB twin of [[quantileNormalize]] with score = token count. */
  def quantileNormalizeOracle: String =
    """WITH s AS (SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS score
      |  FROM documents),
      |b AS (SELECT source, score, COUNT(*) AS c FROM s GROUP BY 1, 2),
      |cb AS (SELECT source, score,
      |    SUM(c) OVER (PARTITION BY source ORDER BY score
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY source) AS n
      |  FROM b)
      |SELECT s.doc_id, s.source, s.score,
      |  CAST((cb.cum * 1000000) // cb.n AS BIGINT) AS pct_micro
      |FROM s JOIN cb ON s.source = cb.source AND s.score = cb.score
      |ORDER BY s.doc_id""".stripMargin

  /** A-priori frequent itemsets + association rules over the corpus —
    * baskets are documents, items are distinct tokens, support is the
    * document count. The classic distributed data-mining ladder (Agrawal
    * & Srikant 1994) done relationally:
    *
    *   L1 = items in ≥ 1/supDenom of docs  →  L2 = frequent pairs from
    *   L1-member co-occurrence  →  L3 candidates pruned by BOTH sub-pairs
    *   frequent (the a-priori downward-closure semi-joins), counted, and
    *   emitted as rules (a,b)→c with confidence = sup3/sup2 in truncating
    *   integer micro-units.
    *
    * Scale shape: the per-doc item table is pruned FIRST by the broadcast
    * L1 (Zipf: a high support floor keeps |L1| tiny — 30 items at 20%
    * across sf0.01/0.1 — so per-doc pair fan-out is ≤ |L1|²/2, not
    * vocab²); items then travel as DENSE INTEGER IDS (rank in L1's
    * alphabetical order, so id inequality ≡ item inequality) and each
    * candidate itemset packs into ONE bigint key (10 bits per id) — the
    * 20M-row triple enumeration hashes/combines longs, not string
    * triples, before the map-side partial agg collapses it to ≤ |L1|³/6
    * keys. The pair enumeration is a per-doc equi self-join; the
    * downward-closure prunes are broadcast semi-joins; every support
    * count is a partially-aggregable groupBy. The corpus total enters as
    * one broadcast row; ids map back to item strings via the 30-row
    * broadcast after thresholding. */
  def freqItemsets(docs: DataFrame, idCol: String, textCol: String,
                   supDenom: Int = 5): DataFrame = {
    val wdocs = graft.sources.Tables.widen(
      docs.select(col(idCol), col(textCol)), idCol) // tokenizer runs 6x
    val di = wdocs.select(col(idCol).as("d"),
      explode(TextOps.distinctTokens(col(textCol))).as("item"))
    // n_docs = docs contributing >= 1 item. Counting docs with a non-empty
    // token set is the SAME number as count_distinct(d) over the exploded
    // stream, without the explode + distinct shuffle that formulation pays
    // — this pass is a scan with a map-side aggregate. (The tokenization
    // itself still runs 3x — tot, l1, db — which is the scale-correct
    // trade: the exploded stream is corpus-sized, so caching it would be
    // wrong at 100 TB; re-scanning is embarrassingly parallel.)
    // tot / l1 / l2 are all BOUNDED tables (1 row; support-floor-bounded;
    // ≤ |L1|² rows) referenced from several plan branches — tot 3×, l1
    // 5×, l2 3× (two L3 semi-filters + the final confidence join). Spark
    // has no DAG-level subplan reuse, so before r14 every reference
    // re-inlined its whole upstream pipeline: the executed plan scanned
    // documents.parquet 19 TIMES and ran l2's pair SortMergeJoin THREE
    // times (plans/r14/q_freq_itemsets_before.txt). Staging the three
    // bounded tables (Materialize lineage cut — NOT a corpus-sized cache)
    // collapses that to one run each; the corpus-sized `db` stream stays
    // lazy and is still re-derived per join branch, the scale-correct
    // trade the comment above describes.
    val tot = wdocs.agg(count(when(
      size(TextOps.distinctTokens(col(textCol))) > 0, 1)).as("n_docs"))
      .staged()
    val l1 = di.groupBy("item").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(tot))
      .filter(col("df") * supDenom >= col("n_docs"))
      // |L1| rows: the unpartitioned rank window is bounded by the
      // support floor, never by vocab size. The 21-bit triple packing
      // below requires iid < 2^21; assert_true raises on the first id
      // past the bound instead of silently colliding triple keys.
      .withColumn("iid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("item")).cast("long"))
      .filter(isnull(assert_true(col("iid") < lit(1L << 21),
        lit("freqItemsets: |L1| exceeds 2^21, triple-key packing would collide"))))
      .select("item", "iid")
      .staged()
    val db = di.join(broadcast(l1), "item").select(col("d"), col("iid"))
    // r15 (guide §2.4 — remove shuffles outright): the pair and triple
    // enumerations used to be d-keyed SELF-JOINS of the exploded item
    // stream (a⋈b for L2, a⋈b⋈c for L3) — at sf0.1 that shuffled the
    // 116k-row db stream five times and sorted it for two SortMergeJoins,
    // to enumerate combinations that are a PER-DOC-LOCAL product. Collect
    // each doc's L1 items once into a SORTED iid array (bounded by |L1|,
    // the same |L1|²/2-per-doc fan-out bound the join had) and generate
    // pairs/triples MAP-SIDE from array slices (the adamicAdar wedge
    // idiom): ia<ib<ic holds by array order, the a-priori prunes stay
    // broadcast LEFT-SEMI joins (map-side), and the only exchanges left
    // are the two partially-aggregated support counts. The per-doc array
    // table is rebuilt per pass (L2, L3) — one groupBy(d) each — keeping
    // the corpus-sized stream LAZY (the r13 cache-vs-recompute lesson);
    // per-doc items are distinct by construction (distinctTokens), so
    // collect_list is a set.
    val arr = db.groupBy("d")
      .agg(sort_array(collect_list(col("iid"))).as("xs"))
      .select("xs")
    val pairs = arr
      .select(posexplode(col("xs")).as(Seq("i", "ia")), col("xs"))
      .select(col("ia"), explode(expr("slice(xs, i + 2, size(xs))")).as("ib"))
    val l2 = pairs
      .groupBy("ia", "ib").agg(count(lit(1)).cast("long").as("sup2"))
      .crossJoin(broadcast(tot))
      .filter(col("sup2") * supDenom >= col("n_docs"))
      .select("ia", "ib", "sup2")
      .staged()
    val l3 = arr
      .select(posexplode(col("xs")).as(Seq("i", "ia")), col("xs"))
      .select(col("i"), col("ia"), col("xs"),
        posexplode(expr("slice(xs, i + 2, size(xs))")).as(Seq("j", "ib")))
      .join(broadcast(l2.select("ia", "ib")), Seq("ia", "ib"), "left_semi")
      // ib sits at 0-based index i+1+j, so the strictly-after tail is the
      // 1-based slice from i+j+3
      .select(col("ia"), col("ib"),
        explode(expr("slice(xs, i + j + 3, size(xs))")).as("ic"))
      .join(broadcast(l2.select(col("ia").as("ib"), col("ib").as("ic"))),
        Seq("ib", "ic"), "left_semi")
      // 21-bit-per-slot packing: with iid < 2^21 (asserted at L1), the
      // max key is (2^42 - 1)·2^21 + 2^21 - 1 = 2^63 - 1 — exactly Long.
      .groupBy(((col("ia") * (1L << 21) + col("ib")) * (1L << 21) + col("ic")).as("tkey"))
      .agg(count(lit(1)).cast("long").as("sup3"))
      .crossJoin(broadcast(tot))
      .filter(col("sup3") * supDenom >= col("n_docs"))
      .select(call_function("div", col("tkey"), lit(1L << 42)).as("ia"),
        (call_function("div", col("tkey"), lit(1L << 21)) % (1L << 21)).as("ib"),
        (col("tkey") % (1L << 21)).as("ic"), col("sup3"))
    l3.join(broadcast(l2), Seq("ia", "ib"))
      .join(broadcast(l1.select(col("iid").as("ia"), col("item").as("item_a"))), Seq("ia"))
      .join(broadcast(l1.select(col("iid").as("ib"), col("item").as("item_b"))), Seq("ib"))
      .join(broadcast(l1.select(col("iid").as("ic"), col("item").as("item_c"))), Seq("ic"))
      .select(col("item_a").as("ia"), col("item_b").as("ib"),
        col("item_c").as("ic"), col("sup3"), col("sup2"),
        call_function("div", col("sup3") * 1000000L, col("sup2")).as("conf_micro"))
      // top-k by support (TakeOrderedAndProject; ties resolved by the
      // item triple, a unique key). On a corpus whose frequent tier is a
      // universal head — this fixture — the threshold alone stops
      // pruning at L3, and the ranked report is what stays informative.
      .orderBy(col("sup3").desc, col("ia"), col("ib"), col("ic"))
      .limit(50)
  }

  /** DuckDB twin of [[freqItemsets]]. */
  def freqItemsetsOracle(supDenom: Int): String =
    s"""WITH di AS (SELECT DISTINCT doc_id AS d,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item
       |  FROM documents),
       |tot AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs FROM di),
       |l1 AS (SELECT item FROM (SELECT item, COUNT(*) AS df FROM di GROUP BY 1), tot
       |       WHERE df * $supDenom >= n_docs),
       |db AS (SELECT d, item FROM di JOIN l1 USING (item)),
       |l2 AS (SELECT ia, ib, sup2 FROM (
       |    SELECT a.item AS ia, b.item AS ib, CAST(COUNT(*) AS BIGINT) AS sup2
       |    FROM db a JOIN db b ON a.d = b.d AND a.item < b.item
       |    GROUP BY 1, 2), tot
       |  WHERE sup2 * $supDenom >= n_docs),
       |l3 AS (SELECT ia, ib, ic, sup3 FROM (
       |    SELECT a.item AS ia, b.item AS ib, c.item AS ic,
       |      CAST(COUNT(*) AS BIGINT) AS sup3
       |    FROM db a JOIN db b ON a.d = b.d AND a.item < b.item
       |      JOIN db c ON b.d = c.d AND b.item < c.item
       |    WHERE EXISTS (SELECT 1 FROM l2 WHERE l2.ia = a.item AND l2.ib = b.item)
       |      AND EXISTS (SELECT 1 FROM l2 WHERE l2.ia = b.item AND l2.ib = c.item)
       |    GROUP BY 1, 2, 3), tot
       |  WHERE sup3 * $supDenom >= n_docs)
       |SELECT ia, ib, ic, sup3, sup2,
       |  CAST((sup3 * 1000000) // sup2 AS BIGINT) AS conf_micro
       |FROM l3 JOIN l2 USING (ia, ib)
       |ORDER BY sup3 DESC, ia, ib, ic LIMIT 50""".stripMargin

  // ----------------------------------- unigram-LM (Viterbi) segmentation

  /** Unigram-language-model word segmentation — the SentencePiece-family
    * tokenizer lineage next to the BPE tier (Kudo 2018): fit a scored
    * piece vocabulary on the corpus, then segment every DISTINCT word by
    * Viterbi minimum total surprisal.
    *
    * Fit (all relational, exact integers):
    *   - piece inventory = every substring of length 1..`maxPieceLen` of
    *     every word type, occurrence-counted weighted by token frequency
    *     (`c(p) = Σ_w tf(w) · occ(p, w)`);
    *   - surprisal = `round(round(−log2(c/total), 6) · 1e6)` micro-bits —
    *     the q_lm_perplexity determinism contract;
    *   - vocabulary = ALL single characters (full coverage by
    *     construction — the Viterbi UNK fallback is unreachable) plus the
    *     top-`topV` multi-character pieces by `(count DESC, piece ASC)`.
    *
    * Segmentation is the native [[graft.functions.ViterbiSeg]] DP over the
    * distinct-word table (never per token); ties prefer the longer last
    * piece, mirrored by the oracle's `ORDER BY score ASC, j DESC` pick.
    *
    * Scale shape: the piece inventory explodes the Zipf-bounded TYPES
    * table (and is structurally ≤ Σ_k |charset|^k rows — the global
    * top-`topV` rank windows over that bounded table, like the IVF
    * centroid fit); the vocabulary (≤ charset + topV rows) is collected
    * to the driver and ships as expression literals, the bounded-collect
    * discipline of `Similarity.ivfTopK`. The corpus-sized work — token
    * explode and the final map-only segmentation — carries no window and
    * no join wider than the types table. */
  def unigramSegment(docs: DataFrame, textCol: String,
                     maxPieceLen: Int = 4, topV: Int = 200): DataFrame = {
    val (types, vocab) = unigramFit(docs, textCol, maxPieceLen, topV)
    types.select(col("w").as("word"), col("tf"),
        graft.functions.ViterbiSeg.of(col("w"), vocab, maxPieceLen).as("seg"))
      .withColumn("n_pieces", size(split(col("seg"), "\\|")).cast("long"))
      .select("word", "tf", "n_pieces", "seg")
  }

  /** The shared fit: the STAGED TYPES table (`w`, `tf`) and the scored
    * piece vocabulary collected under the bounded discipline above. The
    * types table is staged (`Materialize.stage` — eager lineage cut, not
    * a `persist`) so the two corpus consumers (fit + segmentation, or the
    * EM round's E/M steps) tokenize the corpus ONCE, while the blocks are
    * reclaimed by the ContextCleaner once the returned plan is dropped —
    * the r11 advice found the old `persist()` leaked one CacheManager
    * entry per invocation for the session's lifetime (a cache returned to
    * a caller has no release point; a staged RDD releases itself). */
  private def unigramFit(docs: DataFrame, textCol: String, maxPieceLen: Int,
                         topV: Int): (DataFrame, Seq[(String, Long)]) = {
    val types = docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("tf"))
      .staged()
    val pieces = types
      .select(col("w"), col("tf"),
        explode(sequence(lit(1), length(col("w")))).as("s"))
      .select(col("w"), col("tf"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") - 1 <= length(col("w")))
      .select(call_function("substring", col("w"), col("s"), col("l")).as("piece"),
        col("tf"))
    val counts = pieces.groupBy("piece").agg(sum(col("tf")).cast("long").as("c"))
    val total = counts.agg(sum(col("c")).cast("long").as("total"))
    val scored = counts.crossJoin(broadcast(total))
      .withColumn("s", round(round(-log2(
          col("c").cast("double") / col("total").cast("double")), 6) * 1000000d)
        .cast("long"))
    val singles = scored.filter(length(col("piece")) === 1).select("piece", "s")
    val multi = scored.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("piece").asc)))
      .filter(col("rk") <= topV).select("piece", "s")
    // bounded collect: ≤ charset + topV rows (see scaladoc)
    val vocab = singles.union(multi).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    (types, vocab)
  }

  /** One EM-and-prune round on top of [[unigramSegment]] — the LEARN side
    * of the unigram-LM tokenizer (SentencePiece's training loop): the
    * round-1 Viterbi segmentation is the E-step; the M-step re-scores
    * pieces from their USAGE counts with add-one smoothing AND PRUNES the
    * multi-character vocabulary to the top `keepV` by usage (single
    * characters always survive, so coverage — and the oracle's DP
    * reachability — is preserved). Words whose pieces were pruned MUST
    * re-segment, so `changed` (the convergence signal a real training
    * loop iterates on) is live by construction; pure re-scoring without
    * pruning is a fixed point of round 1 on this corpus — rich-get-richer
    * reinforces the E-step's own choices.
    *
    * Determinism: the re-scores are computed IN SPARK's `log2` expression
    * over the usage counts (the q_lm_perplexity micro-bit contract — a
    * driver-side `Math.log` quotient is NOT bit-guaranteed against
    * DuckDB's log2), then collected under the same bounded-vocab
    * discipline as round 1. */
  def unigramSegmentEm(docs: DataFrame, textCol: String,
                       maxPieceLen: Int = 4, topV: Int = 200,
                       keepV: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val (types, vocab1kv) = unigramFit(docs, textCol, maxPieceLen, topV)
    val vocab1 = vocab1kv.map(_._1)
    val seg1 = types.select(col("w").as("word"), col("tf"),
      graft.functions.ViterbiSeg.of(col("w"), vocab1kv, maxPieceLen).as("seg"))
    val nv = vocab1.size
    // E-step usage: tf-weighted piece occurrences in the round-1 segs
    val usage = seg1.select(col("tf"),
        explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum(col("tf")).cast("long").as("c2"))
    val tot2 = usage.agg(sum(col("c2")).cast("long").as("total2"))
    // M-step: add-one re-score over usage, multi pieces pruned to the
    // top keepV by (usage DESC, piece ASC); singles always survive
    val v1df = spark.createDataFrame(vocab1.map(Tuple1(_))).toDF("piece")
    val rescored = v1df.join(usage, Seq("piece"), "left")
      .na.fill(0L, Seq("c2"))
      .crossJoin(broadcast(tot2))
      .withColumn("s", round(round(-log2(
          (col("c2") + 1).cast("double") / (col("total2") + nv).cast("double")),
          6) * 1000000d).cast("long"))
    val singles2 = rescored.filter(length(col("piece")) === 1)
      .select("piece", "s")
    val multi2 = rescored.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c2").desc, col("piece").asc)))
      .filter(col("rk") <= keepV).select("piece", "s")
    val vocab2 = singles2.union(multi2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    seg1.select(col("word"), col("tf"), col("seg").as("seg1"))
      .withColumn("seg",
        graft.functions.ViterbiSeg.of(col("word"), vocab2, maxPieceLen))
      .select(col("word"), col("tf"),
        size(split(col("seg"), "\\|")).cast("long").as("n_pieces"),
        col("seg"),
        (col("seg") =!= col("seg1")).as("changed"))
  }

  /** DuckDB twin of [[unigramSegment]]: identical fit, then the DP
    * unrolled over prefix lengths 1..`maxLen` as chained CTEs (the
    * kmeans-unrolled-oracle discipline), each step picking its best
    * predecessor with `row_number() OVER (PARTITION BY w ORDER BY score
    * ASC, j DESC)`. A word longer than `maxLen` fails LOUDLY via
    * `error()` (DuckDB `//`-by-zero is NULL, not an error — FIXTURES). */
  /** One unrolled Viterbi DP chain: CTEs `$p0..$p$maxLen` joining vocab
    * CTE `$vocabCte`, plus the per-length finals union. MATERIALIZED —
    * DuckDB inlines plain CTEs per reference, so a chain whose step reads
    * up to `maxPieceLen` predecessors expands exponentially ("too many
    * open files" at plan build, see FIXTURES). */
  private def viterbiDpSql(p: String, vocabCte: String, maxPieceLen: Int,
                           maxLen: Int): (String, String) = {
    val dps = (1 to maxLen).map { i =>
      val cands = (1 to math.min(maxPieceLen, i)).map { j =>
        s"""      SELECT d.w, d.len, d.score + v.s AS score,
           |        d.seg || '|' || v.piece AS seg, $j AS j
           |      FROM $p${i - j} d JOIN $vocabCte v
           |        ON v.piece = substr(d.w, ${i - j + 1}, $j)
           |      WHERE d.len >= $i""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""$p$i AS MATERIALIZED (
         |  SELECT w, len, score, seg FROM (
         |    SELECT w, len, score, seg,
         |      row_number() OVER (PARTITION BY w ORDER BY score ASC, j DESC) AS rn
         |    FROM (
         |$cands)
         |  ) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to maxLen)
      .map(i => s"SELECT w, seg FROM $p$i WHERE len = $i")
      .mkString("\n  UNION ALL\n  ")
    (dps, finals)
  }

  def unigramSegmentOracle(maxPieceLen: Int = 4, topV: Int = 200,
                           maxLen: Int = 12): String = {
    val (dps, finals) = viterbiDpSql("dp", "vocab", maxPieceLen, maxLen)
    s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |            FROM documents),
       |ty AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS tf
       |                    FROM tok GROUP BY 1),
       |g AS (SELECT CASE WHEN max(len(w)) > $maxLen
       |        THEN error('unigram_segment oracle: word exceeds unrolled DP depth')
       |        ELSE 0 END AS ok FROM ty),
       |pc AS (SELECT substr(ty.w, s, l) AS piece, CAST(SUM(tf) AS BIGINT) AS c
       |       FROM ty, unnest(range(1, len(w) + 1)) AS t(s),
       |            unnest(range(1, ${maxPieceLen + 1})) AS u(l)
       |       WHERE s + l - 1 <= len(w) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM pc),
       |sc AS (SELECT piece, len(piece) AS pl, c,
       |         CAST(ROUND(ROUND(-log2(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 6)
       |           * 1000000) AS BIGINT) AS s
       |       FROM pc CROSS JOIN tot),
       |vocab AS MATERIALIZED (
       |  SELECT piece, s FROM sc WHERE pl = 1
       |  UNION ALL
       |  SELECT piece, s FROM (
       |    SELECT piece, s, row_number() OVER (ORDER BY c DESC, piece) AS rk
       |    FROM sc WHERE pl > 1) WHERE rk <= $topV),
       |dp0 AS (SELECT w, len(w) AS len, CAST(0 AS BIGINT) AS score, '' AS seg
       |        FROM ty),
       |$dps
       |SELECT ty.w AS word, ty.tf,
       |  CAST(len(f.seg) - len(replace(f.seg, '|', '')) AS BIGINT) AS n_pieces,
       |  substr(f.seg, 2) AS seg
       |FROM ty JOIN ($finals) f ON ty.w = f.w CROSS JOIN g
       |WHERE g.ok = 0
       |ORDER BY word""".stripMargin
  }

  /** DuckDB twin of [[unigramSegmentEm]]: the round-1 fit + DP chain,
    * then usage counts from the round-1 segmentations, the add-one
    * re-score of the SAME vocabulary, and a SECOND unrolled DP chain
    * against it. */
  def unigramSegmentEmOracle(maxPieceLen: Int = 4, topV: Int = 200,
                             maxLen: Int = 12, keepV: Int = 16): String = {
    val (dpsA, finalsA) = viterbiDpSql("dp", "vocab", maxPieceLen, maxLen)
    val (dpsB, finalsB) = viterbiDpSql("em", "vocab2", maxPieceLen, maxLen)
    s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |            FROM documents),
       |ty AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS tf
       |                    FROM tok GROUP BY 1),
       |g AS (SELECT CASE WHEN max(len(w)) > $maxLen
       |        THEN error('unigram_em oracle: word exceeds unrolled DP depth')
       |        ELSE 0 END AS ok FROM ty),
       |pc AS (SELECT substr(ty.w, s, l) AS piece, CAST(SUM(tf) AS BIGINT) AS c
       |       FROM ty, unnest(range(1, len(w) + 1)) AS t(s),
       |            unnest(range(1, ${maxPieceLen + 1})) AS u(l)
       |       WHERE s + l - 1 <= len(w) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM pc),
       |sc AS (SELECT piece, len(piece) AS pl, c,
       |         CAST(ROUND(ROUND(-log2(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 6)
       |           * 1000000) AS BIGINT) AS s
       |       FROM pc CROSS JOIN tot),
       |vocab AS MATERIALIZED (
       |  SELECT piece, s FROM sc WHERE pl = 1
       |  UNION ALL
       |  SELECT piece, s FROM (
       |    SELECT piece, s, row_number() OVER (ORDER BY c DESC, piece) AS rk
       |    FROM sc WHERE pl > 1) WHERE rk <= $topV),
       |dp0 AS (SELECT w, len(w) AS len, CAST(0 AS BIGINT) AS score, '' AS seg
       |        FROM ty),
       |$dpsA,
       |sega AS MATERIALIZED (
       |  SELECT w, substr(seg, 2) AS seg FROM ($finalsA)),
       |u AS MATERIALIZED (
       |  SELECT p.piece, CAST(SUM(ty.tf) AS BIGINT) AS c2
       |  FROM sega a JOIN ty USING (w),
       |       unnest(string_split(a.seg, '|')) AS p(piece)
       |  GROUP BY 1),
       |t2 AS (SELECT CAST(SUM(c2) AS BIGINT) AS total2 FROM u),
       |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vocab),
       |resc AS (
       |  SELECT v.piece, len(v.piece) AS pl, COALESCE(u.c2, 0) AS c2,
       |    CAST(ROUND(ROUND(-log2(
       |      CAST(COALESCE(u.c2, 0) + 1 AS DOUBLE) /
       |      CAST(t2.total2 + nv.n AS DOUBLE)), 6) * 1000000) AS BIGINT) AS s
       |  FROM vocab v LEFT JOIN u ON u.piece = v.piece
       |  CROSS JOIN t2 CROSS JOIN nv),
       |vocab2 AS MATERIALIZED (
       |  SELECT piece, s FROM resc WHERE pl = 1
       |  UNION ALL
       |  SELECT piece, s FROM (
       |    SELECT piece, s, row_number() OVER (ORDER BY c2 DESC, piece) AS rk
       |    FROM resc WHERE pl > 1) WHERE rk <= $keepV),
       |em0 AS (SELECT w, len(w) AS len, CAST(0 AS BIGINT) AS score, '' AS seg
       |        FROM ty),
       |$dpsB
       |SELECT ty.w AS word, ty.tf,
       |  CAST(len(b.seg) - len(replace(b.seg, '|', '')) AS BIGINT) AS n_pieces,
       |  substr(b.seg, 2) AS seg,
       |  substr(b.seg, 2) <> a.seg AS changed
       |FROM ty JOIN sega a USING (w) JOIN ($finalsB) b ON ty.w = b.w
       |CROSS JOIN g WHERE g.ok = 0
       |ORDER BY word""".stripMargin
  }
}
