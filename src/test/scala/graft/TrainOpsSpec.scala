package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TrainOps
import graft.sources.Tables

/** Sequence packing, fixed-point PageRank, and the BM25 scoring column. */
class TrainOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------- packing

  test("packConcatChunk matches the naive single-window prefix sum") {
    // ids deliberately sparse/unordered on input; token counts force several
    // shard boundaries at shardSize=4 and window straddles at window=10
    val docs = Seq(3L -> 7L, 1L -> 4L, 10L -> 9L, 7L -> 3L, 12L -> 12L,
      5L -> 1L, 8L -> 5L, 20L -> 2L, 15L -> 8L, 2L -> 6L)
      .toDF("doc_id", "n_tok")
    val packed = TrainOps.packConcatChunk(docs, "doc_id", "n_tok",
      window = 10L, shardSize = 4L)
    val naive = docs
      .withColumn("tok_offset", coalesce(sum("n_tok").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"), col("tok_offset"),
        expr("tok_offset div 10").as("first_win"),
        expr("(tok_offset + n_tok - 1) div 10").as("last_win"))
      .withColumn("n_wins", col("last_win") - col("first_win") + 1L)
    assert(packed.orderBy("doc_id").collect().toSeq ===
      naive.orderBy("doc_id").collect().toSeq)
  }

  test("packConcatChunk window spans: a doc straddling a boundary counts both windows") {
    val docs = Seq(1L -> 6L, 2L -> 8L, 3L -> 2L).toDF("doc_id", "n_tok")
    val out = TrainOps.packConcatChunk(docs, "doc_id", "n_tok", window = 10L)
      .orderBy("doc_id")
      .select("doc_id", "tok_offset", "first_win", "last_win", "n_wins")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc 2 occupies offsets [6, 14) → windows 0 and 1
    assert(out.toSeq === Seq((1L, 0L, 0L, 0L, 1L), (2L, 6L, 0L, 1L, 2L),
      (3L, 14L, 1L, 1L, 1L)))
  }

  test("packConcatChunk drops zero-token docs and keeps offsets contiguous") {
    val docs = Seq(1L -> 5L, 2L -> 0L, 3L -> 5L).toDF("doc_id", "n_tok")
    val out = TrainOps.packConcatChunk(docs, "doc_id", "n_tok", window = 100L)
      .orderBy("doc_id").select("doc_id", "tok_offset")
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 0L), (3L, 5L)))
  }

  // ------------------------------------------------------------ PageRank

  private val S = 1000000000000L

  test("pageRank conserves mass up to deterministic truncation") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
      .toDF("src", "dst")
    val pr = TrainOps.pageRank(edges, iters = 5)
    val total = pr.agg(sum("pr_micro")).head.getLong(0)
    // each of the <=10 sym edges truncates <1 micro-unit per round, the
    // damping step <1 more per node per round
    assert(total <= S && total > S - 5 * (10 + 4 + 2))
  }

  test("pageRank ranks a star hub above its leaves, leaves tie exactly") {
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val ranks = TrainOps.pageRank(edges, iters = 5)
      .select("id", "pr_micro").as[(String, Long)].collect().toMap
    assert(ranks("h") > ranks("l1"))
    assert(ranks("l1") === ranks("l2") && ranks("l2") === ranks("l3"))
  }

  test("pageRank on a 2-cycle is the uniform fixpoint (exact)") {
    // both nodes have outdeg 1 and feed each other: rank stays S/2 except
    // for the deterministic damping truncation: 15% teleport + 85% of S/2
    val edges = Seq(("x", "y")).toDF("src", "dst")
    val ranks = TrainOps.pageRank(edges, iters = 3)
      .select("id", "pr_micro").as[(String, Long)].collect().toMap
    // closed form per round: r' = tele + (85*r) div 100 with r0 = S/2
    var r = S / 2
    val tele = (S * 15L / 100L) / 2
    for (_ <- 1 to 3) r = tele + (85L * r) / 100L
    assert(ranks("x") === r && ranks("y") === r)
  }

  // ---------------------------------------------------------------- BM25

  test("bm25TermMicro rises with tf and falls with df") {
    val row = Seq(1).toDF("i")
    // n_docs=100, dl=50, sum_dl=5000 (avgdl=50 → length norm is neutral)
    def score(tf: Long, df: Long): Long = row.select(
      TrainOps.bm25TermMicro(lit(tf), lit(df), lit(100L), lit(50L), lit(5000L))
        .as("s")).head.getLong(0)
    assert(score(3, 10) > score(1, 10))
    assert(score(2, 5) > score(2, 50))
    assert(score(0, 10) === 0L)
  }

  test("bm25TermMicro matches the textbook double formula within 2 micro") {
    val row = Seq(1).toDF("i")
    def micro(tf: Long, df: Long, n: Long, dl: Long, sumDl: Long): Long =
      row.select(TrainOps.bm25TermMicro(lit(tf), lit(df), lit(n), lit(dl),
        lit(sumDl)).as("s")).head.getLong(0)
    for ((tf, df, n, dl, sumDl) <- Seq(
        (3L, 10L, 100L, 50L, 5000L), (1L, 2L, 500L, 17L, 91234L),
        (7L, 499L, 500L, 300L, 91234L))) {
      val avgdl = sumDl.toDouble / n
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val exact = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      // final truncating div ≤1 micro; idf rounding and the truncated
      // denominator micro each shift the score by O(score · 1e-6)
      assert(math.abs(micro(tf, df, n, dl, sumDl) - exact * 1e6) <= 2 +
        2e-6 * math.abs(exact) * 1e6)
    }
  }

  // ---------------------------------------------------------- BPE merges

  test("bpeMerges learns the hand-computed merge sequence, LTR alternation included") {
    // doc1 "x x x x ..." exercises the self-pair run: candidates at
    // positions 0,1,2 must merge ALTERNATELY (0 and 2) -> "xx xx", exactly
    // greedy left-to-right
    val docs = Seq((1L, "x x x x y z y z"), (2L, "x x y z")).toDF("doc_id", "text")
    val got = TrainOps.bpeMerges(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "x", "x", 4L),   // 3 overlapping in doc1 + 1 in doc2
      (2L, "y", "z", 3L),   // after xx-merge: (y,z) x2 in doc1 + 1 in doc2
      (3L, "xx", "yz", 2L)))
  }

  test("bpeMerges ties break lexicographically and results survive repartition") {
    val tie = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
    val m = TrainOps.bpeMerges(tie, "doc_id", "text", rounds = 1).collect().head
    assert((m.getString(1), m.getString(2)) === ("a", "b")) // (a,b) < (b,a)
    val docs = Tables.documents(spark, sf0001)
    val r1 = TrainOps.bpeMerges(docs, "doc_id", "text", rounds = 4).collect().toSeq
    val r2 = TrainOps.bpeMerges(docs.repartition(7), "doc_id", "text", rounds = 4)
      .collect().toSeq
    assert(r1 === r2)
    assert(r1.length === 4)
  }

  // --------------------------------------------------------- BPE encoding

  test("bpeEncode applies merges in rank order with greedy-LTR runs") {
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "a")
    val words = Seq("the", "thing", "threethe", "aaaa", "aaa", "bath")
      .toDF("w")
    val got = words
      .select(col("w"), TrainOps.bpeEncode(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("the") === List("the"))                    // t+h then th+e
    assert(got("thing") === List("th", "ing"))            // i+n before in+g
    assert(got("threethe") === List("th", "r", "e", "e", "the"))
    assert(got("aaaa") === List("aa", "aa"))              // self-pair run: leftmost-first
    assert(got("aaa") === List("aa", "a"))                // odd run leaves the tail
    assert(got("bath") === List("b", "a", "th"))          // mid-word merge only at symbol boundary
  }

  test("bpeEncode merged symbols never re-split and unknown chars pass through") {
    val merges = Seq("a" -> "b", "ab" -> "c")
    val words = Seq("abc", "cab", "xyz").toDF("w")
    val got = words
      .select(col("w"), TrainOps.bpeEncode(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("abc") === List("abc"))     // a+b -> ab, then ab+c -> abc
    assert(got("cab") === List("c", "ab")) // pattern matches only the (a,b) pair
    assert(got("xyz") === List("x", "y", "z"))
  }

  test("dsir: target-slice docs score higher on average than off-target docs") {
    val docs = sources.Tables.documents(spark, sf0001)
    val out = TrainOps.dsirWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en").collect()
    assert(out.length === docs.count())
    def mean(lang: String): Double = {
      val xs = out.filter(_.getAs[String]("lang") == lang)
        .map(_.getAs[Long]("score_micro").toDouble)
      xs.sum / xs.length
    }
    // the estimator must rank the target language above every other slice
    Seq("de", "fr", "es", "zh").foreach { l =>
      assert(mean("en") > mean(l), s"en mean not above $l mean")
    }
    // bigram counts: docs with >= 2 tokens carry len-1 bigrams
    val probe = out.find(_.getAs[Long]("n_bigrams") > 0).get
    assert(probe.getAs[Long]("n_bigrams") > 0)
  }

  test("dsir weights are partitioning-invariant") {
    val docs = sources.Tables.documents(spark, sf0001)
    val a = TrainOps.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(_.toString).toSeq
    val b = TrainOps.dsirWeights(docs.repartition(13), "doc_id", "text",
      col("lang") === "en").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("weightedSample: deterministic, weight-monotone in expectation, zero-weight excluded") {
    val docs = Tables.documents(spark, sf0001)
    val w = size(graft.ops.TextOps.tokens(col("text")))
    val s1 = TrainOps.weightedSample(docs, "doc_id", w, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s2 = TrainOps.weightedSample(docs.repartition(9), "doc_id", w, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq === s2.toSeq && s1.length === 10)
    assert(s1.forall(_._3 >= 0))
    // k >= corpus returns every positive-weight doc; zero weights never appear
    val zero = Seq((1L, "alpha beta"), (2L, "")).toDF("doc_id", "text")
    val all = TrainOps.weightedSample(zero, "doc_id",
      size(graft.ops.TextOps.tokens(col("text"))), 10).collect()
    assert(all.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("robustStats matches a naive in-memory computation per group") {
    val docs = Tables.documents(spark, sf0001)
    val score = size(graft.ops.TextOps.tokens(col("text")))
    val got = TrainOps.robustStats(docs, "source", score)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7))).toMap
    val raw = docs.select(col("source"), score.cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toVector).toMap
    raw.foreach { case (src, v) =>
      def lowerQ(xs: Vector[Long], q: Int, den: Int): Long =
        xs(math.max(0, (v.size * q + den - 1) / den - 1)) // smallest with den*rank >= q*n
      val p50 = lowerQ(v, 1, 2); val p10 = lowerQ(v, 1, 10); val p90 = lowerQ(v, 9, 10)
      val mad = lowerQ(v.map(x => math.abs(x - p50)).sorted, 1, 2)
      val mean = v.sum * 1000000L / v.size
      val wins = v.map(x => math.max(p10, math.min(p90, x))).sum * 1000000L / v.size
      assert(got(src) === ((v.size.toLong, p10, p50, p90, mad, mean, wins)), s"group $src")
    }
  }

  test("quantileNormalize equals the naive cume_dist window") {
    val docs = Tables.documents(spark, sf0001)
    val score = size(graft.ops.TextOps.tokens(col("text")))
    val got = TrainOps.quantileNormalize(docs, "doc_id", "source", score)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val naive = docs.select(col("doc_id"), col("source"), score.cast("long").as("sc"))
      .withColumn("cd", cume_dist().over(
        Window.partitionBy("source").orderBy("sc")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // pct_micro/1e6 must equal cume_dist exactly at bucket boundaries
    // (both are |{<= s}| / n); compare after scaling to micro truncation
    naive.foreach { case (id, cd) =>
      assert(math.abs(got(id) - math.floor(cd * 1e6)) <= 1,
        s"doc $id: got ${got(id)} vs cume_dist ${cd}")
    }
  }

  test("rocAuc: separation extremes, all-ties 0.5, and naive-pairwise equality") {
    def auc(rows: Seq[(Long, Boolean)]): Long =
      TrainOps.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head.getAs[Long]("auc_micro")
    // perfect separation -> 1.0; reversed -> 0.0; all tied -> 0.5
    assert(auc(Seq((10L, true), (11L, true), (1L, false), (2L, false))) === 1000000L)
    assert(auc(Seq((1L, true), (2L, true), (10L, false), (11L, false))) === 0L)
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false))) === 500000L)
    // naive pairwise P(s+ > s-) + 0.5 P(=) on a tie-heavy sample
    val rows = (0 until 60).map(i => ((i * 7 % 10).toLong, i % 3 == 0))
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield (if (p > n) 2L else if (p == n) 1L else 0L)).sum
    val want = u2 * 1000000L / (2L * pos.size * neg.size)
    assert(auc(rows) === want)
  }
}
