package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{CleanOps, EventOps, Graph, TrainOps}
import graft.sources.Tables

/** Unit coverage for the round-7 second-wave operators: BFS levels,
  * CUSUM drift, a-priori itemsets, Kneser–Ney scoring, Neyman sampling.
  * Each test checks the DISTRIBUTED implementation against a tiny
  * driver-side reference computation (the oracle queries cover the
  * fixture-scale behavior; these pin the semantics). */
class Round7OpsSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------- BFS

  test("bfsLevels assigns shortest-hop levels from the seed set") {
    // component {1,2,3,4,10} with seed 10 (10 % 5 == 0); component {5,6}
    // with seed 5; component {7,8} unseeded -> absent entirely
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 10L), (5L, 6L), (7L, 8L))
      .toDF("id_a", "id_b")
    val got = Graph.bfsLevels(edges, seedMod = 5L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 5L -> 0L, 4L -> 1L, 6L -> 1L,
      3L -> 2L, 2L -> 3L, 1L -> 4L))
  }

  test("bfsLevels round budget truncates the frontier, never mislevels") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 10L)).toDF("id_a", "id_b")
    val got = Graph.bfsLevels(edges, seedMod = 5L, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 4L -> 1L, 3L -> 2L)) // 2 and 1 out of radius
  }

  test("kCore peels tails and keeps the cycle with in-core degrees") {
    // triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val got = Graph.kCore(edges, k = 2, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
  }

  test("kCore flags an insufficient round budget instead of lying") {
    // a 6-path needs 3 peels to empty under k=2; one round leaves
    // degree-1 endpoints -> converged must be false
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = Graph.kCore(edges, k = 2, rounds = 1).collect()
    assert(got.nonEmpty && got.forall(!_.getBoolean(2)))
  }

  test("kCore at k=3 keeps a K4 intact") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = Graph.kCore(edges, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 3L, true), (2L, 3L, true), (3L, 3L, true), (4L, 3L, true)))
  }

  // ------------------------------------------------ truncation recall

  test("truncationRecall is 1.0 when truncation keeps the full vector") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = graft.ops.Similarity.truncationRecall(emb, nQueries = 3,
      k = 5, dims = 64).collect()
    assert(got.length === 3)
    got.foreach { r =>
      assert(r.getLong(2) === 5L)
      assert(r.getLong(4) === 1000000L, "dims=64 slice must be the identity")
    }
  }

  // ----------------------------------------------------------- CUSUM

  test("cusumDrift closed form equals Page's sequential recurrence") {
    // one event type, a level shift on day 4: daily counts 10,10,10,40,40
    // (two shifted days accumulate 2x12.5e6 > mu = 22e6 -> upper alarm)
    val counts = Seq(10, 10, 10, 40, 40)
    val rows = counts.zipWithIndex.flatMap { case (k, d) =>
      (1 to k).map(i => (Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        "t", i.toLong))
    }
    val events = rows.toDF("ts", "event_type", "event_id")
    val got = EventOps.cusumDrift(events)
      .orderBy("day")
      .select("n", "mu_micro", "cusum_up_micro", "cusum_dn_micro", "alarm")
      .collect()

    // driver-side reference: exact integer recurrence
    val mu = counts.map(_.toLong).sum * 1000000L / counts.length
    val kk = mu / 4
    var su = 0L
    var sd = 0L
    got.zip(counts).foreach { case (r, n) =>
      su = math.max(0L, su + (n * 1000000L - mu - kk))
      sd = math.max(0L, sd + (mu - kk - n * 1000000L))
      assert(r.getLong(0) === n.toLong)
      assert(r.getLong(1) === mu)
      assert(r.getLong(2) === su, s"upper CUSUM at n=$n")
      assert(r.getLong(3) === sd, s"lower CUSUM at n=$n")
      assert(r.getBoolean(4) === (su > mu || sd > mu))
    }
    // the shift must actually alarm on the upper side by the last day
    assert(got.last.getBoolean(4))
  }

  // -------------------------------------------------------- itemsets

  test("freqItemsets matches the brute-force triple support") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b d"),
      (4L, "a b c"), (5L, "a c d"), (6L, "b c e")
    ).toDF("doc_id", "text")
    // supDenom=2 -> support floor 3 of 6: L1={a,b,c}; ab=ac=bc=4; abc=3
    val got = TrainOps.freqItemsets(docs, "doc_id", "text", supDenom = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("a", "b", "c", 3L, 4L, 750000L)))
  }

  test("freqItemsets id packing preserves alphabetical item order") {
    // items whose alphabetical and frequency orders differ; every pair of
    // the 3 survivors must come out with ia < ib < ic as STRINGS
    val docs = Seq(
      (1L, "zeta alpha mid"), (2L, "zeta alpha mid"), (3L, "zeta alpha mid"),
      (4L, "zeta noise1"), (5L, "alpha noise2")
    ).toDF("doc_id", "text")
    val got = TrainOps.freqItemsets(docs, "doc_id", "text", supDenom = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("alpha", "mid", "zeta")))
  }

  // ------------------------------------------------------ Kneser-Ney

  test("lmKneserNeyScore matches the driver-side KN reference") {
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    // corpus bigrams: (a,b)x2 + (b,a)x2; NT=2; every margin count = 1
    def nllMicro(cBig: Long, cLeft: Long, n1l: Long, n1r: Long, nt: Long): Long = {
      val num = ((4 * cBig - 3) * nt + 3 * n1l * n1r).toDouble
      val den = (4 * cLeft * nt).toDouble
      math.round(BigDecimal(-math.log(num / den) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000000d)
    }
    val ab = nllMicro(2, 2, 1, 1, 2) // p(b|a) = 13/16
    val ba = nllMicro(2, 2, 1, 1, 2)
    val got = CleanOps.lmKneserNeyScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: bigrams (a,b),(b,a),(a,b) -> n=3; doc 2: (b,a) -> n=1
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getDouble(2) === (2 * ab + ba) / 3 / 1000000d)
    assert(got(1).getLong(1) === 1L)
    assert(got(1).getDouble(2) === ba / 1000000d)
  }

  test("lmKneserNey surprisals are strictly positive on real data") {
    // num < den always (KN reserves mass for unseen words), so every
    // per-doc mean surprisal must come out > 0
    val docs = Tables.documents(spark, sf0001).limit(50)
    val scored = CleanOps.lmKneserNeyScore(docs, "doc_id", "text")
    assert(scored.filter(col("avg_nll") <= 0).count() === 0L)
  }

  test("repeatRuns finds the longest run with deterministic tie-breaks") {
    val docs = Seq(
      (1L, "a a a b b c"),   // max run: a x3
      (2L, "x y z"),         // no repeats
      (3L, "q q w w")        // tie at 2 -> lexically smaller term q wins
    ).toDF("doc_id", "text")
    val got = CleanOps.repeatRuns(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((1L, 3L, "a", true), (2L, 1L, "x", false),
      (3L, 2L, "q", true)))
  }

  test("lexicalEntropy matches closed-form values on tiny docs") {
    val docs = Seq(
      (1L, "a a b b"),   // uniform over 2 types -> exactly 1 bit
      (2L, "a a a a"),   // single type -> 0 bits
      (3L, "a b c d")    // uniform over 4 -> exactly 2 bits
    ).toDF("doc_id", "text")
    val got = CleanOps.lexicalEntropy(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 4L, 2L, 1.0, 500000L),
      (2L, 4L, 1L, 0.0, 250000L),
      (3L, 4L, 4L, 2.0, 1000000L)))
  }

  // -------------------------------------------------- Neyman sampling

  test("neymanSample spends exactly the budget when no stratum clamps") {
    val docs = Tables.documents(spark, sf0001)
    val out = TrainOps.neymanSample(docs, "doc_id", "source",
      size(graft.ops.TextOps.tokens(col("text"))), budget = 60).cache()
    val perStratum = out.groupBy("source")
      .agg(count(lit(1)).as("picked"), first("n_h").as("n_h"),
        first("n_stratum").as("n_stratum"))
      .collect()
    perStratum.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"picked != n_h for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(3), "allocation exceeds stratum size")
    }
    val total = perStratum.map(_.getLong(1)).sum
    val clamped = perStratum.exists(r => r.getLong(2) === r.getLong(3))
    if (!clamped) assert(total === 60L) else assert(total <= 60L)
    out.unpersist(blocking = false)
  }
}
