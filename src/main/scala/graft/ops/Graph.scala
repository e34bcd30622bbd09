package graft.ops

import graft.core.Materialize.StageOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step of a dedup
  * pipeline: near-dup PAIRS (from any tier: exact Jaccard, MinHash, SimHash,
  * embedding LSH) become CLUSTERS, and "keep one doc per cluster" becomes a
  * trivial filter on `doc_id = cluster_id`.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum label among
  * itself and its neighbors; converged when no label changes. Rounds needed
  * = the largest component's diameter — near-dup clusters are small and
  * dense (diameter a handful), so this converges in a few rounds even at
  * corpus scale. Each round is one equi-join + one min-aggregate, both
  * plain shuffles on the node id; no driver-side data beyond the one-row
  * convergence check. (For adversarial long-chain graphs the literature's
  * large-star/small-star alternation [Kiveris et al. 2014] halves rounds;
  * not needed for dedup-shaped graphs.)
  *
  * Intermediate labels are staged (`core.Materialize` — localCheckpoint, or reliable checkpoint under `spark.graft.checkpointDir`) per round: each round's plan
  * references the previous round TWICE (the self-union and the edge join),
  * so without lineage truncation the logical plan doubles every round —
  * by round ~14 the plan tree is ~2^14 nodes and merely *stringifying* it
  * for the SQL listener OOMs. Checkpointing keeps the plan O(1) deep;
  * superseded checkpoint RDDs are reclaimed by the ContextCleaner.
  */
object Graph {

  /** Cluster assignment for every node: (id, cluster_id) where cluster_id
    * is the minimum node id reachable via `edges`. Nodes absent from
    * `edges` keep themselves as singleton clusters.
    *
    * @param nodes one column `id`
    * @param edges columns `id_a`, `id_b` (undirected; orientation ignored)
    * @param maxIters hard round bound; throws if not converged (a dedup
    *                 graph needing >20 rounds means the pair generation is
    *                 broken, not that more rounds are needed)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // Symmetrize in ONE pass: each pair row explodes into both directions
    // inside the scan/pipeline stage, so the (possibly expensive) pair
    // pipeline runs ONCE and no persisted original is held alive while the
    // doubled copy materializes. (History: union(e, e.swap) over an
    // unpersisted input ran the upstream plan twice — doubling
    // q_dedup_clusters when edges came from the PPJoin pipeline — and the
    // round-12 persist+union fix held TWO edge-list copies live instead;
    // explode needs neither. Consumers are min-aggregates and equi-joins,
    // so the changed row order cannot change results.)
    val sym = edges.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .staged() // eager: materializes here, truncates the pair-pipeline plan
    var labels = nodes.select(col("id"), col("id").as("label")).staged()
    // labels only ever DECREASE under min-propagation, so sum(label) is a
    // strictly-decreasing convergence signal: one small aggregate per round
    // both materializes the cache and detects the fixpoint (decimal sum —
    // a long sum can overflow at billions of 64-bit ids)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty node set: sum is NULL
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // candidate labels: own label plus each neighbor's current label
      val viaEdges = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val next = labels.select("id", "label").union(viaEdges)
        .groupBy("id").agg(min("label").as("label"))
        .staged() // eager: O(1)-deep plan; prior round's RDD is GC-reclaimed
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
  }

  /** Connected components via LARGE-STAR / SMALL-STAR alternation
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the production CC for graphs whose diameter is NOT small:
    * [[connectedComponents]]' min-label flood needs diameter rounds (a
    * 200-link chain needs 200), while star alternation contracts paths
    * doubly-exponentially and converges in O(log² n) rounds on ANY graph
    * shape (the same 200-link chain: 3 rounds, spec-proven). Per round:
    *   - large-star: every node reroutes its LARGER neighbors to the
    *     minimum of its closed neighborhood;
    *   - small-star: every node reroutes its smaller neighbors (and
    *     itself) to the minimum of its smaller neighborhood.
    * Both are one partially-aggregable min per node + one node-keyed
    * equi-join emitting ≤ |E| canonical edges — same shuffle budget per
    * round as a label round, far fewer rounds. The fixpoint is a star
    * forest centered at component minima; the (count, edge-hash-sum)
    * signature detects it with one small aggregate per round (the
    * labelSum discipline). Intermediate edge sets are staged (Materialize)
    * for the same plan-depth reason as the label loop.
    *
    * Output contract identical to [[connectedComponents]] — (id, label)
    * with label = component minimum — and spec-proven equal on shared
    * inputs, so the two are drop-in interchangeable. */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
                              maxIters: Int = 30): DataFrame = {
    def canon(e: DataFrame) = e.filter(col("a") =!= col("b")).distinct()
    def sym(e: DataFrame) = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      canon(s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e).filter(col("v") < col("u"))
      val m = s.groupBy("u").agg(min(col("v")).as("m"))
      canon(s.join(m, "u").select(col("v").as("a"), col("m").as("b"))
        .union(m.select(col("u").as("a"), col("m").as("b"))))
    }
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var e = canon(edges.select(greatest(col("id_a"), col("id_b")).as("a"),
      least(col("id_a"), col("id_b")).as("b"))).staged()
    var prev = sig(e)
    var converged = prev._1 == 0L // no edges: already a (degenerate) forest
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(e)).staged()
      val s = sig(next)
      converged = s._1 == prev._1 && s._2.compareTo(prev._2) == 0
      prev = s
      e = next
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIters rounds")
    val roots = e.groupBy(col("a").as("id")).agg(min(col("b")).as("root"))
    nodes.select(col("id"))
      .join(roots, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("root"), col("id")).as("label"))
  }

  /** INCREMENTAL connected components — cluster maintenance under a new
    * batch, the production shape for daily dedup ingestion: history is
    * NEVER re-clustered.
    *
    * Cluster-contraction argument: components of the grown graph equal
    * components of the graph whose nodes are {old cluster labels} ∪ {new
    * ids} and whose edges are the new edges with endpoints routed through
    * their old labels. So the star-CC rounds run on a graph bounded by
    * the NEW batch (plus touched old clusters), not the corpus. Labels
    * stay component minima over original ids: an old label is its
    * cluster's minimum, so min over {touched labels, new ids} is the true
    * global minimum of the merged component — incremental output is
    * hash-identical to a full recompute (the declared query's oracle IS
    * the full-batch recursive-CTE closure).
    *
    * Scale shape: endpoint routing is two |E_new|-keyed lookup joins into
    * the label table; the contracted star-CC is new-batch-bounded; the
    * only corpus-sized step is the final relabel — ONE equi-join of the
    * old assignment against the (touched-labels-only) remap table, which
    * broadcast-joins whenever the day's merge set is small. Edges between
    * two OLD nodes (late-arriving links) merge their clusters correctly
    * through the same contraction.
    *
    * @param oldLabels (id, label) — the existing assignment, label = min id
    * @param newNodes  (id) — the new batch's node ids
    * @param newEdges  (id_a, id_b) — pairs touching ≥1 new node, plus any
    *                  late old-old links
    * @return (id, label) over old ∪ new nodes, = full-recompute labels */
  def incrementalComponents(oldLabels: DataFrame, newNodes: DataFrame,
                            newEdges: DataFrame, maxIters: Int = 30): DataFrame = {
    // ol is referenced THREE times (both endpoint lookups + the final
    // relabel) and is typically itself a lazy CC pipeline — unstaged, that
    // pipeline re-ran per reference. contracted feeds cNodes twice plus
    // the star-CC seed; delta (new-batch-bounded) feeds the remap and the
    // new-node join. Stage each once: ol is node-sized (the op's own
    // output scale), the others batch-bounded.
    val ol = oldLabels.select(col("id"), col("label")).staged()
    val la = ol.select(col("id").as("id_a"), col("label").as("ca"))
    val lb = ol.select(col("id").as("id_b"), col("label").as("cb"))
    val contracted = newEdges.select(col("id_a"), col("id_b"))
      .join(la, Seq("id_a"), "left_outer")
      .join(lb, Seq("id_b"), "left_outer")
      .select(coalesce(col("ca"), col("id_a")).as("id_a"),
        coalesce(col("cb"), col("id_b")).as("id_b"))
      .staged()
    val cNodes = newNodes.select(col("id"))
      .union(contracted.select(col("id_a").as("id")))
      .union(contracted.select(col("id_b").as("id"))).distinct()
    val delta = connectedComponentsStar(cNodes, contracted, maxIters).staged()
    val remap = delta.select(col("id").as("label0"), col("label").as("label1"))
    val oldOut = ol.join(remap, ol("label") === col("label0"), "left_outer")
      .select(ol("id"), coalesce(col("label1"), ol("label")).as("label"))
    val newOut = newNodes.select(col("id"))
      .join(delta, Seq("id"))
      .select(col("id"), col("label"))
    oldOut.union(newOut)
  }

  /** Per-node triangle counts via degree-ordered edge orientation (Suri &
    * Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
    * Reducer") — the triangle is the similarity graph's basic cohesion
    * motif (clustering coefficient, community density).
    *
    * Every edge is oriented from its (degree, id)-lexicographically
    * smaller endpoint to the larger; a triangle then has exactly ONE apex
    * with two out-edges, so enumerating wedges among out-neighbors and
    * closing them against the oriented edge list counts each triangle
    * once. The orientation is the scale lever: out-degree is bounded by
    * O(√m) on any graph, so the wedge join's fan-out per node is √m-
    * bounded even when a hub's undirected degree is corpus-sized — the
    * naive undirected wedge join has no such bound.
    *
    * Plan shape: two node-keyed joins to attach degrees, one self-join on
    * the apex (wedges), one equi-join on (v, w) to close — all plain
    * shuffles on node ids; the per-triangle explode to the three member
    * nodes is bounded by 3·|triangles|.
    *
    * @param edges columns `id_a`, `id_b`, one row per undirected edge
    *              (a < b, no duplicates — the dedup-tier pair contract)
    * @return (id, n_triangles) for every node in ≥1 triangle */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("id_a").as("u"), col("id_b").as("w"))
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("w"), col("d").as("dw")), "w")
    val uFirst = col("du") < col("dw") || (col("du") === col("dw") && col("u") < col("w"))
    // oriented edge src→dst with the dst's (degree, id) rank carried for
    // the wedge ordering (no join back to the degree table)
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("w")).as("src"),
      when(uFirst, col("w")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dw")).otherwise(col("du")).as("dd"))
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("x"), col("dd").as("dx"))
    val wedges = o1.join(o2, "src")
      .filter(col("dv") < col("dx") || (col("dv") === col("dx") && col("v") < col("x")))
      .select(col("src").as("a"), col("v").as("b"), col("x").as("c"))
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), made deterministic: every node starts labeled with its own id;
    * each round every node simultaneously adopts the label held by the
    * PLURALITY of its neighbors, ties broken toward the smallest label
    * (the paper's random tie-break is not reproducible; (count desc,
    * label asc) is a total order, so a fixture run and an unrolled-CTE
    * oracle agree bit-for-bit). Unlike [[connectedComponents]]' min-label
    * flood — which converges to one label per component — plurality
    * voting stops at DENSITY boundaries: a component made of two dense
    * communities joined by a thin bridge keeps two labels.
    *
    * Scale shape: each round is one equi-join of the label table onto the
    * symmetrized edges plus two partially-aggregable groupBys — the
    * (node, label) vote count, then the per-node argmax as
    * `max(struct(count, -label))` — never a corpus-sized window
    * partition. `rounds` is a fixed small constant (community labels
    * stabilize in a handful of rounds on dedup-shaped graphs); per-round
    * labels are staged (Materialize) for the same plan-depth reason as
    * [[connectedComponents]].
    *
    * @param edges columns `id_a`, `id_b` (undirected, a < b, no dups —
    *              the dedup-tier pair contract); every node in `edges`
    *              has ≥ 1 neighbor, so every vote is non-empty
    * @return (id, label, csize) for every endpoint node, csize = the
    *         final community's node count */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst")).persist()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .staged() // eager: truncates the pair-pipeline plan
    e.unpersist(blocking = false)
    var lab = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to rounds) {
      lab = sym
        .join(lab.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src", "nl").agg(count(lit(1)).as("c"))
        .groupBy("src")
        .agg(max(struct(col("c").as("c"), (-col("nl")).as("negl"))).as("m"))
        .select(col("src").as("id"), (-col("m.negl")).as("label"))
        .staged() // eager: O(1)-deep plan across rounds
    }
    val sizes = lab.groupBy("label").agg(count(lit(1)).cast("long").as("csize"))
    lab.join(sizes, "label").select("id", "label", "csize")
  }

  /** Multi-source BFS levels (synchronous frontier expansion): every node
    * matching the deterministic seed rule `id % seedMod == 0` starts at
    * level 0; round r labels the still-unvisited neighbors of round r−1's
    * frontier with level r. The classic Pregel traversal — "how many hops
    * is every document from a curated seed set" is the provenance /
    * influence-radius audit over the similarity graph, and the hop count
    * is itself a mixing signal (SemDeDup-adjacent: near-seed ≈
    * redundant).
    *
    * Scale shape: each round is one equi-join of the frontier onto the
    * symmetrized edges, a partially-aggregable `distinct`, and one
    * anti-join against the visited set — work proportional to the
    * frontier's out-edges, never all-pairs. Fixed `rounds` bounds the
    * iteration (the log-round doubling alternative — repeated squaring of
    * the reachability relation — trades each round for an edge×edge
    * self-join; for the small fixed radii this audit wants, frontier
    * expansion moves strictly less data). Per-round results are
    * staged (Materialize) so the plan stays O(1)-deep, same as
    * [[connectedComponents]] / [[labelPropagation]].
    *
    * @param edges columns `id_a`, `id_b` (undirected, a < b, no dups)
    * @return (id, lev) for every node reached within `rounds` hops of a
    *         seed; unreached nodes are absent */
  /** Bounded k-core peeling (Seidman 1983): repeatedly delete nodes of
    * degree < k; what survives is the maximal subgraph of minimum degree
    * ≥ k — the dense-region extractor (boilerplate farms and template
    * clusters in a near-dup graph are exactly its high cores; the
    * complement of [[bfsLevels]]' reachability view). Peeling is a
    * MONOTONE shrink, so each round is one partial-agg degree count +
    * two semi-joins back onto the edges; `rounds` bounds the iteration
    * and the CONVERGED flag (post-final-peel min degree ≥ k — a bounded
    * driver-side check on the node-degree table) certifies whether the
    * bound sufficed, so a truncated run is detectable, never silent.
    * Adversarial long-chain graphs need O(n) peels; dedup-shaped graphs
    * converge in a handful (the flag is the proof, per run).
    *
    * @param edges columns `id_a`, `id_b` (undirected, a < b, no dups)
    * @return (id, deg, converged) for every surviving node — deg is the
    *         node's degree INSIDE the surviving subgraph */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
    var sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .staged()
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("n"))
        .filter(col("n") >= k).select(col("src").as("id"))
      sym = sym
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .staged()
    }
    val deg = sym.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    val converged = deg.filter(col("deg") < k).isEmpty
    deg.select(col("src").as("id"), col("deg"), lit(converged).as("converged"))
  }

  /** Adamic-Adar link prediction over an undirected edge list (id_a <
    * id_b): for each non-adjacent pair with >= 1 common neighbor w, score
    * = sum_w 1/ln(deg(w)). A common neighbor is adjacent to both
    * endpoints, so deg(w) >= 2 and ln(deg) > 0 always. Wedge enumeration
    * is sum(deg^2)-bounded (the triangle-join bound); the irrational
    * 1/ln terms route through round(.,10) -> DECIMAL -> exact sum so the
    * score is summation-order-independent. */
  def adamicAdar(edges: DataFrame, maxDegree: Int = 1 << 20): DataFrame = {
    val e = edges.select(col("id_a").as("u"), col("id_b").as("w"))
    val und = e.union(e.select(col("w").as("u"), col("u").as("w")))
    // Round 10 (r9 verdict #6): wedges come from per-center SORTED
    // adjacency arrays instead of the und⋈und self-join — each unordered
    // endpoint pair (x, y) generates exactly ONCE (y ranges over the
    // array tail strictly after x, so x < y by construction; the old
    // self-join matched every pair twice and filtered half away), and the
    // center's degree rides along as size(ns), which deletes the deg join
    // that used to shuffle the whole wedge stream a second time. Plan:
    // one shuffle to build adjacency + the final (x, y) aggregation;
    // wedge volume is exactly Σ_w C(deg_w, 2). Transient slice copies are
    // bounded by the cell-capped degree (the chunker carry argument).
    //
    // Degree guard (r10 advice): the per-center adjacency array is O(deg)
    // in ONE aggregation buffer, safe only while the edge source keeps
    // degrees cell-capped. graft_collect_capped bounds the buffer at
    // maxDegree + 1 BY CONSTRUCTION (update/merge truncate), and a
    // retained (maxDegree+1)-element array is the overflow marker: it
    // raises a named error instead of silently computing wedges over a
    // truncated neighbor set (or OOMing an executor on an uncapped hub).
    // Default 2^20 ≈ 8 MiB of longs per hub buffer; wedge volume
    // C(deg, 2) makes far smaller degrees the practical ceiling anyway.
    val adj = und.groupBy(col("w"))
      .agg(sort_array(graft.functions.CollectCapped.collectCapped(
        col("u"), maxDegree + 1)).as("ns"))
      .withColumn("ns",
        when(size(col("ns")) > maxDegree,
          raise_error(concat(
            lit(s"adamicAdar: degree of node "), col("w").cast("string"),
            lit(s" exceeds maxDegree=$maxDegree — cap or pre-filter hub nodes"))))
          .otherwise(col("ns")))
    val wedges = adj
      .select(col("ns"), size(col("ns")).as("dw"),
        posexplode(col("ns")).as(Seq("i", "x")))
      .select(col("x"), col("dw"),
        explode(expr("slice(ns, i + 2, size(ns))")).as("y"))
    wedges.groupBy("x", "y")
      .agg(count(lit(1)).as("n_common"),
        round(sum(Exact.dec(round(lit(1.0) / log(col("dw").cast("double")), 10), 28, 10)), 6)
          .cast("double").as("aa_score"))
      .join(edges, col("x") === edges("id_a") && col("y") === edges("id_b"), "left_anti")
      .select(col("x").as("id_a"), col("y").as("id_b"), col("n_common"), col("aa_score"))
  }

  def bfsLevels(edges: DataFrame, seedMod: Long, rounds: Int): DataFrame = {
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .staged()
    // seed set staged ONCE (it anchors every round's anti-join); after
    // that `visited` is only ever a UNION of already-staged leaves, so
    // re-staging it each round was pure localCheckpoint overhead — at
    // sf0.1 ProbeStageMetrics showed this query almost entirely
    // scheduler/materialization cost (40 stages, 1.9 s task time in a
    // 2.9 s query). The lazy union keeps the plan a flat O(rounds)-leaf
    // tree of materialized RDDs; each anti-join scans it in memory.
    var visited = sym.select(col("src").as("id")).distinct()
      .filter(col("id") % seedMod === 0)
      .withColumn("lev", lit(0L))
      .staged()
    var frontier = visited.select("id")
    for (r <- 1 to rounds) {
      frontier = sym
        .join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .staged()
      visited = visited
        .union(frontier.withColumn("lev", lit(r.toLong)))
    }
    visited
  }
}
