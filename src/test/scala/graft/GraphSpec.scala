package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Connected components over near-dup pair lists (the pairs→clusters step). */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("singletons keep their own id when there are no edges") {
    assert(cc(Seq(7L, 3L, 9L), Seq.empty) === Map(7L -> 7L, 3L -> 3L, 9L -> 9L))
  }

  test("a chain collapses to the minimum id regardless of edge orientation") {
    // 5-4, 3-4 (reversed), 3-2, 1-2: one path component labelled 1, plus 9
    val labels = cc(Seq(1L, 2L, 3L, 4L, 5L, 9L),
      Seq((5L, 4L), (3L, 4L), (3L, 2L), (1L, 2L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 9L -> 9L))
  }

  test("cycles and multiple components") {
    val labels = cc(Seq(10L, 11L, 12L, 20L, 21L, 30L),
      Seq((10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)))
    assert(labels === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("duplicate and self edges are harmless") {
    val labels = cc(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L))
  }

  test("empty node set converges immediately") {
    assert(cc(Seq.empty, Seq.empty) === Map.empty)
  }

  test("diameter beyond maxIters fails loudly instead of returning wrong labels") {
    val n = 12L
    val chain = (1L until n).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      Graph.connectedComponents((1L to n).toDF("id"),
        chain.toDF("id_a", "id_b"), maxIters = 2).collect()
    }
  }

  test("long chain converges within the default bound") {
    val n = 15L
    val chain = (1L until n).map(i => (i, i + 1))
    val labels = cc(1L to n, chain)
    assert(labels.values.toSet === Set(1L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: K4 has 4 triangles, 3 per node") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: wedge-only and chain graphs have none; hub counts once per closed fan pair") {
    // path 1-2-3 plus a pendant: no triangle at all
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    // hub 1 connected to 2,3,4 with one closing edge (2,3): one triangle
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two triangles sharing edge (1,2): nodes 1,2 in both
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  private def lp(edges: Seq[(Long, Long)], rounds: Int): Map[Long, (Long, Long)] =
    Graph.labelPropagation(edges.toDF("id_a", "id_b"), rounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("labelPropagation splits a bridged pair of dense communities (CC merges them)") {
    val k4 = (lo: Long) => for (a <- lo to (lo + 3); b <- (a + 1) to (lo + 3)) yield (a, b)
    val edges = k4(1L) ++ k4(5L) :+ ((4L, 5L))
    // hand-propagated: round 3 is stable at {1,2,3,4}->1, {5,6,7,8}->5
    assert(lp(edges, rounds = 3) ===
      ((1L to 4L).map(_ -> ((1L, 4L))) ++ (5L to 8L).map(_ -> ((5L, 4L)))).toMap)
    // min-label flood over the same edges collapses everything to label 1
    val ccLabels = Graph.connectedComponents(
        (1L to 8L).toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(_.getLong(1)).toSet
    assert(ccLabels === Set(1L))
  }

  private def ccStar(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponentsStar(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC equals min-label CC on cycles, chains, duplicates, singletons") {
    val cases = Seq(
      (Seq(1L, 2L, 3L, 4L, 5L), Seq((1L, 2L), (2L, 3L), (4L, 5L))),
      (Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L))),          // cycle
      (Seq(1L, 2L, 3L), Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L))), // dups/self
      ((1L to 9L).toSeq, Seq((9L, 8L), (7L, 9L), (2L, 4L), (4L, 6L), (6L, 2L))))
    cases.foreach { case (ns, es) =>
      assert(ccStar(ns, es) === cc(ns, es), s"mismatch on $es")
    }
  }

  test("star CC contracts a 200-link chain where min-label's 20-round cap fails") {
    val nodes = (1L to 200L).toSeq
    val chain = (1L until 200L).map(i => (i, i + 1))
    // diameter 199 >> 20: the label flood must refuse...
    assertThrows[IllegalArgumentException](cc(nodes, chain))
    // ...while star alternation converges well inside its default cap
    assert(ccStar(nodes, chain) === nodes.map(_ -> 1L).toMap)
  }

  test("labelPropagation one-round vote: plurality with min-label tie-break") {
    // star: center 1 sees {2,3,4} (all count 1, tie -> 2); leaves see {1}
    assert(lp(Seq((1L, 2L), (1L, 3L), (1L, 4L)), rounds = 1) ===
      Map(1L -> ((2L, 1L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)), 4L -> ((1L, 3L))))
  }

  private def incr(oldLabels: Map[Long, Long], newNodes: Seq[Long],
                   newEdges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.incrementalComponents(oldLabels.toSeq.toDF("id", "label"),
        newNodes.toDF("id"), newEdges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incrementalComponents equals full recompute: extension, merge, isolation") {
    // history: {1,2} labelled 1, {5,6} labelled 5, singleton 9
    val old = Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
    // batch: 10 extends cluster 1 via 2; 11 bridges clusters 1 and 5
    // (merging them); 12 is isolated; late old-old edge 9-6 pulls 9 in
    val got = incr(old, Seq(10L, 11L, 12L),
      Seq((10L, 2L), (11L, 10L), (11L, 6L), (9L, 6L)))
    val want = cc(Seq(1L, 2L, 5L, 6L, 9L, 10L, 11L, 12L),
      Seq((1L, 2L), (5L, 6L), (10L, 2L), (11L, 10L), (11L, 6L), (9L, 6L)))
    assert(got === want)
    assert(got(12L) === 12L && got(6L) === 1L && got(9L) === 1L)
  }

  test("incrementalComponents with no new edges leaves history untouched") {
    val old = Map(1L -> 1L, 2L -> 1L, 7L -> 7L)
    assert(incr(old, Seq(20L), Seq.empty) ===
      Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 20L -> 20L))
  }

  test("incrementalComponents == batch CC on seeded random graphs and cuts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + rnd.nextInt(20)
      val ids = (0L until n.toLong).toSeq
      val edges = Seq.fill(rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val cut = 1 + rnd.nextInt(n - 1)
      val (oldOld, rest) = edges.partition { case (a, b) => a < cut && b < cut }
      // ~20% of history edges arrive LATE, inside the new batch
      val (late, hist) = oldOld.partition(_ => rnd.nextDouble() < 0.2)
      val oldLabels = Graph.connectedComponentsStar(
        ids.filter(_ < cut).toDF("id"), hist.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = incr(oldLabels, ids.filter(_ >= cut), rest ++ late)
      val want = cc(ids, edges)
      assert(got === want, s"trial $trial n=$n cut=$cut edges=${edges.size}")
    }
  }
}
