package graft.ops

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
  * Intermediate labels are persisted per round and the previous round is
  * unpersisted — lineage stays O(1) deep, so the plan does not grow with
  * iteration count.
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
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // candidate labels: own label plus each neighbor's current label
      val viaEdges = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val next = labels.select("id", "label").union(viaEdges)
        .groupBy("id").agg(min("label").as("label"))
        .persist()
      next.count() // materialize before probing convergence / unpersisting
      converged = next.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).isEmpty
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
  }
}
