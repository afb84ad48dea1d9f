package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists — the step that
  * turns pairwise dup detection into dedup groups (keep the cluster
  * representative, drop the rest).
  *
  * Algorithm: iterative min-label propagation to a fixpoint — each round
  * every node adopts the smallest label among itself and its neighbors.
  * Rounds needed = graph diameter; dup clusters are near-cliques, so this
  * converges in 2-3 rounds in practice. Lineage is truncated per round
  * with `localCheckpoint` (on a cluster, prefer `checkpoint` to HDFS so a
  * lost executor doesn't recompute the whole loop); the fixpoint test
  * piggybacks on the same pass.
  *
  * At extreme scale (billions of edges, long chains) swap the inner loop
  * for the alternating large-star/small-star rounds of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14) — same
  * join-shape, logarithmic round count on pathological chains.
  */
object Clusters {

  /** @param pairs (id1, id2) undirected edges, any orientation
    * @return (id, cluster) for every node appearing in pairs, cluster =
    *         min node id of the component
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame =
    componentsWithRounds(pairs, maxIters)._1

  /** [[connectedComponents]] plus the number of propagation rounds run —
    * the quantity the scale probe tracks: rounds = graph diameter (+1 for
    * the fixpoint check), so a corpus growing with fresh content must hold
    * it flat; a rising round count means dup chains are lengthening and
    * it's time for the large-star/small-star swap documented above.
    */
  def componentsWithRounds(pairs: DataFrame, maxIters: Int = 20): (DataFrame, Int) = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val next = labels.join(edges, col("id") === col("a"))
        .select(col("b").as("id"), col("label"))
        .unionAll(labels)
        .groupBy("id").agg(min("label").as("next_label"))
        .localCheckpoint()
      changed = next.join(labels, "id")
        .filter(col("next_label") < col("label")).count()
      labels = next.withColumnRenamed("next_label", "label")
      iter += 1
    }
    (labels.select(col("id"), col("label").as("cluster")), iter)
  }
}
