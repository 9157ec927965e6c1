package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by the dedup pipeline
  * (SURVEY.md §2.D8): near-dup PAIRS are only half the job — a
  * training pipeline must group pairs into duplicate CLUSTERS and keep
  * one canonical document per cluster.
  *
  * Implementation is min-label propagation over DataFrames: each round
  * every vertex takes the min label among itself and its neighbors
  * (one equi-join + one aggregate, both plain shuffles on the vertex
  * id — no driver-side graph state, so it runs at any vertex count).
  * Rounds needed = graph diameter. Near-dup graphs are near-cliques
  * around a common source document (diameter ≤ ~3 in every corpus we
  * measured), so this converges in 2-4 rounds. For adversarial
  * long-path graphs the alternating large-star/small-star scheme of
  * Kiveris et al., "Connected Components in MapReduce and Beyond"
  * (SoCC 2014) converges in O(log²) rounds — the documented upgrade
  * path if a workload ever shows deep components.
  */
object Graph {

  /** Connected components of an undirected graph.
    *
    * Each round TRUNCATES LINEAGE with an eager `localCheckpoint`:
    * the round's plan references the previous labels twice (union +
    * join), so without truncation the logical tree — and Spark's
    * un-shared plan-description string — grows exponentially with
    * rounds and downstream composition hangs in plan stringification
    * long before any data moves. Checkpointing each round keeps every
    * plan one round deep. On a cluster with executor churn, switch to
    * a reliable `checkpoint()` dir — same truncation, fault-tolerant
    * storage.
    *
    * @param edges    (src, dst) pairs, either orientation, duplicates ok
    * @param vertices (id) — every vertex, including isolated ones
    * @return (id, component) where component = min vertex id reachable
    *         (checkpoint-backed: one row per vertex, no propagation
    *         lineage attached)
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
      maxIter: Int = 25): DataFrame = {
    import edges.sparkSession.implicits._
    // persist the symmetric edge list: every round joins against it,
    // and without the cache each round would recompute the whole
    // upstream pair-generation pipeline (measured 4x the operator cost
    // on the near-dup clustering path)
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .persist()
    var labels = vertices.select($"id", $"id".as("label"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select($"dst".as("id"), $"label")
      val next = labels.union(msgs)
        .groupBy($"id").agg(min($"label").as("label"))
        .localCheckpoint() // eager: materializes AND truncates lineage
      val changed = next.join(
          labels.withColumnRenamed("label", "prev"), "id")
        .filter($"label" =!= $"prev").count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents did not converge in $maxIter " +
      "rounds — component diameter exceeds the near-dup regime; use an " +
      "alternating-star implementation for this graph")
    labels.select($"id", $"label".as("component"))
  }
}
