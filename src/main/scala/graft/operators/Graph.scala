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

  /** Lineage truncation for iterative loops: reliable `checkpoint()`
    * when the session has a checkpoint dir configured (the cluster
    * posture — survives executor loss), `localCheckpoint()` otherwise
    * (test/local posture — faster, blocks die with executors).
    * The reliable path persists before checkpointing — `checkpoint()`
    * alone computes the plan TWICE (once for its eager count, once
    * when writing the checkpoint files) — and un-persists afterwards.
    * Reliable-dir sessions should also set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
    * superseded per-round checkpoint files are garbage-collected. */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist()
      val out = cached.checkpoint()
      cached.unpersist()
      out
    } else df.localCheckpoint()

  /** Connected components of an undirected graph.
    *
    * Each round truncates lineage (see [[truncate]]): the round's plan
    * references the previous labels twice (union + join), so without
    * truncation the logical tree — and Spark's un-shared
    * plan-description string — grows exponentially with rounds and
    * downstream composition hangs in plan stringification long before
    * any data moves. Truncation keeps every plan one round deep.
    *
    * @param edges    (src, dst) pairs, either orientation, duplicates ok
    * @param vertices (id) — every vertex, including isolated ones;
    *                 duplicates are collapsed, and edge endpoints
    *                 missing from `vertices` are labeled anyway
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
    // FRONTIER-optimized propagation: only vertices whose label
    // improved last round re-send. Round 1 sends everything; on the
    // near-clique graphs this operator targets, the frontier then
    // collapses to the few boundary vertices, so rounds 2+ shuffle a
    // shrinking fraction of the graph instead of every label again.
    val ids = vertices.select($"id")
      .union(sym.select($"src".as("id")))
      .distinct()
    var labels = truncate(ids.select($"id", $"id".as("label")))
    var frontier = labels
    var active = 1L
    var iter = 0
    while (active > 0 && iter < maxIter) {
      val msgs = sym.join(frontier.withColumnRenamed("id", "src"), "src")
        .select($"dst".as("id"), $"label".as("cand"))
      val improved = truncate(msgs.groupBy($"id").agg(min($"cand").as("cand"))
        .join(labels, "id").filter($"cand" < $"label")
        .select($"id", $"cand".as("label")))
      active = improved.count()
      if (active > 0) {
        labels = truncate(labels.join(
            improved.withColumnRenamed("label", "better"), Seq("id"), "left")
          .select($"id", coalesce($"better", $"label").as("label")))
        frontier = improved
      }
      iter += 1
    }
    sym.unpersist()
    require(active == 0, s"connectedComponents did not converge in " +
      s"$maxIter rounds — component diameter exceeds the near-dup " +
      "regime; use connectedComponentsAltStar for deep graphs")
    labels.select($"id", $"label".as("component"))
  }

  /** Connected components by the ALTERNATING large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014): each round rewires every node toward its
    * neighborhood minimum, converging in O(log²) rounds regardless of
    * component DIAMETER — the variant for deep graphs (paths, linked
    * chains) where min-label propagation's diameter-many rounds are
    * intractable. Same contract as [[connectedComponents]]; each round
    * is two grouped-min aggregates + joins, all shuffles on node ids,
    * no driver-side graph state. Fixpoint is detected by an edge-set
    * signature (count + hash sum), one tiny aggregate per round.
    *
    * For near-dup clustering the propagation variant is faster (those
    * graphs are near-cliques, 2-4 rounds); this one is the general-
    * graph fallback — equivalence on random graphs is property-tested
    * in GraphSpec. */
  def connectedComponentsAltStar(edges: DataFrame, vertices: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import edges.sparkSession.implicits._

    // canonical working set: (a, b) with a > b, no self-loops, distinct
    var e = truncate(edges
      .select(greatest($"src", $"dst").as("a"), least($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct())
    val e0 = e // initial edge set (checkpointed): endpoint universe

    def largeStar(es: DataFrame): DataFrame = {
      val sym = es.select($"a".as("u"), $"b".as("v"))
        .union(es.select($"b".as("u"), $"a".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      // connect every strictly-larger neighbor to the neighborhood min:
      // v > u >= m, so the (a > b) canonical form is preserved
      sym.join(mins, "u").filter($"v" > $"u")
        .select($"v".as("a"), $"m".as("b")).distinct()
    }

    def smallStar(es: DataFrame): DataFrame = {
      // each edge assigned to its larger endpoint; m = min of the
      // strictly-smaller neighborhood (all v < u here)
      val mins = es.groupBy($"a").agg(min($"b").as("m"))
      val nbrs = es.join(mins, "a").filter($"b" =!= $"m")
        .select($"b".as("a"), $"m".as("b"))
      val self = mins.select($"a", $"m".as("b"))
      nbrs.union(self).filter($"a" =!= $"b").distinct()
    }

    def signature(es: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free under ANSI mode
      // (a hash SUM overflows Long on large edge sets)
      val r = es.agg(count(lit(1)),
        bit_xor(xxhash64($"a", $"b"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = truncate(smallStar(largeStar(e)))
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      iter += 1
    }
    require(converged,
      s"alternating-star did not converge in $maxIter rounds")
    // fixpoint = disjoint stars centered at component minima: every
    // non-root appears exactly once as `a`, pointing at its root.
    // Same vertex contract as connectedComponents: duplicates
    // collapsed, edge-only endpoints labeled.
    vertices.select($"id")
      .union(e0.select($"a".as("id")))
      .union(e0.select($"b".as("id")))
      .distinct()
      .join(e.select($"a".as("id"), $"b".as("c")), Seq("id"), "left")
      .select($"id", coalesce($"c", $"id").as("component"))
  }
}
