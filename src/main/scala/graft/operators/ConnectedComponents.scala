package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list — the
  * clustering step that turns pairwise near-duplicate PAIRS (minhash /
  * simhash / embedding-LSH output) into dedup CLUSTERS with a canonical
  * representative (the minimum member id).
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round every vertex takes the minimum label among itself
  * and its neighbors. After `iterations` ≥ the graph diameter the label
  * IS the component minimum. The self-loop trick keeps each round a
  * single join + aggregate consuming the previous labels exactly once
  * (vertex x's own label arrives as the message over the (x, x) edge),
  * so the composed plan grows linearly in rounds, not exponentially.
  *
  * Scale (100 TB): each round shuffles (edge endpoints × labels) once —
  * the same join+agg shape as a groupBy, no driver-side state. Near-dup
  * graphs have tiny diameter (dup clusters are short chains), so a small
  * fixed round count is exact; for adversarial diameters use [[run]],
  * which stops at the measured fixed point, or swap in the
  * large-star/small-star contraction (Kiveris et al. 2014) that
  * converges in O(log²) rounds with the same per-round join+agg shape.
  */
object ConnectedComponents {

  /** Fixed-round min-label propagation, one lazy composed plan (the
    * hash-gate form — a fixed round count is plain unrollable SQL).
    *
    * @param vertices one column `id`; must cover every edge endpoint
    * @param edges    columns `src`, `dst` (orientation irrelevant)
    * @return (id, component) — component = min id reachable within
    *         `iterations` hops; the exact component min once
    *         `iterations` ≥ diameter
    */
  def labelPropagate(vertices: DataFrame, edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "labelPropagate: iterations must be >= 1")
    // symmetric closure + self-loops; distinct so parallel edges add no
    // duplicate messages (min is idempotent, but the dedup keeps the
    // per-round message volume ∝ |E|, not ∝ pair multiplicity)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(vertices.select(col("id").as("src"), col("id").as("dst")))
      .distinct()
    var labels = vertices.select(col("id"), col("id").as("component"))
    (1 to iterations).foreach { _ =>
      labels = sym
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("component"))
    }
    labels
  }

  /** Convergence-checked variant for unknown-diameter graphs: runs one
    * propagation round at a time, materializing each round, and stops
    * when no label changed (or at `maxIterations`). Each round costs one
    * action; use this operationally, [[labelPropagate]] for one-plan
    * composition. The returned frame is PERSISTED (it is the converged
    * state — recomputing it would replay every round); the caller owns
    * the `unpersist()` when done.
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(vertices.select(col("id").as("src"), col("id").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = vertices.select(col("id"), col("id").as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var round = 0
      var converged = false
      while (!converged && round < maxIterations) {
        val next = sym
          .join(labels.select(col("id").as("dst"), col("component")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("component")).as("component"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        converged = next.join(labels.withColumnRenamed("component", "prev"), "id")
          .filter(col("component") =!= col("prev"))
          .isEmpty
        labels.unpersist()
        labels = next
        round += 1
      }
      labels
    } finally { sym.unpersist(); () }
  }
}
