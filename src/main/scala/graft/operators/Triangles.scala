package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed TRIANGLE CENSUS by degree-ordered node iteration — the
  * standard two-join shape (Schank's node-iterator as popularized for
  * MapReduce by Suri & Vassilvitskii, "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11): orient every undirected edge
  * from its lower-ordered endpoint to its higher (total order =
  * (degree, node)), build wedges at each node from its OUT-edges
  * only, and close them against the oriented edge set. Each triangle
  * {x, y, z} with ord(x) < ord(y) < ord(z) is counted exactly once —
  * as the wedge (y, z) at x closed by y→z.
  *
  * Why the orientation matters at scale: wedge work is Σ out-deg², and
  * degree-ordering bounds every out-degree by O(√E), so the join never
  * explodes on a hub vertex (the "last reducer" curse) — the naive
  * undirected 2-path join pays Σ deg², which a single celebrity node
  * turns into |V|² pairs.
  *
  * Exact-integer throughout (counts only), so the census hash-gates
  * against an algorithm-independent SQL restatement (`graph_triangles`
  * states "all three edges present, x < y < z" — no orientation).
  *
  * Used by the dedup QA surface: triangle density over the near-dup
  * pair graph separates true duplicate CLUSTERS (transitive, dense)
  * from similarity CHAINS (a→b→c with no a→c), the difference between
  * safe cluster-collapse and over-merging.
  */
object Triangles {

  /** Per-node triangle participation counts plus the global census.
    *
    * @param pairs undirected edges as (a, b) with a < b, DISTINCT —
    *              the near-dup pair contract. The input is consumed
    *              several times (degrees, orientation, wedges,
    *              closure); callers owning an expensive `pairs`
    *              lineage should persist it around the call.
    * @return (node, n_tri): one row per node in ≥1 triangle, plus the
    *         global triangle count under node = -1
    */
  def census(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    val e = pairs.select(col("a"), col("b"))
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ord = deg.select(col("node"), struct(col("deg"), col("node")).as("o"))
    val keyed = e
      .join(ord.select(col("node").as("a"), col("o").as("oa")), "a")
      .join(ord.select(col("node").as("b"), col("o").as("ob")), "b")
    // orient low→high in the (deg, node) total order; carry the head's
    // order key so the wedge can sort its two spokes without re-joining
    val oriented = keyed.select(
      when(col("oa") < col("ob"),
        struct(col("a").as("u"), col("b").as("v"), col("ob").as("ov")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("oa").as("ov")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.ov").as("ov"))
    val wedges = oriented.as("x").join(oriented.as("y"), Seq("u"))
      .filter(col("x.ov") < col("y.ov"))
      .select(col("u").as("t1"), col("x.v").as("t2"), col("y.v").as("t3"))
    val closing = oriented.select(col("u").as("t2"), col("v").as("t3"))
    val tri = wedges.join(closing, Seq("t2", "t3"))
      .select(col("t1"), col("t2"), col("t3"))
    val perNode = tri.select(col("t1").as("node"))
      .unionByName(tri.select(col("t2").as("node")))
      .unionByName(tri.select(col("t3").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val global = tri.agg(count(lit(1)).as("n_tri"))
      .select(lit(-1L).as("node"), col("n_tri"))
    global.unionByName(perNode)
  }
}
