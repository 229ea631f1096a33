package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening — (node, parent) edges → (node, root, depth) —
  * the operator behind BOM explosions, org rollups, thread ancestry,
  * and category trees. Spark has no recursive CTE; the naive
  * translation climbs one level per iteration (O(depth) self-joins,
  * each a full shuffle — a 20-level hierarchy pays 20 shuffles).
  *
  * This uses POINTER DOUBLING (Wyllie's list-ranking technique, 1979;
  * the same trick GraphX's Pregel-free shortcuts use): each round
  * every node's pointer jumps to its pointer's pointer and distances
  * add, so covered depth doubles per round — a depth-D hierarchy
  * flattens in ceil(log2 D) self-joins. Roots self-loop with distance
  * 0, which makes them the fixpoint: once a node's pointer reaches its
  * root, further rounds are identity.
  *
  * 100 TB shape: the state is one row per node (never per path), each
  * round is ONE hash self-join on the pointer key, and the plan
  * re-roots via an eager localCheckpoint per round so the lineage
  * stays O(1) instead of doubling (the dedupGroupsDF lesson — an
  * uncheckpointed doubling loop re-analyzes a 2^r-leaf tree).
  */
object Hierarchy {

  /** @param edges  (node: long, parent: long|null) — null parent = root
    * @param rounds pointer-doubling rounds; covers depth ≤ 2^rounds
    *               (6 rounds = depth 64 — deeper than any real
    *               catalog/org tree; raise for pathological chains)
    * @return (node, root, depth) — depth = edges climbed to the root.
    *         A DANGLING parent id (no row in `edges` — a contract
    *         violation upstream) surfaces as that node's root rather
    *         than silently dropping the node: the hop join is LEFT, so
    *         an unmatched pointer simply stops advancing. Callers that
    *         need to detect the violation can filter for roots absent
    *         from `edges.node`. */
  def rootAndDepth(edges: DataFrame, rounds: Int = 6): DataFrame = {
    // pointer table: roots point at themselves at distance 0.
    var p = edges.select(
      col("node"),
      coalesce(col("parent"), col("node")).as("ptr"),
      when(col("parent").isNull, 0L).otherwise(1L).as("dist"))
    for (_ <- 1 to rounds) {
      val hop = p.select(col("node").as("h_node"),
        col("ptr").as("h_ptr"), col("dist").as("h_dist"))
      p = p.join(hop, p("ptr") === hop("h_node"), "left")
        .select(col("node"),
          coalesce(col("h_ptr"), col("ptr")).as("ptr"),
          (col("dist") + coalesce(col("h_dist"), lit(0L))).as("dist"))
        .localCheckpoint(true)
    }
    p.select(col("node"), col("ptr").as("root"), col("dist").as("depth"))
  }
}
