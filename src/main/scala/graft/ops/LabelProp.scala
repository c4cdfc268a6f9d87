package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection (Raghavan
  * 2007), fixed-iteration and fully deterministic — the COMMUNITY verb
  * of the graph plane next to components (union-find, `ext.Dedup`),
  * authority ([[PageRank]]), cohesion ([[Triangles]]) and distance
  * (BFS hops, q184).
  *
  * Semantics per superstep: every vertex simultaneously adopts the
  * label most frequent among its neighbours AND ITSELF, ties broken by
  * the smallest label. The self-vote is load-bearing, not cosmetic:
  * pure synchronous LPA famously oscillates 2-cycles on bipartite
  * graphs (every part flips to the other part's majority each step);
  * counting the vertex's own current label once damps the flip and
  * lets stable regions freeze. Initial label = the vertex id, so the
  * final labels are canonical (smallest-dominating-id) without any
  * random seed — reruns and re-partitions produce identical
  * communities.
  *
  * Scale shape (mirrors [[PageRank.run]]): the undirected edge table
  * materializes once ([[org.apache.spark.sql.Dataset#localCheckpoint]])
  * and each superstep pays ONE neighbour-label equi-join (AQE
  * broadcasts the label side while it is small; billion-vertex graphs
  * fall back to the src-keyed shuffle join) plus ONE (v, lbl) count
  * aggregate. The argmax is `min(struct(-count, label))` — a plain
  * aggregate with map-side partial combine — never a per-vertex
  * row_number window (a hub's vote list stays distributed). Label
  * state is checkpointed per step: one-superstep lineage, the q128
  * lesson that a fused multi-step plan pays more in codegen depth than
  * it saves in jobs.
  *
  * All arithmetic is integer (counts, ids): no float recursion, so
  * the fixed-iteration output is bit-stable across engines by
  * construction.
  */
object LabelProp {

  /** Runs `iters` synchronous supersteps over the undirected graph
    * given as one-direction edges (src, dst); returns (v, lbl). */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(true)
    var labels = e.select(col("a").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val nbr = e.join(labels, e("b") === labels("v"))
        .select(e("a").as("v"), col("lbl"))
      labels = nbr.union(labels) // the self-vote
        .groupBy(col("v"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("v"), col("m.l").as("lbl"))
        .localCheckpoint(true)
    }
    labels
  }
}
