package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle census — the graph-clustering signal
  * (community strength, spam/bot ring detection in link graphs) and the
  * third member of the graph plane with connected components
  * ([[graft.ext.Dedup.dedupGroups]]) and PageRank ([[PageRank]]).
  *
  * Algorithm: orient every undirected edge from its (degree, id)-
  * smaller endpoint to the larger (Schank–Wagner) — a total acyclic
  * order, so each triangle a<b<c is counted EXACTLY ONCE, at its edge
  * a→b — then count by the EDGE-ITERATOR formulation: triangles =
  * Σ over oriented edges |N⁺(src) ∩ N⁺(dst)|. The per-row set
  * intersection replaces the wedge-materialization formulation (every
  * out-neighbor pair exploded, then joined against the closing edge):
  * the wedge stream is Σ outdeg² rows — 41M on the sf0.1 co-purchase
  * graph, measured 4.4 s even with the closing join broadcast — while
  * the intersection form touches each EDGE once carrying two bounded
  * adjacency arrays (out-degrees are O(√m) under the degree
  * orientation, 97 max on the same graph; measured 4.4 → ~1 s).
  *
  * Plan shape: degrees = one aggregate; orientation = two joins of the
  * edge list against the degree table; adjacency = one collect_set per
  * source; count = two joins edge⨝adjacency + a map-side
  * array_intersect + one scalar sum. The degree and adjacency tables
  * are node-sized — broadcast ADAPTIVELY from materialized counts (the
  * dedupGroups probe pattern; both are localCheckpoint'd so the probe
  * is metadata-cheap) with keyed shuffle-join fallback above the bound
  * — the honest billion-node plan, every stage keyed on vertex ids.
  */
object Triangles {

  /** Shared core: materialized edges, degree table, degree-oriented
    * edges, and the edge⨝adjacency frame carrying both endpoints'
    * out-neighbor arrays (na, nb) — the triangles of edge (src, dst)
    * are exactly the members of na ∩ nb. */
  private def core(edges: DataFrame, maxBroadcastRows: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(true)
    def adapt(df: DataFrame, n: Long): DataFrame =
      if (n <= maxBroadcastRows) broadcast(df) else df
    val degB = adapt(deg, deg.count())
    val withDeg = e
      .join(degB.select(col("x").as("u"), col("deg").as("du")), Seq("u"))
      .join(degB.select(col("x").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint(true)
    val adj = oriented.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("ns"))
      .localCheckpoint(true)
    val adjB = adapt(adj, adj.count())
    val edgeTriangles = oriented
      .join(adjB.select(col("src"), col("ns").as("na")), Seq("src"))
      .join(adjB.select(col("src").as("dst"), col("ns").as("nb")), Seq("dst"))
    (e, deg, edgeTriangles)
  }

  /** Census of the undirected simple graph `edges` (cols u, v; each
    * edge once, u ≠ v). Returns ONE row: (n_nodes, n_edges,
    * n_triangles, global_clustering = 3·triangles/wedges, 6 dp). */
  def census(edges: DataFrame,
             maxBroadcastRows: Long = 2L * 1000 * 1000): DataFrame = {
    val (e, deg, edgeTriangles) = core(edges, maxBroadcastRows)
    val tri = edgeTriangles
      .select(size(array_intersect(col("na"), col("nb"))).as("k"))
      .agg(coalesce(sum(col("k")), lit(0L)).cast("long").as("n_triangles"))
    val wedges = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast("long").as("wedges"),
      count(lit(1)).cast("long").as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).cast("long").as("n_edges"))
    wedges.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("wedges"), 6)
          .as("global_clustering"))
  }

  /** Per-node triangle participation and local clustering coefficient
    * (Watts–Strogatz): (v, deg, n_triangles, local_cc) for EVERY node,
    * local_cc = 2·t/(deg·(deg−1)) at 6 dp, NULL for degree-1 nodes.
    * Each triangle found on its (src, dst) edge explodes to its three
    * corners — 3 rows per triangle, never wedge-sized — and the corner
    * counts aggregate by node. The per-node form is the spam/bot-ring
    * feature (hubs with near-zero clustering vs dense rings at 1.0);
    * the global census is its weighted average. */
  def perNode(edges: DataFrame,
              maxBroadcastRows: Long = 2L * 1000 * 1000): DataFrame = {
    val (_, deg, edgeTriangles) = core(edges, maxBroadcastRows)
    val corners = edgeTriangles
      .select(col("src"), col("dst"),
        explode(array_intersect(col("na"), col("nb"))).as("w"))
      .select(explode(array(col("src"), col("dst"), col("w"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).cast("long").as("t"))
    deg.join(corners, Seq("x"), "left")
      .select(col("x").as("v"), col("deg"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(col("deg") > 1,
          round(lit(2.0) * coalesce(col("t"), lit(0L)) /
                (col("deg") * (col("deg") - 1)), 6)).as("local_cc"))
  }
}
