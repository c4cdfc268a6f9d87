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
    * given as one-direction edges (src, dst); returns (v, lbl).
    *
    * ADAPTIVE (round 14, the dedupGroups/hopsToRep/PageRank pattern): a
    * graph under `maxDriverEdges` runs the identical integer vote loop
    * on the driver over a CSR adjacency — one collect instead of
    * (join + two aggregates + checkpoint) × iters of grid-sized BSP
    * stages, which at sf0.1 were pure scheduling floor (q191 1.97 s in
    * the r14 pair). All arithmetic is integer, so driver ≡ distributed
    * is exact by construction (LabelPropSpec pins both paths against
    * the naive reference); above the cap the distributed supersteps
    * run unchanged. */
  def run(edges: DataFrame, iters: Int,
          maxDriverEdges: Long = 4L * 1024 * 1024): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // checkpoint FIRST (the dedupGroups discipline): the strategy
    // probe, the driver collect, and the distributed doubled-edge
    // union all read the same — possibly expensive, e.g. a corpus
    // distinct — edge subtree; materialize it once
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    if (integralVertexIds(e0) && e0.count() <= maxDriverEdges)
      return runDriver(e0, iters)
    val e = e0.select(col("src").as("a"), col("dst").as("b"))
      .union(e0.select(col("dst").as("a"), col("src").as("b")))
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

  private def integralVertexIds(edges: DataFrame): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val (st, dt) = (edges.schema("src").dataType, edges.schema("dst").dataType)
    st == dt && Seq(ByteType, ShortType, IntegerType, LongType).contains(st)
  }

  /** Driver twin of the superstep loop for bounded graphs: the same
    * vote — most frequent label among neighbours AND itself, ties to
    * the smallest label — over a primitive-array CSR. Returns a
    * LocalRelation of (v, lbl) cast back to the source id type. */
  private def runDriver(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val srcType = edges.schema("src").dataType
    val tupled = {
      import spark.implicits._
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect()
    }
    val m = tupled.length
    // first-seen index assignment in the flattened (src, dst) order —
    // the same node order Array.distinct produced, without boxing 2m
    // longs through a generic HashSet (round 17: the 1M-edge q191
    // graph spent a measurable slice of its driver gap there)
    val idx = scala.collection.mutable.LongMap.empty[Int]
    val nodesBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def id(x: Long): Int =
      idx.getOrElseUpdate(x, { nodesBuf += x; nodesBuf.length - 1 })
    val ua = new Array[Int](m)
    val va = new Array[Int](m)
    var e = 0
    while (e < m) { ua(e) = id(tupled(e)._1); va(e) = id(tupled(e)._2); e += 1 }
    val nodes = nodesBuf.toArray
    val n = nodes.length
    val degc = new Array[Int](n)
    e = 0
    while (e < m) { degc(ua(e)) += 1; degc(va(e)) += 1; e += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + degc(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val nbr = new Array[Int](2 * m)
    e = 0
    while (e < m) {
      val a = ua(e); val b = va(e)
      nbr(fill(a)) = b; fill(a) += 1
      nbr(fill(b)) = a; fill(b) += 1
      e += 1
    }
    // labels live in INDEX space (every label is a node id, so it has
    // an index); votes tally in a flat array reset via a touched list
    // instead of a per-vertex LongMap (round 17 — no boxing, no
    // rehashing in the O(m·iters) hot loop). The argmax tie-break
    // compares the LABEL VALUES nodes(l), exactly min(struct(-c, lbl)).
    var lbl = Array.tabulate(n)(identity)
    val cnt = new Array[Long](n)
    val touched = new Array[Int](n)
    var it = 0
    while (it < iters) {
      val next = new Array[Int](n)
      var v = 0
      while (v < n) {
        var nt = 0
        def vote(l: Int): Unit = {
          if (cnt(l) == 0L) { touched(nt) = l; nt += 1 }
          cnt(l) += 1L
        }
        vote(lbl(v)) // the self-vote
        var p = off(v)
        while (p < off(v + 1)) { vote(lbl(nbr(p))); p += 1 }
        var bestC = -1L; var bestL = -1
        var t = 0
        while (t < nt) {
          val l = touched(t); val c = cnt(l)
          if (c > bestC || (c == bestC &&
              (bestL < 0 || nodes(l) < nodes(bestL)))) { bestC = c; bestL = l }
          t += 1
        }
        // reset only the touched cells
        t = 0
        while (t < nt) { cnt(touched(t)) = 0L; t += 1 }
        next(v) = bestL
        v += 1
      }
      lbl = next
      it += 1
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(
        nodes.zipWithIndex.map { case (nd, j) =>
          org.apache.spark.sql.Row(nd, nodes(lbl(j)))
        }: _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("lbl",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
      .select(col("v").cast(srcType).as("v"), col("lbl").cast(srcType).as("lbl"))
  }
}
