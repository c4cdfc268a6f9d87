package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-iteration PageRank over an undirected edge list — the
  * link-graph quality signal crawl-curation pipelines attach to
  * documents (page authority as a corpus-quality feature; the same
  * role host-level PageRank plays in CommonCrawl-derived datasets).
  *
  * Execution model: Pregel-style BSP unrolled into the declarative
  * plan. Each superstep is ONE equi-join (edges ⨝ ranks on src) plus
  * ONE aggregation (contributions by dst) — both hash-shuffle on
  * vertex ids, so on a cluster the edge table is shuffled onto its
  * join key once per step (or zero times once bucketed by src, the
  * [[graft.sinks.ReportSink.writeBucketed]] layout). Rank state is
  * vertex-sized, localCheckpoint'd per step so the lineage (and the
  * re-execution cost of a lost executor) stays one superstep deep —
  * the cluster twin is `Dataset.checkpoint` on a reliable store.
  *
  * Portability: the per-edge contribution r(src)/deg(src) is
  * floor-rounded to 10 dp, summed as exact DECIMAL(38,12) (order
  * independent — identical under any partitioning, AQE re-plan, or
  * per-engine aggregation order), and the damped update
  * 0.15/N + 0.85·S is re-rounded to 10 dp: every arithmetic step is
  * either exact decimal or a single IEEE double op, so three unrolled
  * iterations stay bit-identical between Spark and the DuckDB oracle
  * (the q63 surprisal recipe, applied iteratively).
  */
object PageRank {

  /** Runs `iters` damped (d = 0.85) PageRank steps over the undirected
    * graph given by `edges` (cols `src`, `dst`; callers pass each
    * undirected edge once — both directions are added here). Returns
    * (v, deg, pr) for every vertex.
    *
    * `broadcastRanks = true` ships the vertex-state table to every
    * executor each superstep, turning the edge-side lookup into a
    * map-side broadcast join: the edge table is NEVER shuffled for the
    * lookup, leaving one exchange per superstep (the contribution
    * aggregation). Correct choice whenever vertex state fits a
    * broadcast (tens of millions of vertices — ~24 bytes each); for
    * billion-vertex graphs pass `false` and the superstep becomes the
    * src-keyed shuffle join (ship edges to their bucketed layout
    * first and even that exchange disappears). Both paths are
    * property-tested bit-equal — same recipe as
    * [[graft.ops.Quantiles]]' driver/distributed twin.
    *
    * `checkpoint = false` keeps the full unrolled lineage in one plan —
    * only for plan-shape tests (PlanSpec pins the superstep join
    * strategy, which a checkpointed plan would hide behind LogicalRDD
    * leaves); production runs always checkpoint per superstep. */
  def run(edges: DataFrame, iters: Int, checkpoint: Boolean = true,
          broadcastRanks: Boolean = true,
          maxDriverEdges: Long = 4L * 1024 * 1024): DataFrame = {
    def cp(df: DataFrame): DataFrame = if (checkpoint) df.localCheckpoint(true) else df
    def hint(df: DataFrame): DataFrame = if (broadcastRanks) broadcast(df) else df
    // ADAPTIVE (round 14, the dedupGroups/hopsToRep/topComponent
    // pattern): a graph under the driver-edge cap runs the identical
    // arithmetic as a driver loop over primitive arrays — one collect
    // instead of (2 jobs + a checkpoint) × iters of grid-sized BSP
    // stages, which at sf0.1 were pure ~0.5-0.7 s/job scheduling floor
    // (q128 1.86 s in the r14 pair). Exactness is preserved step for
    // step: contributions take the same double floor-grid, per-vertex
    // sums accumulate the same DECIMAL(38,12) values as scaled longs
    // (each term is the shortest-decimal rendering of its double,
    // HALF_UP at scale 12 — Spark's own double→Decimal cast), and the
    // damped update replays the identical IEEE expression order, so
    // driver ≡ distributed to the bit (SetGraphSpec pins it). Opting
    // out: plan-shape tests pass checkpoint=false; the
    // broadcastRanks=false shuffle-join twin stays fully distributed
    // (billion-vertex graphs exceed the cap anyway).
    // checkpoint FIRST when the adaptive probe will run (the
    // dedupGroups discipline): the probe, the driver collect, and the
    // distributed doubled-edge union otherwise each re-derive the
    // input subtree (a corpus distinct for q128). Plan-shape callers
    // (checkpoint = false) skip the probe and keep a fully lazy plan.
    val e0 =
      if (checkpoint && broadcastRanks)
        edges.select(col("src"), col("dst")).localCheckpoint(true)
      else edges
    if (checkpoint && broadcastRanks && integralVertexIds(e0) &&
        e0.count() <= maxDriverEdges)
      return runDriver(e0, iters)
    val ed = cp(e0.select(col("src"), col("dst"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst"))))
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).cast("long").as("deg"))
      .select(col("src").as("v"), col("deg"))
    val nDf = deg.agg(count(lit(1)).cast("long").as("nv"))
    val base = cp(deg.crossJoin(broadcast(nDf)))

    var ranks = base.select(col("v"), col("deg"), col("nv"),
      (lit(1.0) / col("nv").cast("double")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(hint(ranks), ed("src") === ranks("v"))
        .select(col("dst"),
          (floor(col("pr") / col("deg").cast("double") * 1e10 + 0.5) / 1e10).as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 12))).cast("double").as("s"))
      ranks = base.join(hint(sums), base("v") === sums("dst"), "left")
        .select(base("v"), col("deg"), col("nv"),
          (floor((lit(0.15) / col("nv").cast("double") +
                  lit(0.85) * coalesce(col("s"), lit(0.0))) * 1e10 + 0.5) / 1e10).as("pr"))
      ranks = cp(ranks)
    }
    ranks.select(col("v"), col("deg"), col("pr"))
  }

  /** Both vertex columns the same integral type — the driver loop
    * round-trips ids through Long (the dedupGroups contract). */
  private def integralVertexIds(edges: DataFrame): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val (st, dt) = (edges.schema("src").dataType, edges.schema("dst").dataType)
    st == dt && Seq(ByteType, ShortType, IntegerType, LongType).contains(st)
  }

  /** Driver twin of the BSP loop for bounded graphs: CSR adjacency over
    * primitive arrays, per-step arithmetic replicated bit-for-bit (see
    * the run() scaladoc). Returns a LocalRelation. */
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
    // same node order as the old Array.distinct, without boxing 2m
    // longs through a generic HashSet (round 17)
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
    // doubled-edge CSR (each input edge contributes both directions)
    val deg = new Array[Long](n)
    e = 0
    while (e < m) { deg(ua(e)) += 1; deg(va(e)) += 1; e += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i).toInt; i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val nbr = new Array[Int](2 * m)
    e = 0
    while (e < m) {
      val a = ua(e); val b = va(e)
      nbr(fill(a)) = b; fill(a) += 1
      nbr(fill(b)) = a; fill(b) += 1
      e += 1
    }
    val nv = n.toLong
    var pr = Array.fill(n)(1.0 / nv.toDouble)
    var it = 0
    while (it < iters) {
      // per-dst sums of the 10-dp-floored contributions, accumulated as
      // the DECIMAL(38,12) values Spark's double→Decimal cast produces:
      // shortest-decimal rendering of the double, HALF_UP to scale 12,
      // summed as unscaled longs (≤ 1e12 per term — exact, order-free)
      val sums = new Array[Long](n)
      var u = 0
      while (u < n) {
        val c = math.floor(pr(u) / deg(u).toDouble * 1e10 + 0.5) / 1e10
        val unscaled = java.math.BigDecimal.valueOf(c)
          .setScale(12, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        var p = off(u)
        while (p < off(u + 1)) { sums(nbr(p)) += unscaled; p += 1 }
        u += 1
      }
      val next = new Array[Double](n)
      var v = 0
      while (v < n) {
        val s = java.math.BigDecimal.valueOf(sums(v), 12).doubleValue
        next(v) = math.floor((0.15 / nv.toDouble + 0.85 * s) * 1e10 + 0.5) / 1e10
        v += 1
      }
      pr = next
      it += 1
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(
        nodes.zipWithIndex.map { case (nd, j) =>
          org.apache.spark.sql.Row(nd, deg(j), pr(j))
        }: _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("deg",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pr",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(rows, schema)
      .select(col("v").cast(srcType).as("v"), col("deg"), col("pr"))
  }
}
