package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-matrix statistics: the exact covariance matrix of an
  * embedding column and its top principal component by fixed-iteration
  * power iteration — the data-driven complement of the JL random
  * projection (q106): JL preserves distances obliviously; PCA tells you
  * where the variance actually lives (embedding-collapse monitoring,
  * whitening, dimensionality decisions for the ANN index family
  * q24/q85).
  *
  * Scale contract: the COVARIANCE pass is the only corpus-sized work —
  * a map-side in-row expand of each vector into its d(d+1)/2 upper-
  * triangle products (the products must be computed by ANY algorithm;
  * here they partial-aggregate map-side so the shuffle carries
  * d(d+1)/2 rows per partition, never the corpus), summed exactly in
  * DECIMAL(38,12). The EIGENSOLVE then runs on the d×d matrix — MODEL
  * state, corpus-independent, the k-means-codebook regime (q85) — as a
  * driver-planned loop under an explicit dimension cap, with a fully
  * distributed join/aggregate twin above the cap, both computing the
  * identical rounded fixpoint (the Quantiles/PageRank twin recipe).
  *
  * Portability (the q128 recipe): every cross-row/cross-term sum is
  * exact DECIMAL(38,12) over terms pre-rounded half-up at 10 dp
  * (`floor(x·1e10 + 0.5)/1e10`), every scalar step a single IEEE double
  * op — so three unrolled iterations are bit-identical between Spark,
  * the driver loop, and the DuckDB oracle.
  */
object EmbeddingStats {

  private val D12 = DecimalType(38, 12)

  /** Exact upper-triangle covariance (i ≤ j, 1-based) of a
    * fixed-dimension float-vector column: (i, j, n, cov) with
    * cov = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/(n−1), products in double, sums exact.
    *
    * Terms are pre-rounded half-up at 12 dp (floor(x·1e12+0.5)/1e12)
    * BEFORE the DECIMAL(38,12) cast: a raw double→decimal cast is a
    * knife edge — Spark rounds the SHORTEST DECIMAL REPR of the double
    * (BigDecimal.valueOf) while DuckDB rounds its EXACT binary value,
    * and this fixture's dim-38 sum landed exactly on a case where the
    * two disagree in the 12th decimal (measured: −0.796898287077 vs
    * −0.796898287078). The pre-round puts every term on a 12-dp grid
    * point both cast conventions agree on — same cost, no precision
    * loss relative to the cast itself. */
  def covariance(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    def r12(c: org.apache.spark.sql.Column) = floor(c * 1e12 + 0.5) / 1e12
    // the d²/2-per-row product expand is CPU-heavy per input row — guard
    // against the one-row-group scan serializing it onto a single core
    val e = graft.ops.Parallelize.forCompute(df.select(col(vecCol).as("e")))
    val base = e.select(col("e"), posexplode(col("e")).as(Seq("p", "xi")))
    val sij = base
      .select(col("p"), col("xi"),
        posexplode(slice(col("e"), col("p") + 1, lit(dim) - col("p")))
          .as(Seq("q", "xj")))
      .select((col("p") + 1).cast("long").as("i"),
              (col("p") + col("q") + 1).cast("long").as("j"),
              r12(col("xi").cast("double") * col("xj").cast("double")).as("prod"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("prod").cast(D12)).as("sij"))
    val si = base
      .select((col("p") + 1).cast("long").as("i"),
              r12(col("xi").cast("double")).as("x"))
      .groupBy(col("i")).agg(sum(col("x").cast(D12)).as("si"))
    val n = e.agg(count(lit(1)).cast("long").as("n"))
    sij
      .join(broadcast(si), Seq("i"))
      .join(broadcast(si.select(col("i").as("j"), col("si").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("n"),
        ((col("sij").cast("double") -
          col("si").cast("double") * col("sj").cast("double") / col("n")) /
         (col("n") - 1)).as("cov"))
  }

  /** Dimension bound for the driver-planned eigensolve: d×d doubles of
    * model state (256² = 512 KB) — the codebook-collect regime. Above
    * it the distributed twin runs. */
  val MaxDriverDim = 256

  /** Top principal component of an upper-triangle covariance frame
    * (cols i, j, cov; 1-based) by `iters` power-iteration steps from
    * the uniform start 1/√d, plus the self-eval residual (q96/q100's
    * measure-your-own-output pattern): ‖Av − λv‖/λ with the same
    * rounding recipe. Output: (i, loading, lambda, explained_frac,
    * residual_rel) — the scalar columns repeated per row.
    *
    * Driver path (d ≤ [[MaxDriverDim]]): collects the d(d+1)/2
    * triangle — bounded model state — and runs the loop with
    * BigDecimal(12) exact sums, returning a LocalRelation downstream
    * joins can broadcast. Distributed path: the same recipe as matvec
    * joins + decimal aggregates per step. Both bit-equal
    * (WarehouseSpec). */
  def topComponent(cov: DataFrame, dim: Int, iters: Int = 3,
                   forceDistributed: Boolean = false): DataFrame =
    if (dim <= MaxDriverDim && !forceDistributed)
      topComponentDriver(cov, dim, iters)
    else topComponentDistributed(cov, dim, iters)

  // ------------------------------------------------------------ driver

  private def topComponentDriver(cov: DataFrame, dim: Int, iters: Int): DataFrame = {
    val spark = cov.sparkSession
    // bounded collect: d(d+1)/2 model-state cells (the q85 codebook
    // regime), NOT corpus data
    val a = Array.ofDim[Double](dim, dim)
    cov.select(col("i").cast("int"), col("j").cast("int"), col("cov"))
      .collect().foreach { r =>
        val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
        a(i)(j) = c; a(j)(i) = c
      }
    // exact decimal(12) sum of 10-dp-half-up-rounded terms — the
    // engines' CAST(x AS DECIMAL(38,12)) on BigDecimal.valueOf semantics
    def r10(x: Double): Double = math.floor(x * 1e10 + 0.5) / 1e10
    def decSum(terms: Iterator[Double]): Double = {
      var acc = java.math.BigDecimal.ZERO
      terms.foreach { t =>
        acc = acc.add(java.math.BigDecimal.valueOf(t)
          .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      acc.doubleValue()
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        decSum((0 until dim).iterator.map(j => r10(a(i)(j) * v(j))))
      }
    def norm(v: Array[Double]): Double =
      math.sqrt(decSum(v.iterator.map(w => r10(w * w))))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = matvec(v)
      lambda = norm(w)
      v = w.map(wi => r10(wi / lambda))
    }
    val trace = decSum((0 until dim).iterator.map(i => a(i)(i)))
    val w4 = matvec(v)
    val resid = v.indices.map(i => r10(w4(i) - lambda * v(i))).toArray
    val residRel = norm(resid) / lambda
    val explained = lambda / trace
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      (0 until dim).map(i =>
        Row((i + 1).toLong, v(i), lambda, explained, residRel)): _*)
    spark.createDataFrame(rows, StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("loading", DoubleType, nullable = false),
      StructField("lambda", DoubleType, nullable = false),
      StructField("explained_frac", DoubleType, nullable = false),
      StructField("residual_rel", DoubleType, nullable = false))))
  }

  // ------------------------------------------------------- distributed

  private def topComponentDistributed(cov: DataFrame, dim: Int,
                                      iters: Int): DataFrame = {
    def r10(c: org.apache.spark.sql.Column) = floor(c * 1e10 + 0.5) / 1e10
    // full matrix = triangle + mirrored strict-upper entries
    val full = cov.select(col("i"), col("j"), col("cov"))
      .union(cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .localCheckpoint(true)
    def matvec(v: DataFrame): DataFrame = full
      .join(broadcast(v.select(col("i").as("j"), col("v"))), Seq("j"))
      .groupBy(col("i"))
      .agg(sum(r10(col("cov") * col("v")).cast(D12)).cast("double").as("w"))
      .localCheckpoint(true)
    def normOf(w: DataFrame): DataFrame = w
      .agg(sqrt(sum(r10(col("w") * col("w")).cast(D12)).cast("double")).as("l"))
    val spark = cov.sparkSession
    var v = full.select(col("i")).distinct()
      .select(col("i"), (lit(1.0) / sqrt(lit(dim.toDouble))).as("v"))
      .localCheckpoint(true)
    var lastNorm: DataFrame = null
    for (_ <- 1 to iters) {
      val w = matvec(v)
      lastNorm = normOf(w).localCheckpoint(true)
      v = w.crossJoin(broadcast(lastNorm))
        .select(col("i"), r10(col("w") / col("l")).as("v"))
        .localCheckpoint(true)
    }
    val trace = cov.filter(col("i") === col("j"))
      .agg(sum(col("cov").cast(D12)).cast("double").as("tr"))
    val w4 = matvec(v)
    val resid = w4.join(v, Seq("i")).crossJoin(broadcast(lastNorm))
      .select(col("i"), r10(col("w") - col("l") * col("v")).as("r"))
    val residRel = resid.crossJoin(broadcast(lastNorm))
      .agg(max(col("l")).as("l"),
           sqrt(sum(r10(col("r") * col("r")).cast(D12)).cast("double")).as("rn"))
      .select((col("rn") / col("l")).as("residual_rel"))
    v.crossJoin(broadcast(lastNorm)).crossJoin(broadcast(trace))
      .crossJoin(broadcast(residRel))
      .select(col("i"), col("v").as("loading"), col("l").as("lambda"),
              (col("l") / col("tr")).as("explained_frac"), col("residual_rel"))
  }
}
