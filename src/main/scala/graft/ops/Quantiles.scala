package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructField, StructType}

/** Distributed EXACT interpolated quantiles via two-pass histogram
  * refinement — the scale path for what Spark's `percentile` aggregate
  * does by buffering every group value in aggregation state (fine for
  * bounded groups, the declared q41 anti-pattern at 100 TB).
  *
  * Pass 1 aggregates each group to (n, min, max) and a B-bucket
  * equal-width histogram — state is B counters per group regardless of
  * volume. The needed order statistics (floor/ceil of (n-1)·p) locate
  * their buckets through the histogram's running sum; pass 2 touches
  * ONLY rows in those target buckets (≈ n/B rows per stat), ranks them
  * with a window whose partitions are bucket-sized, and interpolates.
  * Both passes shuffle on the group key; the histogram and target-set
  * tables are grid-sized (≤ groups × buckets).
  *
  * The grid frames were ALWAYS driver-bounded — the distributed form
  * broadcasts them, which presumes they fit on the driver. So when the
  * group count is at most [[MaxDriverGroups]], the planning half runs
  * ON the driver instead: collect the stats and histogram aggregates
  * (two jobs), locate every order statistic's bucket in plain Scala,
  * and re-enter Spark with LOCAL relations for the stats / target
  * tables — a LocalTableScan broadcast builds on the driver thread
  * without scheduling a job, collapsing the 6-stage broadcast chain
  * (stats ⇒ hist ⇒ cum ⇒ targets ⇒ pass 2 ⇒ interpolate, each a
  * query-stage barrier under AQE) to 3 jobs. Above the cap the fully
  * distributed chain runs — same algorithm, same arithmetic, same
  * results, just without the driver shortcut.
  *
  * Result: (group, p, value) with `percentile`/`quantile_cont`
  * interpolation semantics. The interpolation is computed EXACTLY as
  * DuckDB's continuous Interpolator does —
  * `lo·(⌈k⌉−k) + hi·(k−⌊k⌋)`, with integer k returning lo directly —
  * NOT the algebraically-equal `lo + (k−⌊k⌋)·(hi−lo)`: the two differ
  * in double low bits (measured on events.value p=0.25/0.99), and the
  * driver's hash compare needs bit equality against `quantile_cont`.
  *
  * Two entry points sharing the refinement core:
  *  - [[exactQuantiles]]: over raw rows; per-group state is B counters,
  *    the corpus is scanned twice — the default at unbounded value
  *    cardinality (continuous doubles at 100 TB).
  *  - [[exactQuantilesFromCounts]]: over a pre-aggregated
  *    (group, value, count) frame; ZERO corpus passes here, and a
  *    caller that needs other value-level stats amortizes the one
  *    groupBy(group, value) pass across all of them (q119 computes its
  *    quantiles AND its final scaled aggregates from one such frame).
  *    State is distinct-values-sized — use when the value domain is
  *    discrete (prices, counts, grades), not for continuous doubles.
  */
object Quantiles {

  /** Group-count ceiling for driver-side bucket planning. Collected
    * driver state under the cap is ≤ cap × buckets histogram rows —
    * strictly less than what the distributed form would broadcast for
    * the same input, so this adds no new scale assumption. */
  val MaxDriverGroups = 4096

  /** Row ceiling for finishing pass 2 on the driver. The histogram
    * PROVES the bound before any collect happens (each target bucket
    * holds at most its cnt distinct values); above it, the bucket-local
    * window ranks distributedly. ~24 MB of (value, count) pairs. */
  val MaxDriverPass2Rows: Long = 1L << 20

  /** @param statsOpt optional precomputed per-group (group, n, mn, mx)
    *   frame — groups' non-null counts and exact min/max. When the
    *   input is a melt of a wide table, one no-Expand aggregate over
    *   the wide form produces this and saves a whole corpus pass;
    *   table-metadata stats work too. Must agree exactly with the data
    *   or bucket location breaks. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     ps: Seq[Double], buckets: Int = 1024,
                     statsOpt: Option[DataFrame] = None,
                     maxDriverGroups: Int = MaxDriverGroups): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val in = df.select(col(groupCol).as("g"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
    val statsDf = statsOpt
      .map(_.select(col(groupCol).as("g"), col("n"), col("mn"), col("mx")))
      .getOrElse(in.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx")))
    driverPlanned(in.sparkSession, statsDf, ps, buckets, groupCol, maxDriverGroups)(
      localStats => in.join(broadcast(localStats), Seq("g"))
        .groupBy(col("g"), bucketOf(col("v"), buckets).as("b"))
        .agg(count(lit(1)).as("cnt")),
      (localStats, targetBuckets) =>
        // pass 2 over only the target buckets — but rank DISTINCT
        // VALUES with cumulative counts, never rows: a tie-heavy bucket
        // (a discrete column can drop 10% of the corpus on one value)
        // would make a row_number partition corpus-sized, while its
        // distinct values stay few.
        in.join(broadcast(localStats), Seq("g"))
          .withColumn("b", bucketOf(col("v"), buckets))
          .join(broadcast(targetBuckets), Seq("g", "b"))
          .groupBy(col("g"), col("b"), col("v"))
          .agg(count(lit(1)).as("c"))
    ).getOrElse {
      // > MaxDriverGroups: fully distributed chain. The stats frame is
      // corpus-derived here, so materialize it once — every broadcast
      // otherwise re-scans and re-derives the corpus-sized input
      // (measured 3.5 s → 1 s on the q119 melt).
      val stats = statsDf.localCheckpoint(true)
      val hist = in.join(broadcast(stats), Seq("g"))
        .groupBy(col("g"), bucketOf(col("v"), buckets).as("b"))
        .agg(count(lit(1)).as("cnt"))
      refine(stats, hist, ps, groupCol) { targetBuckets =>
        in.join(broadcast(stats), Seq("g"))
          .withColumn("b", bucketOf(col("v"), buckets))
          .join(broadcast(targetBuckets), Seq("g", "b"))
          .groupBy(col("g"), col("b"), col("v"))
          .agg(count(lit(1)).as("c"))
      }
    }
  }

  /** Multi-metric quantiles over ONE input frame: melts `valCols` into
    * a long (metric, v) frame — values cast to double, exact for the
    * integer-like metrics callers pass (all < 2^53, and interpolation
    * arithmetic is double either way, so the results are bit-identical
    * to per-column [[exactQuantiles]] calls; QuantilesSpec pins it) —
    * and runs ONE driver-planned pass with the metric NAME as the
    * group. k metrics of the same frame cost one 3-job call instead of
    * k (q169 paid 3 calls = 9 driver-planned jobs over the same
    * customer rollup — the round-9 #3 fix). The caller should
    * `localCheckpoint` an expensive input: each pass re-reads the melt,
    * and the melt re-derives the input per pass.
    *
    * Result: (metric, p, value) — `metric` is the source column name. */
  def exactQuantilesMulti(df: DataFrame, valCols: Seq[String], ps: Seq[Double],
                          buckets: Int = 1024): DataFrame = {
    require(valCols.nonEmpty, "exactQuantilesMulti needs at least one column")
    val melted = df.select(explode(array(valCols.map(c =>
        struct(lit(c).as("metric"), col(c).cast("double").as("v"))): _*)).as("e"))
      .select(col("e.metric").as("metric"), col("e.v").as("v"))
    exactQuantiles(melted, "metric", "v", ps, buckets)
  }

  /** Quantiles from a pre-aggregated value-counts frame: one row per
    * (group, value) with its row count. No corpus access at all — both
    * the histogram and the target-bucket ranking re-aggregate `vc`,
    * which the caller should `localCheckpoint` if it was expensive to
    * build. Null values are ignored (as in [[exactQuantiles]]).
    *
    * @param vc one row per (groupCol, valCol) with its row count.
    *   Duplicate (group, value) rows SUM — the histogram aggregates
    *   them and the rank walks traverse equal values adjacently — so a
    *   per-row c=1 frame is a valid (if unaggregated) input; rows that
    *   REPEAT an already-aggregated count are the caller bug to avoid
    * @param cntCol the row-count column of `vc` */
  def exactQuantilesFromCounts(vc: DataFrame, groupCol: String, valCol: String,
                               cntCol: String, ps: Seq[Double],
                               buckets: Int = 1024,
                               statsOpt: Option[DataFrame] = None,
                               maxDriverGroups: Int = MaxDriverGroups): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val in = vc.select(col(groupCol).as("g"), col(valCol).as("v"),
        col(cntCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
    val statsDf = statsOpt
      .map(_.select(col(groupCol).as("g"), col("n"), col("mn"), col("mx")))
      .getOrElse(in.groupBy(col("g"))
        .agg(sum(col("c")).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx")))
    def withB(localStats: DataFrame) = in.join(broadcast(localStats), Seq("g"))
      .withColumn("b", bucketOf(col("v"), buckets))
    driverPlanned(vc.sparkSession, statsDf, ps, buckets, groupCol, maxDriverGroups)(
      localStats => withB(localStats).groupBy(col("g"), col("b"))
        .agg(sum(col("c")).as("cnt")),
      (localStats, targetBuckets) =>
        // vc is already one row per (g, v) with its count — restricting
        // to the target buckets is a semi-join, no re-aggregation
        withB(localStats).join(broadcast(targetBuckets), Seq("g", "b"))
          .select(col("g"), col("b"), col("v"), col("c"))
    ).getOrElse {
      val stats = statsDf
      val hist = withB(stats).groupBy(col("g"), col("b")).agg(sum(col("c")).as("cnt"))
      refine(stats, hist, ps, groupCol) { targetBuckets =>
        withB(stats).join(broadcast(targetBuckets), Seq("g", "b"))
          .select(col("g"), col("b"), col("v"), col("c"))
      }
    }
  }

  /** Exact interpolated quantile of the FULL frame (published as group
    * −1) plus each of `bits` hash-bit-filtered half-sample replicates
    * (groups 0..bits−1) — the BRR/half-sample shape q187/q196 use —
    * WITHOUT materializing the (bits+1)× exploded frame the naive
    * formulation pays three corpus passes over. The trick: every
    * replicate is a BIT of the same hash column, so ONE histogram pass
    * can carry all bits+1 group counts as bitmask sums — per-bucket
    * state is (bits+2) longs, grid-bounded like everything else here:
    *
    *  1. one aggregate → global (n, mn, mx) + per-bit counts (1 job);
    *  2. one B-bucket histogram with a count column per replicate
    *     (1 job, ≤ B×(bits+2) longs collected);
    *  3. the driver locates every replicate's ⌊k⌋/⌈k⌉ buckets through
    *     its own histogram column and fetches ONLY the union of target
    *     buckets (1 job, bound PROVEN by the histogram before the
    *     collect — each bucket contributes at most its full-frame
    *     count), then ranks/interpolates in plain Scala with the same
    *     IEEE arithmetic [[exactQuantiles]] compiles to.
    *
    * Replicate medians all sit near the full-frame quantile, so the
    * target-bucket union is a handful of buckets: the fetch is ≈
    * |union|·n/B rows. Above [[MaxDriverPass2Rows]] (or for non-double
    * value types) the method falls back to the exploded-frame
    * [[exactQuantiles]] chain — same algorithm, same results; the decade
    * sf0.1→sf10 stays on the fast path (n/B at sf10 ≈ 15k rows/bucket).
    * Empty replicates (possible only at toy n) drop out, mirroring the
    * exploded GROUP BY. Result: (groupCol: long, p, value), bit-equal to
    * `quantile_cont` per group (QuantilesSpec pins ≡ exploded).
    *
    * @param hashCol non-negative long hash with ≥ `bits` usable bits
    *   (replicate r keeps rows where bit r is set) */
  def exactQuantileBitReplicates(df: DataFrame, hashCol: String, valCol: String,
                                 bits: Int, p: Double, buckets: Int = 1024,
                                 groupCol: String = "r"): DataFrame = {
    require(bits >= 1 && bits <= 60, s"bits must be in [1,60]: $bits")
    require(p >= 0.0 && p <= 1.0, s"quantile fraction must be in [0,1]: $p")
    val session = df.sparkSession
    val in = df.select(col(hashCol).as("h"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
    def exploded = {
      val long = in
        .select(explode(sequence(lit(-1), lit(bits - 1))).as("rr"),
          col("h"), col("v"))
        .filter(col("rr") === -1 ||
          expr("(shiftright(h, cast(rr as int)) & 1) = 1"))
        .select(col("rr").cast("long").as("rr"), col("v"))
      exactQuantiles(long, "rr", "v", Seq(p), buckets)
        .withColumnRenamed("rr", groupCol)
    }
    val driverSafe = in.schema("v").dataType match {
      case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!driverSafe) return exploded
    val bitCols = (0 until bits).map(r =>
      sum(shiftright(col("h"), r).bitwiseAND(lit(1L))).as(s"c$r"))
    val statAggs = Seq(count(lit(1)).as("n"), min(col("v")).as("mn"),
      max(col("v")).as("mx")) ++ bitCols
    val st = in.agg(statAggs.head, statAggs.tail: _*).head()   // job 1
    val nAll = st.getLong(0)
    if (nAll == 0L)
      return session.createDataFrame(
        java.util.Collections.emptyList[Row](), StructType(Seq(
          StructField(groupCol, LongType, nullable = false),
          StructField("p", DoubleType, nullable = false),
          StructField("value", DoubleType))))
    val mn = st.getAs[Number]("mn").doubleValue
    val mx = st.getAs[Number]("mx").doubleValue
    val nOf: Int => Long = r => if (r < 0) nAll else st.getLong(3 + r)
    val bExpr = // literal-stats twin of bucketOf: identical arithmetic
      if (mx > mn)
        least(lit(buckets - 1),
          floor((col("v") - lit(mn)) / ((lit(mx) - lit(mn)) / buckets))
            .cast("int"))
      else lit(0)
    val hist = in.groupBy(bExpr.as("b"))
      .agg(count(lit(1)).as("call"),
        (0 until bits).map(r =>
          sum(shiftright(col("h"), r).bitwiseAND(lit(1L))).as(s"c$r")): _*)
      .collect().sortBy(_.getInt(0))                           // job 2
    val cntOf: (Row, Int) => Long = (row, r) =>
      if (r < 0) row.getLong(1) else row.getLong(2 + r)
    // locate each replicate's needed ranks: (r, rank) -> (bucket, local)
    case class Tgt(b: Int, local: Long)
    val targets = (-1 until bits).flatMap { r =>
      val n = nOf(r)
      if (n <= 0) Nil
      else {
        val k = (n - 1).toDouble * p
        Seq(math.floor(k).toLong, math.ceil(k).toLong).distinct.map { rank =>
          var below = 0L
          val hit = hist.find { row =>
            val c = cntOf(row, r); val lo = below; below += c
            rank >= lo && rank < lo + c
          }.getOrElse(throw new IllegalStateException(
            s"rank $rank of replicate $r not covered by histogram"))
          var lo = 0L
          hist.takeWhile(_.getInt(0) < hit.getInt(0))
            .foreach(row => lo += cntOf(row, r))
          (r, rank) -> Tgt(hit.getInt(0), rank - lo)
        }
      }
    }.toMap
    val neededBuckets = targets.values.map(_.b).toSet
    val fetchBound = hist.filter(r => neededBuckets(r.getInt(0)))
      .map(_.getLong(1)).sum
    if (fetchBound > MaxDriverPass2Rows) return exploded
    val fetched = in.withColumn("b", bExpr)
      .filter(col("b").isInCollection(neededBuckets))
      .select(col("b"), col("h"), col("v"))
      .collect()                                               // job 3
      .groupBy(_.getInt(0))
      .map { case (b, rows) =>
        b -> rows.map(r => (r.getLong(1), r.getAs[Number](2).doubleValue))
          .sortBy(_._2)
      }
    def statValue(r: Int, rank: Long): Double = {
      val tgt = targets((r, rank))
      val rows = fetched.getOrElse(tgt.b, Array.empty[(Long, Double)])
      var i = 0; var seen = 0L
      while (i < rows.length) {
        if (r < 0 || ((rows(i)._1 >> r) & 1L) == 1L) {
          if (seen == tgt.local) return rows(i)._2
          seen += 1L
        }
        i += 1
      }
      throw new IllegalStateException(
        s"order statistic $rank of replicate $r missing from fetched buckets")
    }
    val resRows = (-1 until bits).filter(nOf(_) > 0L).map { r =>
      val k = (nOf(r) - 1).toDouble * p
      val fl = math.floor(k); val ce = math.ceil(k)
      val lo = statValue(r, fl.toLong)
      val v = if (fl == ce) lo
              else lo * (ce - k) + statValue(r, ce.toLong) * (k - fl)
      Row(r.toLong, p, v)
    }
    session.createDataFrame(resRows.asJava, StructType(Seq(
      StructField(groupCol, LongType, nullable = false),
      StructField("p", DoubleType, nullable = false),
      StructField("value", DoubleType))))
  }

  /** bucket id: equal-width over [mn, mx]; constant groups (mx == mn)
    * collapse to bucket 0. Callers use the same expression for both
    * passes so assignment is bit-identical. Expects joined stats
    * columns mn/mx in scope. */
  private def bucketOf(v: Column, buckets: Int): Column =
    when(col("mx") > col("mn"),
      least(lit(buckets - 1),
        floor((v - col("mn")) / ((col("mx") - col("mn")) / buckets))
          .cast("int")))
      .otherwise(lit(0))

  /** The order statistics every requested p needs: k = (n−1)·p, ranks
    * ⌊k⌋ and ⌈k⌉. Pure per-group arithmetic — identical whether run in
    * Catalyst or on the driver (plain IEEE multiply of exact longs). */
  private def neededRanks(n: Long, ps: Seq[Double]): Seq[(Double, Double, Long)] =
    ps.flatMap { p =>
      val k = (n - 1).toDouble * p
      Seq((p, k, math.floor(k).toLong), (p, k, math.ceil(k).toLong))
    }

  /** Driver-side planning path: collect the grid-sized stats and
    * histogram aggregates, locate each order statistic's bucket in
    * plain Scala, and run ONE final distributed job whose broadcast
    * sides are all local relations (no broadcast-build jobs). Returns
    * None when the group count exceeds [[MaxDriverGroups]] — the one
    * extra cost of that probe is the stats aggregation job, which the
    * fallback would have run anyway (for the FromCounts path it is a
    * scan of the caller's checkpointed counts frame). */
  private def driverPlanned(session: SparkSession, statsDf: DataFrame,
                            ps: Seq[Double], buckets: Int, groupCol: String,
                            maxDriverGroups: Int)(
                            histOf: DataFrame => DataFrame,
                            pass2: (DataFrame, DataFrame) => DataFrame)
      : Option[DataFrame] = {
    val statsRows = statsDf.collect()                              // job 1
    if (statsRows.length > maxDriverGroups) return None
    val statsSchema = statsDf.schema
    val localStats = session.createDataFrame(statsRows.toSeq.asJava, statsSchema)
    val histRows = histOf(localStats).collect()                    // job 2
    // running "rows below bucket b" per group, in bucket order (absent
    // buckets contribute nothing, exactly like the window cumsum)
    val histByG = histRows.groupBy(_.get(0)).map { case (g, rows) =>
      var below = 0L
      g -> rows.sortBy(_.getInt(1)).map { r =>
        val cnt = r.getLong(2); val lo = below; below += cnt
        (r.getInt(1), lo, cnt)
      }
    }
    val gType = statsSchema("g").dataType
    // n ≤ 0 (possible only via a degenerate statsOpt) yields no rows for
    // that group — mirrors the distributed chain, where its negative
    // ranks match no bucket and drop out in the targets join
    val needsRows = statsRows.filter(_.getAs[Number]("n").longValue > 0).flatMap { sr =>
      val n = sr.getAs[Number]("n").longValue
      neededRanks(n, ps).map { case (p, k, rank) => Row(sr.get(0), p, k, rank) }
    }
    // locate each needed rank's bucket: below <= rank < below + cnt
    val targetRows = needsRows.map(r => (r.get(0), r.getLong(3))).distinct.map {
      case (g, rank) =>
        val (b, below, _) = histByG.getOrElse(g, Array.empty[(Int, Long, Long)])
          .find { case (_, lo, cnt) => rank >= lo && rank < lo + cnt }
          .getOrElse(throw new IllegalStateException(
            s"rank $rank of group $g not covered by histogram — stats disagree with data"))
        Row(g, rank, b, rank - below)
    }
    val targets = session.createDataFrame(targetRows.toSeq.asJava, StructType(Seq(
      StructField("g", gType), StructField("rank", LongType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("local", LongType, nullable = false))))
    val targetBuckets = targets.select(col("g"), col("b")).distinct()
    val vcDf = pass2(localStats, targetBuckets)
    // The histogram tells the driver EXACTLY how many rows pass 2 can
    // produce (each target bucket's cnt bounds its distinct values), so
    // the collect-vs-distribute choice is made from facts already in
    // hand, not a guess: small target buckets → collect them and finish
    // ranking + interpolation here (one scan job, zero exchanges);
    // large → the distributed window path. Long/decimal values skip the
    // driver finish (their ordering must not round-trip through double).
    val pass2Bound = targetRows.map(r => (r.get(0), r.getInt(2))).distinct.map {
      case (g, b) => histByG(g).collectFirst { case (`b`, _, cnt) => cnt }.getOrElse(0L)
    }.sum
    val driverSafeValues = vcDf.schema("v").dataType match {
      case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (driverSafeValues && pass2Bound <= MaxDriverPass2Rows) {
      val byGB = vcDf.collect()                                    // job 3
        .groupBy(r => (r.get(0), r.getInt(1)))
        .map { case (k, rows) =>
          k -> rows.map(r => (r.getAs[Number](2).doubleValue, r.getLong(3)))
                   .sortBy(_._1)
        }
      val statValue = targetRows.map { t =>
        val key = (t.get(0), t.getInt(2)); val local = t.getLong(3)
        val vals = byGB.getOrElse(key, Array.empty[(Double, Long)])
        var below = 0L; var i = 0; var found: Option[Double] = None
        while (found.isEmpty && i < vals.length) {
          val (v, c) = vals(i)
          if (local >= below && local < below + c) found = Some(v)
          below += c; i += 1
        }
        (t.get(0), t.getLong(1)) -> found.getOrElse(
          throw new IllegalStateException(
            s"order statistic ${t.getLong(1)} of group ${t.get(0)} missing from pass 2"))
      }.toMap
      // interpolate with the same IEEE arithmetic the Catalyst
      // expression uses (see object doc) — plain JVM doubles either way
      val resRows = needsRows.map(r => (r.get(0), r.getDouble(1), r.getDouble(2)))
        .distinct.map { case (g, p, k) =>
          val fl = math.floor(k); val ce = math.ceil(k)
          val lo = statValue((g, fl.toLong))
          val v = if (fl == ce) lo
                  else lo * (ce - k) + statValue((g, ce.toLong)) * (k - fl)
          Row(g, p, v)
        }
      Some(session.createDataFrame(resRows.toSeq.asJava, StructType(Seq(
        StructField(groupCol, gType), StructField("p", DoubleType, nullable = false),
        StructField("value", DoubleType)))))
    } else {
      val needs = session.createDataFrame(needsRows.toSeq.asJava, StructType(Seq(
        StructField("g", gType), StructField("p", DoubleType, nullable = false),
        StructField("k", DoubleType, nullable = false),
        StructField("rank", LongType, nullable = false))))
      Some(interpolate(needs, targets, vcDf, groupCol))
    }
  }

  /** Shared distributed refinement (the > MaxDriverGroups path): locate
    * each needed order statistic's bucket through the histogram cumsum,
    * rank the target buckets' distinct values by cumulative count via
    * `pass2` (which receives the grid-sized (g, b) target-bucket
    * frame), and interpolate. */
  private def refine(stats: DataFrame, hist: DataFrame, ps: Seq[Double],
                     groupCol: String)
                    (pass2: DataFrame => DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // cum feeds exactly one consumer (the targets join) — a checkpoint
    // here would cost a materialization job and save nothing
    val cum = hist.withColumn("below", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
    val needs = stats.select(col("g"), col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p"))
      .withColumn("k", (col("n") - 1).cast("double") * col("p"))
      .select(col("g"), col("p"), col("k"),
        explode(array(floor(col("k")).cast("long"),
                      ceil(col("k")).cast("long"))).as("rank"))
    val ranks = needs.select(col("g"), col("rank")).distinct()
    // locate each rank's bucket: below <= rank < below + cnt
    val targets = ranks.join(broadcast(cum), Seq("g"))
      .filter(col("rank") >= col("below") && col("rank") < col("below") + col("cnt"))
      .select(col("g"), col("rank"), col("b"), (col("rank") - col("below")).as("local"))
      .localCheckpoint(true)
    val targetBuckets = targets.select(col("g"), col("b")).distinct()
    interpolate(needs, targets, pass2(targetBuckets), groupCol)
  }

  /** Rank the target buckets' distinct values by cumulative count, pick
    * each needed order statistic, and interpolate (see object doc for
    * the exact arithmetic). `valCounts` is (g, b, v, c) restricted to
    * target buckets; `targets`/`needs` are grid-sized. */
  private def interpolate(needs: DataFrame, targets: DataFrame,
                          valCounts: DataFrame, groupCol: String): DataFrame = {
    // the order statistic at local index i is the value whose
    // cumulative-count range contains i
    val wVal = Window.partitionBy(col("g"), col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val statValues = valCounts
      .withColumn("vbelow", coalesce(sum(col("c")).over(wVal), lit(0L)))
      .join(broadcast(targets), Seq("g", "b"))
      .filter(col("local") >= col("vbelow") &&
              col("local") < col("vbelow") + col("c"))
      .select(col("g"), col("rank"), col("v"))
    // interpolate with DuckDB's exact arithmetic (see object doc):
    // integer k → lo; else lo·(⌈k⌉−k) + hi·(k−⌊k⌋). For integer k the
    // two rank branches resolve to the same row (lo == hi).
    needs.join(statValues, Seq("g", "rank"))
      .groupBy(col("g"), col("p"), col("k"))
      .agg(max(when(col("rank") === floor(col("k")).cast("long"), col("v"))).as("lo"),
           max(when(col("rank") === ceil(col("k")).cast("long"), col("v"))).as("hi"))
      .select(col("g").as(groupCol), col("p"),
        when(floor(col("k")) === ceil(col("k")), col("lo"))
          .otherwise(col("lo") * (ceil(col("k")) - col("k")) +
                     col("hi") * (col("k") - floor(col("k"))))
          .as("value"))
  }

  /** Exact quantile EDGES of `valCol` plus per-edge-bin
    * (count, flag-count) tallies — the q196 bit-replicate recipe
    * applied to the quantile-cut-then-bin shape (q157 WOE, q175 gains;
    * VERDICT r13 #3): those queries paid the quantile operator's three
    * jobs PLUS a fourth corpus binning aggregate, but the bin tallies
    * are per-bucket aggregate state, so they ride the quantile's own
    * passes for free. THREE corpus jobs total:
    *
    *  1. stats — (n, min, max); bin flag totals come entirely from
    *     the histogram and fetch passes below (ADVICE r14: an earlier
    *     flag-total rider here was never read and is gone);
    *  2. histogram — per-bucket (count, flag-count);
    *  3. target-bucket fetch — per distinct value (count, flag-count)
    *     for only the buckets the edge order-statistics live in
    *     (bound PROVEN from the histogram before the collect, the
    *     [[exactQuantileBitReplicates]] discipline).
    *
    * Binning (bin(v) = Σ_p [v > qₚ], the branch-free comparison chain
    * the callers compiled to Catalyst) then needs NO corpus pass: an
    * edge is either an order statistic itself or interpolated STRICTLY
    * between two consecutive ones, so it can only fall inside a target
    * bucket or an EMPTY bucket — every non-target bucket's rows land in
    * one bin, decided from bucket ids alone (equal-width buckets are
    * monotone in v), and only the fetched values compare per-value with
    * the same IEEE `v > qₚ` the Catalyst chain used. Interpolation is
    * the object-doc DuckDB-exact arithmetic; results are bit-identical
    * to exactQuantiles + a binning aggregate (QuantilesSpec pins it).
    *
    * Returns (edges in `ps` order, per-bin (n, nFlag) arrays of length
    * ps.size + 1). Null values are excluded from edges AND tallies
    * (callers pass non-null measures). When the proven fetch bound
    * exceeds [[MaxDriverPass2Rows]] (a pathological distribution where
    * ~every row shares the edge buckets) the call DEGRADES instead of
    * dying (ADVICE r15): [[edgeBinnedFallback]] computes the edges
    * through the never-throwing [[exactQuantiles]] chain and pays one
    * extra corpus binning aggregate, loud on stderr.
    * Scale: jobs 1-2 are map + grid aggregates; job 3 collects ≈
    * |target buckets|·n/B distinct values — at 100 TB raise `buckets`
    * so n/B stays driver-sized, same as every driver-planned path. */
  def edgeBinnedCounts(df: DataFrame, valCol: String, flagCol: String,
                       ps: Seq[Double], buckets: Int = 1024)
      : (Seq[Double], Array[Long], Array[Long]) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val in = df.select(col(valCol).as("v"), col(flagCol).as("f"))
      .filter(col("v").isNotNull)
    val st = in.agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
                    max(col("v")).as("mx")).head()              // job 1
    val n = st.getLong(0)
    require(n > 0, "edgeBinnedCounts: empty input")
    val mn = st.getAs[Number]("mn").doubleValue
    val mx = st.getAs[Number]("mx").doubleValue
    val bExpr =
      if (mx > mn)
        least(lit(buckets - 1),
          floor((col("v") - lit(mn)) / ((lit(mx) - lit(mn)) / buckets))
            .cast("int"))
      else lit(0)
    val hist = in.groupBy(bExpr.as("b"))
      .agg(count(lit(1)).as("c"), count(when(col("f"), 1)).as("nf"))
      .collect().sortBy(_.getInt(0))                            // job 2
    val below = {
      var run = 0L
      hist.map { r => val lo = run; run += r.getLong(1); r.getInt(0) -> lo }.toMap
    }
    def bucketOfRank(rank: Long): Int =
      hist.find { r => val lo = below(r.getInt(0))
        rank >= lo && rank < lo + r.getLong(1) }
        .getOrElse(throw new IllegalStateException(
          s"edgeBinnedCounts: rank $rank not covered by histogram")).getInt(0)
    val kOf = ps.map(p => (n - 1).toDouble * p)
    val rankBuckets = kOf.flatMap(k =>
      Seq(math.floor(k).toLong, math.ceil(k).toLong)).distinct
      .map(r => r -> bucketOfRank(r)).toMap
    val targetB = rankBuckets.values.toSet
    val fetchBound = hist.filter(r => targetB(r.getInt(0))).map(_.getLong(1)).sum
    if (fetchBound > MaxDriverPass2Rows) {
      System.err.println(s"[quantiles] edgeBinnedCounts: target-bucket fetch " +
        s"$fetchBound exceeds the driver bound $MaxDriverPass2Rows — " +
        "degrading to the quantiles-then-bin path")
      return edgeBinnedFallback(in, ps)
    }
    val fetched = in.withColumn("b", bExpr)
      .filter(col("b").isInCollection(targetB))
      .groupBy(col("b"), col("v"))
      .agg(count(lit(1)).as("c"), count(when(col("f"), 1)).as("nf"))
      .collect()                                                // job 3
    val byB = fetched.groupBy(_.getInt(0)).map { case (b, rows) =>
      b -> rows.map(r => (r.getAs[Number](1).doubleValue, r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    }
    def valueAt(rank: Long): Double = {
      val b = rankBuckets(rank)
      var local = rank - below(b)
      val vals = byB.getOrElse(b, Array.empty[(Double, Long, Long)])
      var i = 0
      while (i < vals.length) {
        if (local < vals(i)._2) return vals(i)._1
        local -= vals(i)._2; i += 1
      }
      throw new IllegalStateException(
        s"edgeBinnedCounts: rank $rank missing from fetch")
    }
    val edges = kOf.map { k =>
      val fl = math.floor(k); val ce = math.ceil(k)
      val lo = valueAt(fl.toLong)
      if (fl == ce) lo else lo * (ce - k) + valueAt(ce.toLong) * (k - fl)
    }
    val edgeUpperB = kOf.map(k => rankBuckets(math.ceil(k).toLong))
    val cnt = new Array[Long](ps.size + 1)
    val flag = new Array[Long](ps.size + 1)
    hist.iterator.filterNot(r => targetB(r.getInt(0))).foreach { r =>
      val bin = edgeUpperB.count(ub => r.getInt(0) > ub)
      cnt(bin) += r.getLong(1); flag(bin) += r.getLong(2)
    }
    fetched.foreach { r =>
      val v = r.getAs[Number](1).doubleValue
      val bin = edges.count(q => v > q)
      cnt(bin) += r.getLong(2); flag(bin) += r.getLong(3)
    }
    (edges, cnt, flag)
  }

  /** [[edgeBinnedCounts]] minus its stats job, for NON-NEGATIVE double
    * values — the bit-prefix histogram (see [[nonNegScalarQuantiles]])
    * needs no (mn, mx), so the quantile-cut-then-bin shape costs TWO
    * corpus jobs (q157/q175, round 15):
    *
    *  1. bit-bucket histogram — per-bucket (count, flag-count, min,
    *     max); n rides along, the stats pass is GONE, and the riding
    *     min/max reject order-breaking inputs (negatives, NaN/Inf)
    *     loud;
    *  2. target-bucket fetch — per distinct value (count, flag-count),
    *     bound proven from the histogram before the collect.
    *
    * The binning argument transfers VERBATIM from [[edgeBinnedCounts]]:
    * bit-prefix buckets are monotone in v exactly like equal-width
    * buckets (that is the whole point of the bit order), so non-target
    * buckets still land in one bin decided from bucket ids alone, and
    * only fetched values pay the per-value IEEE `v > qₚ`. Results are
    * bit-identical to [[edgeBinnedCounts]] on the same input
    * (QuantilesSpec pins edges, bins, AND flag tallies). A fetch bound
    * past [[MaxDriverPass2Rows]] DEGRADES to [[edgeBinnedFallback]]
    * loud on stderr (ADVICE r15 — shipped queries must not die on
    * tie-massed data); same −0.0 normalization as the siblings.
    * Planner core shared across the nonNeg* trio ([[planBitBuckets]],
    * round 16 — VERDICT r15 #5). */
  def nonNegEdgeBinnedCounts(df: DataFrame, valCol: String, flagCol: String,
                             ps: Seq[Double], shift: Int = 44)
      : (Seq[Double], Array[Long], Array[Long]) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    require(shift >= 32 && shift <= 60, s"bit-bucket shift out of [32,60]: $shift")
    val in = df.select(nonNegV(col(valCol)).as("v"), col(flagCol).as("f"))
      .filter(col("v").isNotNull)
    val bkt = bitBucket(col("v"), shift)
    val hist = in.groupBy(bkt.as("b"))
      .agg(count(lit(1)).as("cnt"), count(when(col("f"), 1)).as("nf"),
           min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().sortBy(_.getLong(0))                             // job 1
    require(hist.nonEmpty, "nonNegEdgeBinnedCounts: empty input")
    requireBitOrderSafe(hist.head.getLong(0), hist.head.getDouble(3),
      hist.iterator.map(_.getDouble(4)),
      "nonNegEdgeBinnedCounts", "edgeBinnedCounts")
    val plan = planBitBuckets(
      hist.map(r => (r.getLong(0), r.getLong(1))), ps, "nonNegEdgeBinnedCounts")
    if (plan.fetchBound > MaxDriverPass2Rows) {
      System.err.println(s"[quantiles] nonNegEdgeBinnedCounts: target-bucket " +
        s"fetch ${plan.fetchBound} exceeds the driver bound $MaxDriverPass2Rows " +
        "— degrading to the quantiles-then-bin path")
      return edgeBinnedFallback(in, ps)
    }
    val fetched = in.withColumn("b", bkt)
      .filter(col("b").isInCollection(plan.targetB))
      .groupBy(col("b"), col("v"))
      .agg(count(lit(1)).as("c"), count(when(col("f"), 1)).as("nf"))
      .collect()                                                  // job 2
    val byB = hist2pairs(fetched)
    def valueAt(rank: Long): Double = {
      val b = plan.rankBucket(rank)
      walkValue(byB.getOrElse(b, Array.empty), rank - plan.below(b),
        "nonNegEdgeBinnedCounts", rank)
    }
    val edges = plan.kOf.map(k =>
      interp(k, valueAt(math.floor(k).toLong), valueAt(math.ceil(k).toLong)))
    val edgeUpperB = plan.kOf.map(k => plan.rankBucket(math.ceil(k).toLong))
    val cnt = new Array[Long](ps.size + 1)
    val flag = new Array[Long](ps.size + 1)
    hist.iterator.filterNot(r => plan.targetB(r.getLong(0))).foreach { r =>
      val bin = edgeUpperB.count(ub => r.getLong(0) > ub)
      cnt(bin) += r.getLong(1); flag(bin) += r.getLong(2)
    }
    fetched.foreach { r =>
      val v = r.getDouble(1)
      val bin = edges.count(q => v > q)
      cnt(bin) += r.getLong(2); flag(bin) += r.getLong(3)
    }
    (edges, cnt, flag)
  }

  /** Single-group EXACT interpolated quantiles of a NON-NEGATIVE
    * double column in TWO corpus passes with NO prior stats pass —
    * q188's floor shave (VERDICT r14 #3: the conformal chain is
    * job-floor-bound and strictly serial, so the win is deleting a
    * link, not overlapping two). [[exactQuantiles]]' equal-width
    * histogram needs (mn, mx) before it can bin, forcing the serial
    * stats → histogram dependency; for non-negative IEEE doubles the
    * RAW BIT PATTERN is order-preserving under signed-long comparison
    * ([[graft.functions.DoubleBitsExpr]]), so a histogram keyed by
    * `doubleToRawLongBits(v) >> shift` needs no stats at all — bucket
    * ids are monotone in v by construction. Jobs:
    *
    *  1. bit-prefix histogram — groupBy(bits(v) >> shift) with
    *     (cnt, min, max) per bucket; the id domain is ≤ 2^(64−shift)
    *     (default shift 44 → ≤ 2^20, and SPARSE: only the exponent ×
    *     8-mantissa-bit cells the data populates — a few hundred in
    *     practice). n = Σ cnt rides along, so the separate
    *     (n, mn, mx) job is GONE; the riding per-bucket min/max cost
    *     nothing extra and let the driver REJECT inputs that would
    *     break bit order (negatives, NaN, ±Inf) after the fact, loud.
    *  2. target-bucket fetch — per-distinct-value counts for only the
    *     buckets the ⌊k⌋/⌈k⌉ order statistics land in, bound PROVEN
    *     from the histogram before the collect (the established
    *     driver-planned discipline); a bound past
    *     [[MaxDriverPass2Rows]] (pathological tie-mass) DEGRADES to
    *     the [[exactQuantiles]] chain automatically, loud on stderr
    *     (ADVICE r15) — that chain's own bound decides driver-finish
    *     vs fully distributed ranking, so no input shape can kill a
    *     shipped query.
    *
    * Ranking + interpolation run on the driver with the object-doc
    * DuckDB-exact arithmetic; results are BIT-IDENTICAL to
    * [[exactQuantiles]] on the same input (QuantilesSpec pins random
    * frames, ties, zeros, subnormals, n = 1, and the rejection cases).
    * −0.0 is normalized to +0.0 at intake (numerically equal, and
    * grouping would fold them anyway; keeps bit order total). Returns
    * (n, p → value); n = 0 returns an empty map — quantile over zero
    * rows is undefined and callers publish NULL, matching
    * `quantile_cont` of an empty relation.
    * Scale: both jobs are map-side-combined aggregates over the
    * corpus; driver state is the sparse histogram plus the proven
    * fetch. At 100 TB lower `shift` (more buckets) to keep the
    * per-bucket row mass driver-sized — same knob as `buckets`
    * elsewhere. */
  def nonNegScalarQuantiles(df: DataFrame, valCol: String,
                            ps: Seq[Double], shift: Int = 44)
      : (Long, Map[Double, Double]) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    require(shift >= 32 && shift <= 60, s"bit-bucket shift out of [32,60]: $shift")
    val in = df.select(nonNegV(col(valCol)).as("v"))
      .filter(col("v").isNotNull)
    val bkt = bitBucket(col("v"), shift)
    val histRows = in.groupBy(bkt.as("b"))
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("mn"),
           max(col("v")).as("mx"))
      .collect().sortBy(_.getLong(0))                             // job 1
    if (histRows.isEmpty) return (0L, Map.empty)
    requireBitOrderSafe(histRows.head.getLong(0), histRows.head.getDouble(2),
      histRows.iterator.map(_.getDouble(3)),
      "nonNegScalarQuantiles", "exactQuantiles")
    val plan = planBitBuckets(
      histRows.map(r => (r.getLong(0), r.getLong(1))), ps,
      "nonNegScalarQuantiles")
    if (plan.fetchBound > MaxDriverPass2Rows) {
      System.err.println(s"[quantiles] nonNegScalarQuantiles: target-bucket " +
        s"fetch ${plan.fetchBound} exceeds the driver bound $MaxDriverPass2Rows " +
        "— degrading to exactQuantiles")
      val rows = exactQuantiles(in.withColumn("g", lit(1)), "g", "v", ps)
        .collect()
      return (plan.n, rows.map(r => r.getDouble(1) -> r.getDouble(2)).toMap)
    }
    val fetched = in.withColumn("b", bkt)
      .filter(col("b").isInCollection(plan.targetB))
      .groupBy(col("b"), col("v")).agg(count(lit(1)).as("c"))
      .collect()                                                  // job 2
    val byB = hist2pairs(fetched)
    def valueAtRank(rank: Long): Double = {
      val b = plan.rankBucket(rank)
      walkValue(byB.getOrElse(b, Array.empty), rank - plan.below(b),
        "nonNegScalarQuantiles", rank)
    }
    val res = ps.zip(plan.kOf).distinct.map { case (p, k) =>
      p -> interp(k, valueAtRank(math.floor(k).toLong),
                     valueAtRank(math.ceil(k).toLong))
    }.toMap
    (plan.n, res)
  }

  /** [[nonNegScalarQuantiles]]' grouped sibling over a
    * (group, value, count) frame (duplicate (g, v) rows sum, as in
    * [[exactQuantilesFromCounts]] — a per-row c=1 melt is valid
    * input) — [[exactQuantilesFromCounts]] minus
    * its stats job, for NON-NEGATIVE double values (q119's floor
    * shave, round 15): the bit-prefix histogram needs no (mn, mx), so
    * ONE groupBy(g, bits(v) >> shift) job replaces the stats +
    * histogram pair, and the riding per-bucket (rows, min, max) give
    * the driver n per group, the loud negative/NaN rejection, AND the
    * exact fetch bound (rows here = distinct values, the thing job 2
    * actually collects — tighter than the count-mass bound). Job 2
    * fetches only the target (g, bucket) cells' (v, c) rows through a
    * broadcast-local semi-join. Ranking + interpolation run on the
    * driver with the object-doc DuckDB-exact arithmetic; the result
    * (group, p, value) returns as a LOCAL relation, so downstream
    * broadcast consumers build without scheduling jobs. BIT-IDENTICAL
    * to [[exactQuantilesFromCounts]] on the same frame (QuantilesSpec
    * pins weighted/tied/multi-group generated frames). −0.0 normalizes
    * to +0.0 at intake; groups arrive only via the frame, so an empty
    * group simply has no output rows — same as the derived-stats path.
    * A fetch bound past [[MaxDriverPass2Rows]] DEGRADES to
    * [[exactQuantilesFromCounts]] automatically, loud on stderr
    * (ADVICE r15). Scale: job 1's state is ≤ groups × 2^(64−shift)
    * sparse cells; job 2's collect is PROVEN bounded before it runs.
    * Lower `shift` at larger value mass, as everywhere. */
  def nonNegQuantilesFromCounts(vc: DataFrame, groupCol: String,
                                valCol: String, cntCol: String,
                                ps: Seq[Double], shift: Int = 44): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    require(shift >= 32 && shift <= 60, s"bit-bucket shift out of [32,60]: $shift")
    val session = vc.sparkSession
    val in = vc.select(col(groupCol).as("g"), nonNegV(col(valCol)).as("v"),
        col(cntCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
    val bkt = bitBucket(col("v"), shift)
    val histRows = in.groupBy(col("g"), bkt.as("b"))
      .agg(sum(col("c")).as("cnt"), count(lit(1)).as("nv"),
           min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()                                                  // job 1
    val gType = vc.schema(groupCol).dataType
    val outSchema = StructType(Seq(
      StructField(groupCol, gType),
      StructField("p", DoubleType, nullable = false),
      StructField("value", DoubleType)))
    if (histRows.isEmpty)
      return session.createDataFrame(
        java.util.Collections.emptyList[Row](), outSchema)
    val byG = histRows.groupBy(_.get(0)).map { case (g, rows) =>
      g -> rows.sortBy(_.getLong(1))
    }
    byG.foreach { case (g, rows) =>
      requireBitOrderSafe(rows.head.getLong(1), rows.head.getDouble(4),
        rows.iterator.map(_.getDouble(5)),
        "nonNegQuantilesFromCounts", "exactQuantilesFromCounts",
        s" in group $g")
    }
    val plans = byG.map { case (g, rows) =>
      g -> planBitBuckets(rows.map(r => (r.getLong(1), r.getLong(2))), ps,
        s"nonNegQuantilesFromCounts group $g")
    }
    // .toSeq first: flatMap on a Map with tuple results would rebuild
    // a Map KEYED BY GROUP and silently keep one target bucket per
    // group (the spec caught exactly this)
    val targetCells = plans.toSeq.flatMap { case (g, pl) =>
      pl.targetB.map(b => (g, b)) }.toSet
    // the PROVEN fetch bound counts DISTINCT values (nv) in the target
    // cells — tighter than the row-mass bound of the raw-row paths
    val fetchBound = histRows
      .filter(r => targetCells((r.get(0), r.getLong(1)))).map(_.getLong(3)).sum
    if (fetchBound > MaxDriverPass2Rows) {
      System.err.println(s"[quantiles] nonNegQuantilesFromCounts: target-cell " +
        s"fetch $fetchBound exceeds the driver bound $MaxDriverPass2Rows — " +
        "degrading to exactQuantilesFromCounts")
      return exactQuantilesFromCounts(in, "g", "v", "c", ps)
        .withColumnRenamed("g", groupCol)
    }
    val targets = session.createDataFrame(
      targetCells.toSeq.map { case (g, b) => Row(g, b) }.asJava,
      StructType(Seq(StructField("g", gType),
                     StructField("b", LongType, nullable = false))))
    val fetched = in.withColumn("b", bkt)
      .join(broadcast(targets), Seq("g", "b"))
      .select(col("g"), col("b"), col("v"), col("c"))
      .collect()                                                  // job 2
    val valsByGB = fetched.groupBy(r => (r.get(0), r.getLong(1)))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getDouble(2), r.getLong(3))).sortBy(_._1) }
    val resRows = plans.toSeq.flatMap { case (g, pl) =>
      def valueAtRank(rank: Long): Double = {
        val b = pl.rankBucket(rank)
        walkValue(valsByGB.getOrElse((g, b), Array.empty),
          rank - pl.below(b), s"nonNegQuantilesFromCounts group $g", rank)
      }
      ps.zip(pl.kOf).distinct.map { case (p, k) =>
        Row(g, p, interp(k, valueAtRank(math.floor(k).toLong),
                            valueAtRank(math.ceil(k).toLong)))
      }
    }
    session.createDataFrame(resRows.asJava, outSchema)
  }

  // ──────────────────────────────────────────────────────────────────
  // shared bit-bucket core (VERDICT r15 #5): ONE planner the scalar /
  // grouped / edge-binned nonNeg* entries all drive. Plain driver-side
  // Scala over collected grid-sized aggregates — no corpus access.
  // ──────────────────────────────────────────────────────────────────

  /** −0.0-normalized double intake: numerically equal to +0.0, and
    * grouping would fold them anyway; keeps bit order total. */
  private def nonNegV(raw: Column): Column = {
    val d = raw.cast("double")
    when(d === 0.0, lit(0.0)).otherwise(d)
  }

  /** order-preserving IEEE bit-prefix bucket id
    * ([[graft.functions.DoubleBitsExpr]], codegen'd). */
  private def bitBucket(v: Column, shift: Int): Column =
    shiftright(graft.functions.DoubleBits.bits(v), shift)

  /** bit order is numeric order only for non-negative finite doubles —
    * reject order-breakers LOUD from the riding per-bucket min/max
    * (QuantilesSpec pins the rejections). Unlike the fetch bound this
    * is caller misuse, not a data-shape surprise, so it does NOT
    * degrade silently. */
  private def requireBitOrderSafe(firstBucket: Long, firstMin: Double,
      maxes: Iterator[Double], who: String, alt: String,
      where: String = ""): Unit = {
    require(firstBucket >= 0L && firstMin >= 0.0,
      s"$who: negative values$where break bit-bucket order — use $alt")
    require(maxes.forall(mx => !mx.isNaN && !mx.isInfinite),
      s"$who: NaN/Inf values$where break bit-bucket order — use $alt")
  }

  /** Single-group driver plan over a collected bit-bucket histogram —
    * (bucket, row-mass) pairs SORTED by bucket id: total n, the needed
    * k = (n−1)·p per fraction, cumulative mass below each bucket, the
    * bucket every ⌊k⌋/⌈k⌉ order statistic lives in, and the row-mass
    * fetch bound over the target buckets (PROVEN before any collect —
    * the established driver-planned discipline). n = 0 plans nothing:
    * callers publish empty results, matching `quantile_cont` of an
    * empty relation. */
  private case class BitPlan(n: Long, kOf: Seq[Double],
      below: Map[Long, Long], rankBucket: Map[Long, Long],
      targetB: Set[Long], fetchBound: Long)

  private def planBitBuckets(bc: Array[(Long, Long)], ps: Seq[Double],
                             who: String): BitPlan = {
    var run = 0L
    val below = bc.map { case (b, c) => val lo = run; run += c; b -> lo }.toMap
    val n = run
    if (n == 0L)
      return BitPlan(0L, Nil, below, Map.empty, Set.empty, 0L)
    def bucketOfRank(rank: Long): Long =
      bc.find { case (b, c) => val lo = below(b); rank >= lo && rank < lo + c }
        .getOrElse(throw new IllegalStateException(
          s"$who: rank $rank not covered by histogram"))._1
    val kOf = ps.map(p => (n - 1).toDouble * p)
    val rankBucket = kOf.flatMap(k =>
        Seq(math.floor(k).toLong, math.ceil(k).toLong)).distinct
      .map(r => r -> bucketOfRank(r)).toMap
    val targetB = rankBucket.values.toSet
    val fetchBound = bc.collect { case (b, c) if targetB(b) => c }.sum
    BitPlan(n, kOf, below, rankBucket, targetB, fetchBound)
  }

  /** collected fetch rows (b: long, v: double, c: long, ...) → per
    * bucket, value-SORTED (v, c) pairs for the rank walk. */
  private def hist2pairs(fetched: Array[Row]): Map[Long, Array[(Double, Long)]] =
    fetched.groupBy(_.getLong(0)).map { case (b, rows) =>
      b -> rows.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
    }

  /** walk a bucket's SORTED (value, row-mass) pairs to the order
    * statistic at LOCAL index `local0` within the bucket. */
  private def walkValue(vals: Array[(Double, Long)], local0: Long,
                        who: String, rank: Long): Double = {
    var local = local0; var i = 0
    while (i < vals.length) {
      val (v, c) = vals(i)
      if (local < c) return v
      local -= c; i += 1
    }
    throw new IllegalStateException(s"$who: rank $rank missing from fetch")
  }

  /** DuckDB-exact interpolation (see object doc); `hi` is by-name so
    * an integer k never fetches the ceil statistic. */
  private def interp(k: Double, lo: Double, hi: => Double): Double = {
    val fl = math.floor(k); val ce = math.ceil(k)
    if (fl == ce) lo else lo * (ce - k) + hi * (k - fl)
  }

  /** Degraded edge-binned path for fetch bounds past
    * [[MaxDriverPass2Rows]] (ADVICE r15 — degrade, don't die): edges
    * through the never-throwing [[exactQuantiles]] chain (whose own
    * bound decides driver-finish vs distributed window ranking), then
    * ONE corpus binning aggregate applying the same IEEE `v > qₚ`
    * literal comparison chain the fused paths apply per fetched value
    * — the pre-fusion q157 shape: correct on any tie mass, two extra
    * jobs. `in` is the caller's normalized non-null (v, f) frame. */
  private def edgeBinnedFallback(in: DataFrame, ps: Seq[Double])
      : (Seq[Double], Array[Long], Array[Long]) = {
    val qs = exactQuantiles(in.select(lit(1).as("g"), col("v")), "g", "v", ps)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    val edges = ps.map(qs)
    val binExpr = edges.map(q => when(col("v") > lit(q), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val binned = in.groupBy(binExpr.as("bin"))
      .agg(count(lit(1)).as("c"), count(when(col("f"), 1)).as("nf"))
      .collect()
    val cnt = new Array[Long](ps.size + 1)
    val flag = new Array[Long](ps.size + 1)
    binned.foreach { r =>
      cnt(r.getInt(0)) += r.getLong(1); flag(r.getInt(0)) += r.getLong(2) }
    (edges, cnt, flag)
  }

  /** ONE-JOB exact quantiles for counts frames PROVEN driver-small at
    * runtime (round 16): the histogram-refinement machinery exists to
    * avoid collecting a large frame, but many real counts frames are
    * bounded by DOMAIN, not data volume (q168's priority ×
    * day-range grid) — for those, the hist + fetch pair is
    * pure job-floor overhead. The cap is a SAFETY bound, not an
    * efficiency threshold: q119's 583k-row frame (under the cap at
    * sf0.1) measured a net LOSS on this path — 1.01 → 1.53 s, because
    * CollectLimit's incremental partition scans plus the driver-side
    * sort of 583k generic Rows outweigh the two ~0.1 s jobs deleted —
    * so q119 stays on the bit-bucket histogram path and only
    * domain-bounded grids (q168's priority × day-range ≈ 20k cells at
    * ANY SF) take this one. This
    * path collects AT MOST [[MaxDriverPass2Rows]] + 1 rows through a
    * LIMIT (the driver is protected BEFORE the fetch, the established
    * discipline), and within the cap computes every group's order
    * statistics by direct sort + cumulative walk — no bucketing at
    * all — with the object-doc DuckDB-exact interpolation.
    * BIT-IDENTICAL to [[exactQuantilesFromCounts]] /
    * [[nonNegQuantilesFromCounts]] on the same frame (QuantilesSpec
    * pins it): same multiset, same ranks, same arithmetic; −0.0
    * normalizes at intake exactly as Spark's grouping would have.
    * Past the cap returns None — callers route to the scalable
    * histogram paths (whose own bounds stay proven), paying one
    * bounded ≤ 24 MB probe job for the attempt; a caller whose value
    * domain grows with the corpus (continuous doubles at 100 TB)
    * takes that branch automatically. Duplicate (group, value) rows
    * sum, as in the siblings. */
  def collectedQuantilesFromCounts(vc: DataFrame, groupCol: String,
                                   valCol: String, cntCol: String,
                                   ps: Seq[Double]): Option[DataFrame] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val session = vc.sparkSession
    val vRaw = col(valCol).cast("double")
    val in = vc.select(col(groupCol).as("g"),
        when(vRaw === 0.0, lit(0.0)).otherwise(vRaw).as("v"),
        col(cntCol).cast("long").as("c"))
      .filter(col("v").isNotNull)
    val cap = MaxDriverPass2Rows
    val rows = in.limit((cap + 1).toInt).collect()              // the ONE job
    if (rows.length > cap) return None
    val gType = vc.schema(groupCol).dataType
    val outSchema = StructType(Seq(
      StructField(groupCol, gType),
      StructField("p", DoubleType, nullable = false),
      StructField("value", DoubleType)))
    val resRows = rows.groupBy(_.get(0)).toSeq.flatMap { case (g, rs) =>
      // sortBy on the VALUE only: duplicate (g, v) rows land adjacent
      // and the cumulative walk sums them, exactly like the siblings
      val vals = rs.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
      val n = vals.map(_._2).sum
      if (n <= 0L) Nil
      else {
        def valueAtRank(rank: Long): Double =
          walkValue(vals, rank, s"collectedQuantilesFromCounts group $g", rank)
        val kOf = ps.map(p => (n - 1).toDouble * p)
        ps.zip(kOf).distinct.map { case (p, k) =>
          Row(g, p, interp(k, valueAtRank(math.floor(k).toLong),
                              valueAtRank(math.ceil(k).toLong)))
        }
      }
    }
    Some(session.createDataFrame(resRows.asJava, outSchema))
  }
}
