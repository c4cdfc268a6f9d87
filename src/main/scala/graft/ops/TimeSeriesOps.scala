package graft.ops

import graft.ops.Num._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (gap-fill/interpolate, OHLC bars, TWAP) shared
  * by the q109–q111 queries and their specs. All cross-row sums use the
  * exact-decimal recipe; every window order is total via the unique
  * `idCol` tiebreak, so results are partitioning-invariant.
  *
  * Input contract: `keyCol` the series key (e.g. event_type), `tsCol` a
  * TIMESTAMP column, `idCol` a unique row id, `valueCol` double.
  */
object TimeSeriesOps {

  /** Hourly resample with linear interpolation over empty buckets;
    * boundary gaps cannot occur (the spine spans each key's first to
    * last OBSERVED hour) but one-sided fill is kept for direct calls on
    * pre-built grids. See q109 for the scale argument: window
    * partitions hold hourly rows, not raw events. */
  def resampleInterpolate(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(lcount(lit(1)).as("n_obs"),
           (dsum(col(valueCol)) / count(lit(1))).as("v_avg"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(keyCol),
              explode(sequence(col("h0"), col("h1"),
                               expr("interval 1 hour"))).as("hour"))
    val j = spine.join(hourly, Seq(keyCol, "hour"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
    val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("v_avg"), ignoreNulls = true).over(wB)
    val ph = last(when(col("v_avg").isNotNull, col("hour")),
                  ignoreNulls = true).over(wB)
    val nv = first(col("v_avg"), ignoreNulls = true).over(wF)
    val nh = first(when(col("v_avg").isNotNull, col("hour")),
                   ignoreNulls = true).over(wF)
    val frac = (unix_micros(col("hour")) - unix_micros(ph)).cast("double") /
               (unix_micros(nh) - unix_micros(ph)).cast("double")
    j.select(col(keyCol), col("hour"),
             coalesce(col("n_obs"), lit(0L)).as("n_obs"),
             col("v_avg").isNull.as("is_gap"),
             when(col("v_avg").isNotNull, col("v_avg"))
               .when(pv.isNull, nv)
               .when(nv.isNull, pv)
               .otherwise(pv + (nv - pv) * frac).as("v_filled"))
  }

  /** Per (key, hour) OHLC bars. Open/close via declarative
    * min_by/max_by over the (ts, id) struct — map-side partial
    * aggregation, ONE shuffle, no window sort (PlanSpec-pinned). */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(min_by(col(valueCol), struct(col(tsCol), col(idCol))).as("open"),
           max(col(valueCol)).as("high"),
           min(col(valueCol)).as("low"),
           max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("close"),
           lcount(lit(1)).as("n_ticks"),
           dsum(col(valueCol)).as("volume"))

  /** Per (key, day) time-weighted average. Weights normalize to per-day
    * fractions in DOUBLE before the decimal sum — the µs-weighted
    * decimal sum's unscaled value exceeds 2^53 and double-rounds
    * differently across engines (see q111). Last tick of a day carries
    * no weight; single-tick days drop out. */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol), col(idCol))
    val wd = Window.partitionBy(col(keyCol), col("day"))
    df.select(col(keyCol), to_date(col(tsCol)).as("day"),
              col(tsCol), col(idCol), col(valueCol))
      .withColumn("w_us", lead(unix_micros(col(tsCol)), 1).over(w)
                           - unix_micros(col(tsCol)))
      .filter(col("w_us").isNotNull)
      .withColumn("total_us", sum(col("w_us")).over(wd))
      .filter(col("total_us") > 0)
      .withColumn("contrib", col(valueCol) *
        (col("w_us").cast("double") / col("total_us").cast("double")))
      .groupBy(col(keyCol), col("day"))
      .agg(lcount(lit(1)).as("n_intervals"),
           dsum(col("contrib")).as("twap"))
  }

  /** Fixed-bounds B-bucket histogram quantiles per (key, tumbling
    * window) — the STREAMING-NATIVE quantile form (see
    * [[graft.streaming.EventStreams.histogramQuantilesStream]] for the
    * watermarked twin). EXACT quantiles ([[Quantiles]]) need a second
    * pass over raw rows a stream no longer holds; the production
    * streaming answer is a bounded histogram with CALLER-SUPPLIED
    * bounds (the SLO/metrics convention — think latency buckets): state
    * per (key, window) is exactly `buckets` counters, a merge-safe
    * commutative aggregate, so late in-watermark rows revise their
    * window in place and the estimate carries a PROVABLE error bound of
    * one bucket width, (hi−lo)/buckets. Out-of-range values clamp into
    * the edge buckets (standard histogram semantics — the tails stay
    * counted, their position saturates).
    *
    * The quantile derivation is pure column arithmetic over the counts
    * array (cumulative fold + first-covering-bucket search via
    * higher-order functions — no explode, no second aggregation, so the
    * same plan runs unchanged after a STREAMING aggregate): for target
    * mass t = p·n, the first bucket i with cum ≥ t and c_i > 0 yields
    * v(p) = lo + w·(i + (t − cum_{<i})/c_i) — the within-bucket linear
    * interpolation metrics systems use. Deterministic double
    * arithmetic, reproducible in the DuckDB oracle (q124).
    */
  def histogramQuantiles(df: DataFrame, keyCol: String, tsCol: String,
                         valCol: String, windowDur: String,
                         lo: Double, hi: Double, buckets: Int,
                         ps: Seq[Double]): DataFrame = {
    require(hi > lo, s"need hi > lo: [$lo, $hi]")
    require(buckets > 0 && buckets <= 1024, s"buckets out of range: $buckets")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val w = (hi - lo) / buckets
    val bucket = greatest(lit(0), least(lit(buckets - 1),
      floor((col(valCol) - lo) / w).cast("int")))
    val counters = (0 until buckets).map(i => count(when(bucket === i, 1)).as(s"c$i"))
    val counted = df.groupBy(col(keyCol), window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
      .select(col(keyCol), col("window.start").as("win_start"),
        array((0 until buckets).map(i => col(s"c$i")): _*).as("counts"))
    // cumulative counts without a window/explode: per-row fold over the
    // B-element array (O(B²) scalar ops on grid-sized rows — trivial)
    val cum = transform(sequence(lit(0), lit(buckets - 1)),
      i => aggregate(slice(col("counts"), lit(1), i + lit(1)), lit(0L), (a, c) => a + c))
    val withCum = counted.withColumn("cum", cum)
      .withColumn("n", element_at(col("cum"), buckets))
    val qCols = ps.map { p =>
      val t = lit(p) * col("n")
      val idx = array_min(filter(sequence(lit(0), lit(buckets - 1)),
        i => element_at(col("cum"), i + lit(1)) >= t &&
             element_at(col("counts"), i + lit(1)) > lit(0L)))
      val cAt = element_at(col("counts"), idx + lit(1))
      val cBefore = element_at(col("cum"), idx + lit(1)) - cAt
      struct(lit(p).as("p"),
        (lit(lo) + lit(w) * (idx + (t - cBefore) / cAt)).as("value_est"))
    }
    withCum.select(col(keyCol), col("win_start"),
        explode(array(qCols: _*)).as("q"), col("n"))
      .select(col(keyCol), col("win_start"), col("q.p").as("p"),
              col("q.value_est").as("value_est"), col("n"))
  }

  /** Windowed ONE-SAMPLE Kolmogorov–Smirnov drift screen against a
    * FROZEN reference CDF — the streaming-native form of q161's
    * two-sample KS and the shape-sensitive sibling of the q115/q122
    * PSI monitors (see
    * [[graft.streaming.EventStreams.ksDriftStream]] for the
    * watermarked twin and q170 for the calibrate-then-monitor batch
    * composition): per tumbling window, `valCol` folds into the same
    * fixed-bounds B-bucket counters as [[histogramQuantiles]] —
    * merge-safe commutative state, exactly `buckets` longs per open
    * window, late in-watermark rows revise their window's D in place —
    * and D = max_i |cum_i/n − ref_i| evaluates as STATELESS
    * higher-order column arithmetic over the emitted counts array (no
    * second stateful op, so the identical plan runs batch and
    * streaming).
    *
    * `refCdf` is the frozen baseline: cumulative probabilities at each
    * bucket's upper edge, from a calibration period. That is how
    * production drift monitors work — freeze a reference, test every
    * window against it; a streaming TWO-sample KS would need the
    * reference window's raw counts inside the same aggregate row. The
    * reject bar is the asymptotic one-sample critical value
    * 1.36/sqrt(n) (alpha = 0.05, the q161 constant; the exact
    * one-sample constant is 1.358 — 1.36 kept for family consistency
    * and stated here). D is EXACT on the binned distributions (the
    * q161 scale argument: the histogram is what a streaming system can
    * hold; out-of-range values clamp to edge buckets as in
    * [[histogramQuantiles]]). */
  /** Shared input validation for [[ksDrift]]/[[w1Drift]]: refCdf must be a
    * CDF, not a PDF — one cumulative probability per bucket, non-decreasing,
    * inside [0,1], ending at ~1.0. A PDF passed by mistake satisfies the
    * length check but yields a silently wrong statistic on every window, so
    * fail loudly at construction instead. */
  private def requireRefCdf(refCdf: Seq[Double], buckets: Int): Unit = {
    require(refCdf.length == buckets,
      s"refCdf needs one cumulative probability per bucket: got ${refCdf.length}, want $buckets")
    require(refCdf.forall(p => p >= 0.0 && p <= 1.0),
      s"refCdf values must lie in [0,1]: got ${refCdf.filterNot(p => p >= 0.0 && p <= 1.0).take(3).mkString(", ")}")
    require(refCdf.iterator.zip(refCdf.iterator.drop(1)).forall { case (a, b) => b >= a },
      "refCdf must be non-decreasing (did you pass a PDF?)")
    require(math.abs(refCdf.last - 1.0) <= 1e-6,
      s"refCdf must end at ~1.0 (cumulative over ALL buckets): last=${refCdf.last}")
  }

  def ksDrift(df: DataFrame, tsCol: String, valCol: String,
              windowDur: String, lo: Double, hi: Double, buckets: Int,
              refCdf: Seq[Double]): DataFrame = {
    require(hi > lo, s"need hi > lo: [$lo, $hi]")
    require(buckets > 0 && buckets <= 1024, s"buckets out of range: $buckets")
    requireRefCdf(refCdf, buckets)
    val w = (hi - lo) / buckets
    val bucket = greatest(lit(0), least(lit(buckets - 1),
      floor((col(valCol) - lo) / w).cast("int")))
    val counters = (0 until buckets).map(i => count(when(bucket === i, 1)).as(s"c$i"))
    val counted = df.groupBy(window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
      .select(col("window.start").as("win_start"),
        array((0 until buckets).map(i => col(s"c$i")): _*).as("counts"))
    val cum = transform(sequence(lit(0), lit(buckets - 1)),
      i => aggregate(slice(col("counts"), lit(1), i + lit(1)), lit(0L), (a, c) => a + c))
    val refArr = array(refCdf.map(lit(_)): _*)
    // max over buckets of |window CDF − reference CDF|: a fold with
    // greatest — order-independent on doubles, no explode, stateless
    val dRaw = aggregate(sequence(lit(1), lit(buckets)), lit(0.0), (acc, i) =>
      greatest(acc, abs(element_at(col("cum"), i).cast("double") / col("n")
        - element_at(refArr, i))))
    counted.withColumn("cum", cum)
      .withColumn("n", element_at(col("cum"), buckets))
      .filter(col("n") > 0)
      .withColumn("draw", dRaw)
      .withColumn("craw", lit(1.36) / sqrt(col("n").cast("double")))
      .select(col("win_start"), col("n"),
        (floor(col("draw") * 1e6 + 0.5) / 1e6).as("d_stat"),
        (floor(col("craw") * 1e6 + 0.5) / 1e6).as("d_crit"),
        (col("draw") > col("craw")).as("drift"))
  }

  /** Windowed one-sample Wasserstein-1 drift monitor — [[ksDrift]]'s
    * transport-metric sibling (q222 measures the batch two-sample form;
    * this is its calibrate-then-monitor composition): per tumbling
    * window, the SAME B mergeable bucket counters, then
    * W1 = binWidth · Σ_i |window CDF_i − reference CDF_i| — the area
    * between the CDFs, read in the measure's own units — as stateless
    * column arithmetic over the emitted counts. Where KS flags the
    * worst single gap, W1 accumulates persistent small shifts across
    * the whole range (a uniform +2% shift everywhere moves W1 but
    * barely moves D). Cross-engine order-free sum: each gap term
    * floors onto a 1e12 integer grid and the fold adds LONGS (exact in
    * any order — the q222 recipe applied per window); one pinned
    * double chain converts the total at the end. `drift` flags
    * W1 > barFrac·(hi−lo) — a screening convention in range units
    * (2% of range by default), like [[benfordDrift]]'s bar. */
  def w1Drift(df: DataFrame, tsCol: String, valCol: String,
              windowDur: String, lo: Double, hi: Double, buckets: Int,
              refCdf: Seq[Double], barFrac: Double = 0.02): DataFrame = {
    require(hi > lo, s"need hi > lo: [$lo, $hi]")
    require(buckets > 0 && buckets <= 1024, s"buckets out of range: $buckets")
    requireRefCdf(refCdf, buckets)
    val w = (hi - lo) / buckets
    val bucket = greatest(lit(0), least(lit(buckets - 1),
      floor((col(valCol) - lo) / w).cast("int")))
    val counters = (0 until buckets).map(i => count(when(bucket === i, 1)).as(s"c$i"))
    val counted = df.groupBy(window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
      .select(col("window.start").as("win_start"),
        array((0 until buckets).map(i => col(s"c$i")): _*).as("counts"))
    val cum = transform(sequence(lit(0), lit(buckets - 1)),
      i => aggregate(slice(col("counts"), lit(1), i + lit(1)), lit(0L), (a, c) => a + c))
    val refArr = array(refCdf.map(lit(_)): _*)
    val suRaw = aggregate(sequence(lit(1), lit(buckets)), lit(0L), (acc, i) =>
      acc + floor(abs(element_at(col("cum"), i).cast("double") / col("n")
        - element_at(refArr, i)) * lit(1e12) + lit(0.5)).cast("long"))
    val w1raw = lit(w) * col("su").cast("double") / lit(1e12)
    counted.withColumn("cum", cum)
      .withColumn("n", element_at(col("cum"), buckets))
      .filter(col("n") > 0)
      .withColumn("su", suRaw)
      .select(col("win_start"), col("n"),
        (floor(w1raw * lit(1e6) + lit(0.5)) / lit(1e6)).as("w1"),
        (floor(w1raw / lit(hi - lo) * lit(1e6) + lit(0.5)) / lit(1e6)).as("w1_frac"),
        (w1raw > lit(barFrac * (hi - lo))).as("drift"))
  }

  /** Windowed Benford first-digit screen — q148's fraud/synthetic-feed
    * test as a per-window monitor (see
    * [[graft.streaming.EventStreams.benfordStream]] for the watermarked
    * twin): per tumbling window, NINE mergeable digit counters (the
    * same state shape as [[ksDrift]]'s buckets — late in-watermark rows
    * revise the verdict in place), then the chi-square-style frequency
    * divergence vs P(d) = log10(1 + 1/d) evaluates statelessly over the
    * emitted counts array. Digit extraction, 6-dp frequency rounding,
    * and the 12-dp DECIMAL(38,12) term reduction reuse q148's exact
    * recipe (decimal addition keeps the 9-term sum order-independent
    * across engines); rows below 1 are excluded as there. `violation`
    * flags divergence > `bar` — a SCREENING bar on the frequency
    * divergence (q148's statistic), not a formal n-scaled chi-square
    * test; 0.05 is a reasonable default for feeds of this size. */
  def benfordDrift(df: DataFrame, tsCol: String, valCol: String,
                   windowDur: String, bar: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val digit = substring(col(valCol).cast(DecimalType(18, 2))
      .cast("string"), 1, 1)
    val counters = (1 to 9).map(i =>
      count(when(digit === i.toString, 1)).as(s"d$i"))
    val counted = df.filter(col(valCol) >= 1)
      .groupBy(window(col(tsCol), windowDur))
      .agg(counters.head, counters.tail: _*)
      .select(col("window.start").as("win_start"),
        array((1 to 9).map(i => col(s"d$i")): _*).as("counts"))
      .withColumn("n", aggregate(col("counts"), lit(0L), (a, c) => a + c))
      .filter(col("n") > 0)
    // terms cast to DECIMAL(20,12), NOT (38,12): Spark's + on two
    // (38,12) operands hits the precision cap and ADJUSTS the result
    // scale to 11 (allowPrecisionLoss), silently rounding each chained
    // addition — measured as a 1e-6 chi2 drift vs the oracle's exact
    // decimal SUM. At precision 20 each of the 9 additions widens
    // losslessly (terms < ~22, 8 integral digits spare), so the in-row
    // reduce is exact like q148's decimal sum aggregate
    val terms = (1 to 9).map { i =>
      val obs = round(element_at(col("counts"), i).cast("double") / col("n"), 6)
      val ex = round(log10(lit(1.0) + lit(1.0) / lit(i.toDouble)), 6)
      round((obs - ex) * (obs - ex) / ex, 12).cast(DecimalType(20, 12))
    }
    // final output on the 6-dp FLOOR grid, not round(): with one chi2
    // per window, half-boundary doubles land on both sides of round's
    // tie across engines (measured: 8/30 windows off by 1e-6 at sf0.01)
    counted
      .withColumn("chi2",
        floor(terms.reduce(_ + _).cast("double") * 1e6 + 0.5) / 1e6)
      .select(col("win_start"), col("n"), col("chi2"),
        (col("chi2") > bar).as("violation"))
  }
}
