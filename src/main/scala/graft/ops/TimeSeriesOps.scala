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
}
