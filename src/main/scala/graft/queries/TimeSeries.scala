package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Time-series operators over the event stream — the gap-fill /
  * bar-aggregation / time-weighting family a market-data or metrics
  * pipeline runs (the reference's domain is DEX pool snapshots:
  * `main.py`'s hourly loop IS a resample; these are the general forms).
  *
  * Determinism contract (SURVEY.md §5): every cross-row sum goes
  * through exact DECIMAL(38,6); per-row double arithmetic (+,-,*,/,
  * interpolation fractions) is IEEE-deterministic; every window order
  * is made total with the unique event_id tiebreak. All four queries
  * hash-match the DuckDB oracle exactly.
  */
object TimeSeries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q109_resample_interpolate",
      "time-series RESAMPLE + gap fill: per event_type hourly buckets (exact-decimal mean), a generated hourly spine from each type's first to last observed hour, and LINEAR INTERPOLATION across empty buckets (boundary gaps take the nearest observed value). The ignore-nulls last/first window pair is the standard fill idiom; the interpolation fraction is integer-µs arithmetic cast to double, so it is bit-identical across engines. Scale: the window partitions are (event_type) over HOURLY rows — cardinality = hours in the retention window, thousands of rows per key regardless of raw event volume, so the sort is trivially bounded; the raw scan aggregates map-side into the hourly grid first",
      (s, d) => graft.ops.TimeSeriesOps.resampleInterpolate(
        t(s, d, "events"), "event_type", "ts", "value"),
      Some("""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n_obs, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS v_avg FROM events GROUP BY 1, 2), bounds AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1), spine AS (SELECT event_type, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds), j AS (SELECT s.event_type, s.hour, hourly.n_obs, hourly.v_avg FROM spine s LEFT JOIN hourly USING (event_type, hour)), f AS (SELECT *, last_value(v_avg IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, last_value(CASE WHEN v_avg IS NOT NULL THEN hour END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph, first_value(v_avg IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, first_value(CASE WHEN v_avg IS NOT NULL THEN hour END IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh FROM j) SELECT event_type, hour, COALESCE(n_obs, 0) AS n_obs, (v_avg IS NULL) AS is_gap, CASE WHEN v_avg IS NOT NULL THEN v_avg WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv ELSE pv + (nv - pv) * (CAST(epoch_us(hour) - epoch_us(ph) AS DOUBLE) / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE)) END AS v_filled FROM f""")),

    QueryDef("q110_ohlc_bars",
      "OHLC bar aggregation: per (event_type, hour) open/high/low/close/tick-count/volume. Open and close are true time-ordered endpoints via min_by/max_by over the (ts, event_id) struct — DECLARATIVE argmin/argmax that partial-aggregates map-side and needs NO window sort (a row_number formulation would force a per-bar sort; the aggregate form shuffles one candidate row per bar per partition). The unique event_id makes the endpoint total-ordered, so the result is partitioning-invariant; volume sums in exact decimal. One shuffle, on the bar key",
      (s, d) => graft.ops.TimeSeriesOps.ohlcBars(
        t(s, d, "events"), "event_type", "ts", "event_id", "value"),
      Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value FROM events), r AS (SELECT *, row_number() OVER (PARTITION BY event_type, hour ORDER BY ts, event_id) AS ra, row_number() OVER (PARTITION BY event_type, hour ORDER BY ts DESC, event_id DESC) AS rd FROM e) SELECT event_type, hour, MAX(CASE WHEN ra = 1 THEN value END) AS open, MAX(value) AS high, MIN(value) AS low, MAX(CASE WHEN rd = 1 THEN value END) AS close, CAST(COUNT(*) AS BIGINT) AS n_ticks, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volume FROM r GROUP BY 1, 2""")),

    QueryDef("q111_twap",
      "time-weighted average (TWAP): per (event_type, day), each observation weighted by its µs-duration until the next tick (lead window over the total (ts, event_id) order; the day's last tick carries no weight). Each tick's weight NORMALIZES to a per-day fraction in double FIRST (w_us/total_us, both exact integers — one IEEE division per row), because the naive µs-weighted decimal sum's unscaled value exceeds 2^53 and decimal→double conversion then DOUBLE-ROUNDS differently across engines (measured 1.4e-14 drift); the bounded contributions (≤ max value) then sum through the exact-decimal recipe. Both windows and the final aggregate share the (event_type, day) partitioning — one exchange; partition size is bounded by a day's ticks per type, and at higher tick rates the same query runs per (type, hour)",
      (s, d) => graft.ops.TimeSeriesOps.twap(
        t(s, d, "events"), "event_type", "ts", "event_id", "value"),
      Some("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value FROM events), l AS (SELECT *, lead(epoch_us(ts)) OVER (PARTITION BY event_type, day ORDER BY ts, event_id) - epoch_us(ts) AS w_us FROM e), f AS (SELECT *, SUM(w_us) OVER (PARTITION BY event_type, day) AS total_us FROM l WHERE w_us IS NOT NULL) SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_intervals, CAST(SUM(CAST(value * (CAST(w_us AS DOUBLE) / CAST(total_us AS DOUBLE)) AS DECIMAL(38,6))) AS DOUBLE) AS twap FROM f WHERE total_us > 0 GROUP BY 1, 2""")),

    QueryDef("q112_unpivot",
      "UNPIVOT/melt (the inverse of q40's pivot, completing the reshape family): lineitem's four per-line charge columns melted to (key, metric, val) long form — the feature-long layout ML preprocessing and plotting pipelines want. Spark's native unpivot (Expand-based: one pass, rows×4 output, NO shuffle, no join) against a portable UNION ALL oracle. Values pass through untouched, so cross-engine equality is exact",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
                 Array(col("l_quantity"), col("l_extendedprice"),
                       col("l_discount"), col("l_tax")),
                 "metric", "val"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem"""))
  )
}
