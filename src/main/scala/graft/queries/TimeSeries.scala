package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Num._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** Time-series + reshape/monitoring operators (q109–q120, q122) — the
  * gap-fill / bar-aggregation / time-weighting / drift family a
  * market-data or metrics pipeline runs (the reference's domain is DEX
  * pool snapshots: `main.py`'s hourly loop IS a resample; these are the
  * general forms), plus the melt/scaling feature-prep pair.
  *
  * Determinism contract (SURVEY.md §5): every cross-row sum goes
  * through exact DECIMAL(38,6); per-row double arithmetic (+,-,*,/,
  * interpolation fractions) is IEEE-deterministic; every window order
  * is made total with the unique event_id tiebreak (or is frame-peer
  * invariant, q114). All queries hash-match the DuckDB oracle exactly
  * at sf0.01 and sf0.1.
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

    QueryDef("q113_asof_directions",
      "the full as-of join direction family (pandas merge_asof surface, completing q46's backward-only form): per event the user's strictly-previous purchase, strictly-next purchase (forward as-of), and the NEAREST purchase within a 1-hour tolerance (ties broken backward, pandas semantics). Every direction is the union + ignore-nulls-window formulation — one shuffle+sort per pass, never a per-row range probe — and all passes share the (user_id, ts) sort order, so at scale they reuse one exchange. Oracle uses correlated min/max subqueries (DuckDB de-correlates them itself)",
      (s, d) => {
        import graft.ops.AsOfJoin
        val ev = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
        val purchases = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        val withPrev = AsOfJoin.lastBefore(ev, purchases, "user_id", "ts", "p")
        val withNext = AsOfJoin.firstAfter(withPrev, purchases, "user_id", "ts", "n")
        // nearest is a pure column over the two directional matches —
        // no third/fourth window pass (AsOfJoin.nearestCol)
        withNext.select(col("event_id"), col("user_id"),
          unix_micros(col("asof_p")).as("prev_us"),
          unix_micros(col("asof_n")).as("next_us"),
          unix_micros(AsOfJoin.nearestCol("ts", "asof_p", "asof_n", 3600000000L))
            .as("nearest_1h_us"))
      },
      Some("""WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'), base AS (SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ets, (SELECT epoch_us(max(p.ts)) FROM p WHERE p.user_id = e.user_id AND p.ts < e.ts) AS prev_us, (SELECT epoch_us(min(p.ts)) FROM p WHERE p.user_id = e.user_id AND p.ts > e.ts) AS next_us FROM events e) SELECT event_id, user_id, prev_us, next_us, CASE WHEN prev_us IS NULL AND next_us IS NULL THEN NULL WHEN prev_us IS NULL THEN (CASE WHEN next_us - ets <= 3600000000 THEN next_us END) WHEN next_us IS NULL THEN (CASE WHEN ets - prev_us <= 3600000000 THEN prev_us END) WHEN (next_us - ets) < (ets - prev_us) THEN (CASE WHEN next_us - ets <= 3600000000 THEN next_us END) ELSE (CASE WHEN ets - prev_us <= 3600000000 THEN prev_us END) END AS nearest_1h_us FROM base""")),

    QueryDef("q114_trailing_range_window",
      "TIME-RANGE window frames (RANGE BETWEEN µs PRECEDING, vs q13's row-count frames): per event, the trailing-1-hour event count and exact-decimal value sum for the same user. The frame is defined on the µs epoch of the ORDER key, so rows with equal timestamps are frame PEERS and the result is partitioning- and tie-order-invariant by construction (no id tiebreak needed — the frame, not the row order, drives the aggregate)",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0L)
        t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).cast("long").as("n_1h"),
            sum(col("value").cast("decimal(38,6)")).over(w)
              .cast("double").as("sum_1h"))
      },
      Some("""SELECT event_id, user_id, CAST(count(*) OVER w AS BIGINT) AS n_1h, CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""")),

    QueryDef("q115_psi_drift",
      "population stability index (PSI) feature-drift monitor — the production ML data-quality check, the numeric-feature sibling of q104's vocabulary KL: l_extendedprice split into base/new populations (even/odd orderkey — the deterministic-split recipe), 10 equal-width bins from the GLOBAL min/max (exact double aggregates, broadcast back — never a percentile window), continuity-corrected (c+0.5) bin fractions, per-bin (p-q)*ln(p/q) contributions rounded to 4 dp BEFORE the exact-decimal total (the q63/q84 libm-portability recipe). One corpus pass + one 10-row aggregate; at 100 TB the same plan holds — the bin histogram is the only shuffled state",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice").as("x"))
        val stats = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        val binned = li.crossJoin(broadcast(stats))
          .select((col("l_orderkey") % 2 === 0).as("is_base"),
                  least(lit(9.0), floor((col("x") - col("mn")) /
                    ((col("mx") - col("mn")) / 10.0))).cast("long").as("bin"))
        val counts = binned.groupBy(col("bin"))
          .agg(count(when(col("is_base"), 1)).cast("long").as("n_base"),
               count(when(!col("is_base"), 1)).cast("long").as("n_new"))
        val totals = counts.agg(sum(col("n_base")).as("tb"), sum(col("n_new")).as("tn"))
        val contrib = counts.crossJoin(broadcast(totals))
          .withColumn("p", (col("n_base") + 0.5) / (col("tb") + 5.0))
          .withColumn("q", (col("n_new") + 0.5) / (col("tn") + 5.0))
          .withColumn("psi_contrib",
            round((col("p") - col("q")) * log(col("p") / col("q")), 4))
        val total = contrib.agg(
          sum(col("psi_contrib").cast("decimal(38,6)")).cast("double").as("psi_total"))
        contrib.select(col("bin"), col("n_base"), col("n_new"), col("psi_contrib"))
          .crossJoin(broadcast(total))
      },
      Some("""WITH s AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem), b AS (SELECT (l_orderkey % 2 = 0) AS is_base, CAST(least(9.0, floor((l_extendedprice - mn) / ((mx - mn) / 10.0))) AS BIGINT) AS bin FROM lineitem, s), c AS (SELECT bin, CAST(count(*) FILTER (WHERE is_base) AS BIGINT) AS n_base, CAST(count(*) FILTER (WHERE NOT is_base) AS BIGINT) AS n_new FROM b GROUP BY 1), t AS (SELECT SUM(n_base) AS tb, SUM(n_new) AS tn FROM c), e AS (SELECT bin, n_base, n_new, round(((n_base + 0.5)/(tb + 5.0) - (n_new + 0.5)/(tn + 5.0)) * ln(((n_base + 0.5)/(tb + 5.0)) / ((n_new + 0.5)/(tn + 5.0))), 4) AS psi_contrib FROM c, t) SELECT bin, n_base, n_new, psi_contrib, (SELECT CAST(SUM(CAST(psi_contrib AS DECIMAL(38,6))) AS DOUBLE) FROM e) AS psi_total FROM e""")),

    QueryDef("q116_scd2_intervals",
      "SCD2 (slowly-changing-dimension type 2) interval build — the warehouse dimension-history op: each user's event stream collapses into validity intervals of their current event_type, one row per consecutive RUN of the same type (gaps-and-islands on value CHANGE, vs q19's islands on time gaps). lag-detected change points -> conditional cumsum run ids -> per-run min-ts/count -> lead() closes each interval with the next run's start (null = current row). Every stage keys on user_id, so the window, the run aggregate, and the closing window share ONE exchange at scale",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = Window.partitionBy(col("user_id")).orderBy(col("run"))
        val marked = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull ||
                 lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("run",
            sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        marked.groupBy(col("user_id"), col("run"))
          .agg(max(col("event_type")).as("event_type"),
               min(col("ts")).as("vf"),
               lcount(lit(1)).as("n_events"))
          .select(col("user_id"), col("run"), col("event_type"),
                  unix_micros(col("vf")).as("valid_from_us"),
                  lead(unix_micros(col("vf")), 1).over(wRun).as("valid_to_us"),
                  col("n_events"))
      },
      Some("""WITH g AS (SELECT user_id, ts, event_id, event_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events), m AS (SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS chg FROM g), r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM m), a AS (SELECT user_id, run, MAX(event_type) AS event_type, MIN(ts) AS vf, CAST(COUNT(*) AS BIGINT) AS n_events FROM r GROUP BY 1, 2) SELECT user_id, CAST(run AS BIGINT) AS run, event_type, epoch_us(vf) AS valid_from_us, lead(epoch_us(vf)) OVER (PARTITION BY user_id ORDER BY run) AS valid_to_us, n_events FROM a""")),

    QueryDef("q117_interval_overlap_join",
      "interval-OVERLAP join (completing q55's point-in-interval range join): per user, every (view-session, purchase-session) pair whose closed intervals overlap, with the total overlap duration in µs. Both session sets come from the q19 lag+cumsum sessionizer (12 h gap — long enough that per-user intervals genuinely span and overlap; the 30 min tier is q19's) on filtered event subsets; the pair stage is a user_id equi-join whose per-key cardinality is BOUNDED (sessions per user per type, ~dozens) so the quadratic is per-key-bounded, then the overlap predicate filters and exact integer µs arithmetic sums the durations. Every stage — both sessionizers, the join, the final aggregate — keys on user_id: ONE partitioning end to end",
      (s, d) => {
        def sessions(tpe: String) = {
          val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          t(s, d, "events").filter(col("event_type") === tpe)
            .select(col("user_id"), col("ts"), col("event_id"))
            .withColumn("prev_ts", lag(col("ts"), 1).over(w))
            .withColumn("chg",
              when(col("prev_ts").isNull ||
                   unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 43200000000L,
                   1L).otherwise(0L))
            .withColumn("seq",
              sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy(col("user_id"), col("seq"))
            .agg(unix_micros(min(col("ts"))).as("s"),
                 unix_micros(max(col("ts"))).as("e"))
        }
        val v = sessions("view")
          .select(col("user_id"), col("seq").as("v_seq"),
                  col("s").as("vs"), col("e").as("ve"))
        val p = sessions("purchase")
          .select(col("user_id"), col("seq").as("p_seq"),
                  col("s").as("ps"), col("e").as("pe"))
        v.join(p, Seq("user_id"))
          .filter(col("vs") <= col("pe") && col("ps") <= col("ve"))
          .groupBy(col("user_id"))
          .agg(lcount(lit(1)).as("n_overlap_pairs"),
               lsum(least(col("ve"), col("pe")) - greatest(col("vs"), col("ps")))
                 .as("total_overlap_us"))
      },
      Some("""WITH vv AS (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events WHERE event_type = 'view'), vm AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 43200000000 THEN 1 ELSE 0 END AS chg FROM vv), vr AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM vm), vsess AS (SELECT user_id, seq, epoch_us(MIN(ts)) AS vs, epoch_us(MAX(ts)) AS ve FROM vr GROUP BY 1, 2), pv AS (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events WHERE event_type = 'purchase'), pm AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 43200000000 THEN 1 ELSE 0 END AS chg FROM pv), pr AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM pm), psess AS (SELECT user_id, seq, epoch_us(MIN(ts)) AS ps, epoch_us(MAX(ts)) AS pe FROM pr GROUP BY 1, 2) SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs, CAST(SUM(least(ve, pe) - greatest(vs, ps)) AS BIGINT) AS total_overlap_us FROM vsess JOIN psess USING (user_id) WHERE vs <= pe AND ps <= ve GROUP BY 1""")),

    QueryDef("q118_sliding_windows",
      "SLIDING (hopping) time windows — the member of the window family tumbling (q12/q19b) can't express: per 6-hour window sliding every hour, per event_type event count, EXACT distinct users, and exact-decimal value sum. PRE-REDUCED formulation: the raw stream aggregates to the (hour, type) grid and the distinct (hour, type, user) triple set FIRST — both bounded by grid-size × active users, not event volume — and only those reduced tables expand x6 to covering windows (counts/decimal sums merge across hours exactly; distinct users re-dedup after the expand since a user may span hours). At 100 TB the x6 multiplier applies to the bounded grid, never the raw corpus — the naive window(ts, 6h, 1h) over raw events pays the expand on full volume. Epoch-aligned starts keep the grid portable; the oracle computes the same from each event's covering hour starts",
      (s, d) => {
        val ev = t(s, d, "events")
        val hourly = ev
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(lcount(lit(1)).as("n"), sum(col("value").cast("decimal(38,6)")).as("sv"))
        val win = (df: org.apache.spark.sql.DataFrame) => df
          .withColumn("i", explode(sequence(lit(0), lit(5))))
          .withColumn("ws",
            timestamp_micros(unix_micros(col("h")) - col("i") * 3600000000L))
        val stats = win(hourly)
          .groupBy(col("ws"), col("event_type"))
          .agg(lsum(col("n")).as("n_events"), sum(col("sv")).cast("double").as("value_sum"))
        val users = win(ev.select(date_trunc("hour", col("ts")).as("h"),
                                  col("event_type"), col("user_id")).distinct())
          .select(col("ws"), col("event_type"), col("user_id")).distinct()
          .groupBy(col("ws"), col("event_type"))
          .agg(lcount(lit(1)).as("n_users"))
        stats.join(users, Seq("ws", "event_type"))
          .select(unix_micros(col("ws")).as("window_start_us"),
                  col("event_type"), col("n_events"), col("n_users"),
                  col("value_sum"))
      },
      Some("""WITH w AS (SELECT DISTINCT date_trunc('hour', ts) - to_hours(i) AS ws FROM events, range(6) t(i)) SELECT epoch_us(ws) AS window_start_us, event_type, CAST(count(*) AS BIGINT) AS n_events, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum FROM w JOIN events e ON e.ts >= ws AND e.ts < ws + INTERVAL 6 HOUR GROUP BY 1, 2""")),

    QueryDef("q119_robust_scaling",
      "robust feature scaling (median/IQR — the outlier-immune standardizer ML preprocessing uses over min-max): lineitem's four charge columns melt to long form (q112's Expand) and collapse in ONE corpus pass to a (metric, value, count) distinct-values table — the charge domain is discrete (prices/quantities on a grid: ~470k distinct values vs the 2.4M-row melt at sf0.1), so this is the exactQuantilesFromCounts regime and EVERY later stage reads the small counts table, zero further corpus passes: per-metric EXACT interpolated quartiles via the histogram-refinement core (NEVER the q41 buffer-every-value aggregate), then the scaled stats themselves — n as Σc, the exact-decimal sum as Σ decimal(scaled)·c (decimal·integer multiplication is exact, so it equals summing c identical rows), outliers as Σc over |scaled|>3 — all from the same checkpointed frame. Replaces round-8's four-corpus-pass shape (group stats, histogram, target rank, scale) with one pass + counts-table stages, unchanged hashes; measured 1.93 s → 1.53 s at sf0.1 (the residual is the melt-groupBy materialization ~0.7 s plus four bounded jobs over the 583k-row counts table — l_extendedprice is 97% distinct, so vc barely compresses; a column with a real grid compresses 1000× and the counts stages vanish). Quartiles round to 4 dp before use (interpolation ulp parity, the q41 recipe); safeDiv guards degenerate zero-IQR metrics to null (both engines agree via NULLIF); floor decision: FLOOR.md",
      (s, d) => {
        // ROUND 14 negative A/B (VERDICT r13 #3 asked whether the
        // q157/q175 edgeBinnedCounts fusion transfers here): it does
        // NOT — scaled_sum's declared semantics round EVERY value onto
        // the 6-dp decimal grid AFTER the (v−med)/IQR transform, and
        // med/IQR exist only after the quantile passes, so one
        // post-quantile pass over the counts frame is semantically
        // pinned (the linearity shortcut Σc·v−med·Σc computes a
        // DIFFERENT number: one end-rounding vs per-value rounding).
        // What remains is 1 corpus pass (the melt groupBy + checkpoint,
        // ~0.7 s of the ~1.0 s isolated total) + counts-frame jobs at
        // ~0.1 s each. ROUND 15 took one of those off: the charge
        // columns are non-negative, so nonNegQuantilesFromCounts'
        // bit-prefix histogram needs no stats pass — the chain is now
        // corpus pass → bit-histogram → fetch → final stats (4 jobs,
        // scheduler count 16 → 11, PerfCanarySpec-pinned; 1.18 → 1.04 s
        // min-of-6 same-window at sf0.1), edges bit-identical. Every
        // remaining consecutive pair is data-dependent — nothing left
        // to fuse or overlap without changing declared semantics.
        // ROUND 15 second negative A/B (the q82/Prof12 union-of-pruned-
        // branches lesson does NOT transfer): rewriting the melt as 4
        // single-column groupBy branches measured 1.51 s vs 1.18 s for
        // the melt, same window, min-of-6. q82's branches end in
        // one-row aggregates (no value shuffle), so branch count is its
        // only currency; here every branch shuffles its column's
        // DISTINCT VALUES and l_extendedprice (~97% distinct, ~570k
        // rows) dominates BOTH forms identically — the union just adds
        // three extra branch schedulings and a 4-way checkpoint. The
        // melt groupBy is the floor, now established at the plan level
        // from two directions.
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val long = t(s, d, "lineitem").select(cols.map(col): _*)
          .unpivot(Array.empty[org.apache.spark.sql.Column],
                   cols.map(col).toArray, "metric", "val")
        // the ONE corpus pass; checkpointed because the quantile stages
        // and the final stats all re-read it
        val vc = long.groupBy(col("metric"), col("val"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        // charges are non-negative, so the bit-bucket counts path
        // (round 15) fuses the quantile op's stats job into its
        // histogram: 3 counts-frame quantile jobs → 2, edges
        // bit-identical (QuantilesSpec), and the result is a LOCAL
        // relation so the pivot/broadcast below build without jobs
        val stats = graft.ops.Quantiles
          .nonNegQuantilesFromCounts(vc, "metric", "val", "c", Seq(0.25, 0.5, 0.75))
          .groupBy(col("metric"))
          .agg(round(max(when(col("p") === 0.25, col("value"))), 4).as("q1"),
               round(max(when(col("p") === 0.5, col("value"))), 4).as("med"),
               round(max(when(col("p") === 0.75, col("value"))), 4).as("q3"))
        val scaled = vc.join(broadcast(stats), Seq("metric"))
          .withColumn("scaled",
            graft.ops.Num.safeDiv(col("val") - col("med"), col("q3") - col("q1")))
        scaled.groupBy(col("metric"))
          .agg(sum(col("c")).cast("long").as("n"),
               min(col("scaled")).as("scaled_min"),
               max(col("scaled")).as("scaled_max"),
               sum(col("scaled").cast(graft.ops.Num.D) * col("c")).cast("double")
                 .as("scaled_sum"),
               coalesce(sum(when(abs(col("scaled")) > 3, col("c"))), lit(0L))
                 .cast("long").as("n_outliers"))
      },
      Some("""WITH long AS (SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT 'l_discount', l_discount FROM lineitem UNION ALL SELECT 'l_tax', l_tax FROM lineitem), st AS (SELECT metric, ROUND(quantile_cont(val, 0.25), 4) AS q1, ROUND(quantile_cont(val, 0.5), 4) AS med, ROUND(quantile_cont(val, 0.75), 4) AS q3 FROM long GROUP BY 1), sc AS (SELECT l.metric, (val - med) / NULLIF(q3 - q1, 0) AS scaled FROM long l JOIN st USING (metric)) SELECT metric, CAST(count(*) AS BIGINT) AS n, MIN(scaled) AS scaled_min, MAX(scaled) AS scaled_max, CAST(SUM(CAST(scaled AS DECIMAL(38,6))) AS DOUBLE) AS scaled_sum, CAST(count(*) FILTER (WHERE abs(scaled) > 3) AS BIGINT) AS n_outliers FROM sc GROUP BY 1""")),

    QueryDef("q120_exact_quantiles",
      "distributed EXACT interpolated quantiles as a first-class operator (ops.Quantiles.exactQuantiles — the two-pass histogram refinement whose per-group state is 1024 counters and whose pass 2 ranks only the target buckets' DISTINCT VALUES; q41's `percentile` buffers every group value in aggregation state, the declared anti-pattern at 100 TB, and q54's approx_percentile trades exactness away): five quantiles (p1/q1/median/q3/p99) of events.value per event_type. Output is UNROUNDED doubles — possible because the interpolation arithmetic mirrors DuckDB's continuous interpolator bit-for-bit: lo·(⌈k⌉−k) + hi·(k−⌊k⌋) with the integer-k branch returning lo, NOT the algebraically-equal lo+(k−⌊k⌋)·(hi−lo), which drifts in the last ulp (measured on this very table at p=0.25/0.99). Scale: two corpus passes, each map + grid-sized aggregate; no window ever sees more than one bucket's distinct values; stats/histogram/target frames are broadcast",
      (s, d) => graft.ops.Quantiles.exactQuantiles(
        t(s, d, "events").select(col("event_type"), col("value")),
        "event_type", "value", Seq(0.01, 0.25, 0.5, 0.75, 0.99)),
      Some("""SELECT event_type, CAST(0.01 AS DOUBLE) AS p, quantile_cont(value, 0.01) AS value FROM events GROUP BY 1 UNION ALL SELECT event_type, CAST(0.25 AS DOUBLE), quantile_cont(value, 0.25) FROM events GROUP BY 1 UNION ALL SELECT event_type, CAST(0.5 AS DOUBLE), quantile_cont(value, 0.5) FROM events GROUP BY 1 UNION ALL SELECT event_type, CAST(0.75 AS DOUBLE), quantile_cont(value, 0.75) FROM events GROUP BY 1 UNION ALL SELECT event_type, CAST(0.99 AS DOUBLE), quantile_cont(value, 0.99) FROM events GROUP BY 1""")),

    QueryDef("q206_weighted_quantiles",
      "WEIGHTED exact quantiles as a zero-new-code composition: quantile of the unit-price distribution where every lineitem counts l_quantity times (the 'price per unit SOLD' distribution - the volume-weighted complement of q120's per-line view), per return flag at p25/50/75/90. The counts-frame entry point (ops.Quantiles.exactQuantilesFromCounts, built for q119's pre-aggregated shapes) makes integer-weighted quantiles FREE: weights ARE counts of the expanded multiset, so one (group, value)-grained rollup summing weights replaces any row expansion, and the operator's histogram refinement + DuckDB-bit-equal interpolation run unchanged on it. The oracle has no weighted quantile, so it EXPANDS the multiset for real (unnest(range(qty)) -> 15M rows at sf0.1 -> quantile_cont) - the two formulations agreeing to the bit IS the semantics proof, and the 25x row blowup the counts frame avoids is the scale story: at 100 TB the weighted quantile costs the same two corpus passes as the unweighted one",
      (s, d) => {
        val vc = t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice").as("v"),
                  col("l_quantity").cast("long").as("w"))
          .groupBy(col("l_returnflag"), col("v"))
          .agg(lsum(col("w")).as("c"))
          .localCheckpoint(true) // value-counts frame: stats + hist + rank passes
        graft.ops.Quantiles.exactQuantilesFromCounts(
          vc, "l_returnflag", "v", "c", Seq(0.25, 0.5, 0.75, 0.9))
      },
      Some("""WITH e AS (SELECT l_returnflag, l_extendedprice FROM (SELECT l_returnflag, l_extendedprice, unnest(range(CAST(l_quantity AS BIGINT))) FROM lineitem)), q AS (SELECT l_returnflag, quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.9]) AS qs FROM e GROUP BY 1) SELECT l_returnflag, CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS p, unnest(qs) AS value FROM q""")),

    QueryDef("q215_gumbel_maxima",
      "extreme-value analysis by block maxima - the TAIL-RISK member of the time-series plane (quantiles describe the bulk, CUSUM/KS watch for drift; this asks 'how bad can a day get', the question capacity planning and risk limits actually need): monthly maxima of daily revenue, Gumbel fit by method of moments (beta = sd*sqrt(6)/pi, mu = mean - gamma*beta - the EVT Type-I domain for light-tailed daily sums per Fisher-Tippett), and the 100-month RETURN LEVEL mu - beta*ln(-ln(1-1/100)) = the daily revenue exceeded once per ~8 years. Shape: the corpus pays the one day rollup; block maxima and both moment sums live on the ~79-row month grid (maxima via exact decimal comparisons; BOTH moment sums through the q152 floor-grid recipe - a raw double->decimal cast of the mean term rounded a knife-edge month differently across engines at sf1, amplified ~4e6x by the variance cancellation; variance clamped at 0 per the round-9 ADVICE lesson); all three Gumbel constants are EMBEDDED LITERALS (sqrt(6)/pi, Euler-Mascheroni, the double-log return quantile) so no libm call depends on data and both engines run the identical pinned chain. Honest caveat in the readout: ~79 blocks is a REAL EVT sample size and the RL100 extrapolates beyond the record - that is what return levels are for",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
          .agg(sum(col("o_totalprice").cast(DecimalType(38, 6)))
            .cast("double").as("x"))
        val mx = daily
          .groupBy((year(col("day")) * lit(12) + month(col("day")))
            .cast("long").as("tm"))
          .agg(max(col("x")).as("m"))
        def d6(c: Column) = c.cast(DecimalType(38, 6))
        // moments in MILLIONS of dollars: the 6-dp floor-grid needs
        // x*1e6 inside integer-floor range, and raw maxima (~2e7)
        // squared would push it past both 2^53 and Spark's LONG floor
        val m6 = col("m") / lit(1e6)
        // BOTH moment terms go through the floor-grid before the decimal
        // cast: a raw double→DECIMAL(38,6) cast rounds the binary
        // expansion, and a value landing within ~5e-7 of a grid boundary
        // rounds differently in the two engines (DuckDB decides on
        // fl(x*1e6), Spark on the exact expansion — caught at sf1, month
        // 23951: 172.257538 vs ...539, amplified x4e6 by the variance
        // cancellation). floor(x*1e6+0.5) decides on the identical double
        // in both engines, so the grid value is engine-independent.
        val mo = mx.agg(lcount(lit(1)).as("nb"),
          sum(d6(floor(m6 * lit(1e6) + lit(0.5)) / lit(1e6)))
            .cast("double").as("s1"),
          sum(d6(floor(m6 * m6 * lit(1e6) + lit(0.5)) / lit(1e6)))
            .cast("double").as("s2"))
        val mean = col("s1") / col("nb").cast("double") * lit(1e6)
        val sd = sqrt(greatest(lit(0.0),
          col("s2") / col("nb").cast("double")
            - (col("s1") / col("nb").cast("double"))
            * (col("s1") / col("nb").cast("double")))) * lit(1e6)
        val beta = sd * lit(0.779696801233676)
        val mu = mean - lit(0.5772156649015329) * beta
        val rl = mu - beta * lit(-4.600149226776579)
        mo.select(col("nb").as("n_blocks"),
          (floor(mean * lit(1e4) + lit(0.5)) / lit(1e4)).as("mean_max"),
          (floor(sd * lit(1e4) + lit(0.5)) / lit(1e4)).as("sd_max"),
          (floor(beta * lit(1e4) + lit(0.5)) / lit(1e4)).as("gumbel_beta"),
          (floor(mu * lit(1e4) + lit(0.5)) / lit(1e4)).as("gumbel_mu"),
          (floor(rl * lit(1e4) + lit(0.5)) / lit(1e4)).as("return_level_100"))
      },
      Some("""WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS x FROM orders GROUP BY 1), mx AS (SELECT CAST(year(day) * 12 + month(day) AS BIGINT) AS tm, max(x) / 1e6 AS m6 FROM daily GROUP BY 1), mo AS (SELECT CAST(count(*) AS BIGINT) AS nb, CAST(SUM(CAST(floor(m6 * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))) AS DOUBLE) AS s1, CAST(SUM(CAST(floor(m6 * m6 * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))) AS DOUBLE) AS s2 FROM mx), f AS (SELECT nb, s1 / CAST(nb AS DOUBLE) * 1e6 AS mean, sqrt(greatest(0.0, s2 / CAST(nb AS DOUBLE) - (s1 / CAST(nb AS DOUBLE)) * (s1 / CAST(nb AS DOUBLE)))) * 1e6 AS sd FROM mo), g AS (SELECT nb, mean, sd, sd * 0.779696801233676 AS beta, mean - 0.5772156649015329 * (sd * 0.779696801233676) AS mu FROM f) SELECT nb AS n_blocks, floor(mean * 1e4 + 0.5) / 1e4 AS mean_max, floor(sd * 1e4 + 0.5) / 1e4 AS sd_max, floor(beta * 1e4 + 0.5) / 1e4 AS gumbel_beta, floor(mu * 1e4 + 0.5) / 1e4 AS gumbel_mu, floor((mu - beta * -4.600149226776579) * 1e4 + 0.5) / 1e4 AS return_level_100 FROM g""")),

    QueryDef("q124_histogram_quantiles",
      "fixed-bounds histogram quantiles per (event_type, day) — the STREAMING-NATIVE quantile form (EventStreams.histogramQuantilesStream is the watermarked twin; StreamingSpec proves row equality): 32 caller-bounded buckets over [0, 600] (the SLO/latency-bucket convention; out-of-range clamps to edge buckets), p50/p90/p99 by within-bucket linear interpolation with a PROVABLE one-bucket-width error (600/32 = 18.75). State per (key, window) is exactly 32 mergeable counters — the form that incrementalizes, vs q120's exact two-pass refinement which needs raw rows a stream no longer holds. The derivation is pure higher-order-function column arithmetic over the counts array (cumulative fold + first-covering-bucket search — no explode before the aggregate, no second stateful op), so batch and streaming share one plan shape",
      (s, d) => graft.ops.TimeSeriesOps.histogramQuantiles(
          t(s, d, "events"), "event_type", "ts", "value", "1 day",
          lo = 0.0, hi = 600.0, buckets = 32, ps = Seq(0.5, 0.9, 0.99))
        .select(col("event_type"), unix_micros(col("win_start")).as("day_start_us"),
                col("p"), col("value_est"), col("n")),
      Some("""WITH b AS (SELECT event_type, date_trunc('day', ts) AS day, greatest(0, least(31, CAST(floor((value - 0.0) / (600.0/32)) AS INT))) AS bucket FROM events), c AS (SELECT event_type, day, bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3), cu AS (SELECT event_type, day, bucket, c, CAST(SUM(c) OVER (PARTITION BY event_type, day ORDER BY bucket) AS BIGINT) AS cum FROM c), n AS (SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1, 2), ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS p), sel AS (SELECT cu.event_type, cu.day, ps.p, n.n, cu.bucket, cu.c, cu.cum - cu.c AS cumb, row_number() OVER (PARTITION BY cu.event_type, cu.day, ps.p ORDER BY cu.bucket) AS rn FROM cu JOIN n USING (event_type, day) CROSS JOIN ps WHERE cu.cum >= ps.p * n.n AND cu.c > 0) SELECT event_type, epoch_us(day) AS day_start_us, p, CAST(0.0 + (600.0/32) * (bucket + (p * n - cumb) / c) AS DOUBLE) AS value_est, n FROM sel WHERE rn = 1""")),

    QueryDef("q122_psi_selfeval",
      "PSI drift-monitor SELF-EVALUATION (the measure-your-own-detector pattern of q96/q100/q106, VERDICT r8 #8): the engine injects a KNOWN drift and verifies its own q115 monitor separates it from sampling noise. Three deterministic scenarios over l_extendedprice — 'identical' (even-key half vs itself: PSI must be exactly 0), 'split' (even vs odd halves: pure sampling noise, expected under the 0.1 stability bar), 'injected' (even vs odd ×1.3: a 30% uniform scale shift, expected over the 0.25 action bar) — each graded with the industry 0.1/0.25 thresholds. One corpus pass builds all three populations via a per-row conditional explode (≤4 entries/row); binning/fractions/rounding reuse q115's exact recipe (global min/max per scenario broadcast back, +0.5/+5.0 continuity correction, 4-dp-rounded ln contributions, exact-decimal total), so the verdicts are engine-independent facts",
      (s, d) => {
        val src = t(s, d, "lineitem")
          .select((col("l_orderkey") % 2 === 0).as("even"),
                  col("l_extendedprice").as("v"))
        val pop = src.select(explode(
            when(col("even"), array(
              struct(lit("identical").as("sc"), lit("base").as("side"), col("v").as("v")),
              struct(lit("identical").as("sc"), lit("new").as("side"), col("v").as("v")),
              struct(lit("split").as("sc"), lit("base").as("side"), col("v").as("v")),
              struct(lit("injected").as("sc"), lit("base").as("side"), col("v").as("v"))))
            .otherwise(array(
              struct(lit("split").as("sc"), lit("new").as("side"), col("v").as("v")),
              struct(lit("injected").as("sc"), lit("new").as("side"),
                     (col("v") * 1.3).as("v"))))).as("e"))
          .select(col("e.sc").as("sc"), col("e.side").as("side"), col("e.v").as("v"))
        val st = pop.groupBy(col("sc")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val binned = pop.join(broadcast(st), Seq("sc"))
          .select(col("sc"), col("side"),
            least(lit(9.0), floor((col("v") - col("mn")) /
              ((col("mx") - col("mn")) / 10.0))).cast("long").as("bin"))
        val counts = binned.groupBy(col("sc"), col("bin"))
          .agg(count(when(col("side") === "base", 1)).cast("long").as("n_base"),
               count(when(col("side") === "new", 1)).cast("long").as("n_new"))
        val totals = counts.groupBy(col("sc"))
          .agg(sum(col("n_base")).as("tb"), sum(col("n_new")).as("tn"))
        val psi = counts.join(broadcast(totals), Seq("sc"))
          .withColumn("p", (col("n_base") + 0.5) / (col("tb") + 5.0))
          .withColumn("q", (col("n_new") + 0.5) / (col("tn") + 5.0))
          .withColumn("pc", round((col("p") - col("q")) * log(col("p") / col("q")), 4))
          .groupBy(col("sc"))
          .agg(sum(col("pc").cast("decimal(38,6)")).cast("double").as("psi"))
        psi.select(col("sc").as("scenario"), col("psi"),
          when(col("psi") < 0.1, lit("stable"))
            .when(col("psi") < 0.25, lit("moderate"))
            .otherwise(lit("shifted")).as("verdict"))
      },
      Some("""WITH src AS (SELECT (l_orderkey % 2 = 0) AS even, l_extendedprice AS v FROM lineitem), pop AS (SELECT 'identical' AS sc, 'base' AS side, v FROM src WHERE even UNION ALL SELECT 'identical', 'new', v FROM src WHERE even UNION ALL SELECT 'split', 'base', v FROM src WHERE even UNION ALL SELECT 'split', 'new', v FROM src WHERE NOT even UNION ALL SELECT 'injected', 'base', v FROM src WHERE even UNION ALL SELECT 'injected', 'new', v * 1.3 FROM src WHERE NOT even), st AS (SELECT sc, min(v) AS mn, max(v) AS mx FROM pop GROUP BY 1), b AS (SELECT sc, side, CAST(least(9.0, floor((v - mn) / ((mx - mn) / 10.0))) AS BIGINT) AS bin FROM pop JOIN st USING (sc)), c AS (SELECT sc, bin, CAST(count(*) FILTER (WHERE side = 'base') AS BIGINT) AS n_base, CAST(count(*) FILTER (WHERE side = 'new') AS BIGINT) AS n_new FROM b GROUP BY 1, 2), t AS (SELECT sc, SUM(n_base) AS tb, SUM(n_new) AS tn FROM c GROUP BY 1), e AS (SELECT sc, round(((n_base + 0.5)/(tb + 5.0) - (n_new + 0.5)/(tn + 5.0)) * ln(((n_base + 0.5)/(tb + 5.0)) / ((n_new + 0.5)/(tn + 5.0))), 4) AS pc FROM c JOIN t USING (sc)), p AS (SELECT sc, CAST(SUM(CAST(pc AS DECIMAL(38,6))) AS DOUBLE) AS psi FROM e GROUP BY 1) SELECT sc AS scenario, psi, CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate' ELSE 'shifted' END AS verdict FROM p""")),

    QueryDef("q112_unpivot",
      "UNPIVOT/melt (the inverse of q40's pivot, completing the reshape family): lineitem's four per-line charge columns melted to (metric, val) long form — the feature-long layout ML preprocessing wants — then per-metric count/exact-decimal-sum/min/max over the melted rows (the canonical melt->aggregate usage; aggregating also keeps both engines' bench outputs small instead of timing a 2.4M-row result fetch). Spark's native unpivot is a map-side Expand (one pass, rowsx4, no join); the only shuffle is the 4-key metric aggregate, against a portable UNION ALL oracle",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
                 Array(col("l_quantity"), col("l_extendedprice"),
                       col("l_discount"), col("l_tax")),
                 "metric", "val")
        .groupBy(col("metric"))
        .agg(lcount(lit(1)).as("n"), dsum(col("val")).as("val_sum"),
             min(col("val")).as("val_min"), max(col("val")).as("val_max")),
      Some("""WITH long AS (SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT 'l_discount', l_discount FROM lineitem UNION ALL SELECT 'l_tax', l_tax FROM lineitem) SELECT metric, CAST(count(*) AS BIGINT) AS n, CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS val_sum, MIN(val) AS val_min, MAX(val) AS val_max FROM long GROUP BY 1"""))
  )
}
