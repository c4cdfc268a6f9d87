package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type-2) interval machinery: the
  * batch build (q116's gaps-and-islands-on-change, factored) and the
  * INCREMENTAL MERGE — the warehouse `MERGE INTO` that folds a delta of
  * new events into an existing dimension without re-reading history.
  *
  * Output schema (both entry points): (user_id, run, event_type,
  * valid_from_us, valid_to_us, n_events) — one row per consecutive run
  * of the same event_type per user; valid_to_us NULL marks the open
  * (current) row.
  *
  * The merge contract, proven by WarehouseSpec and the q134 oracle
  * (which is the BATCH SQL over the full stream): for any cutoff T,
  *   merge(build(events < T), events >= T) == build(events)
  * row-for-row, run ids included. The trick is the SEED ROW: each
  * touched user's open interval re-enters the run machinery as one
  * pseudo-event carrying its valid_from as ts, its n_events as weight,
  * and (run − 1) as the per-user run base — so a delta that continues
  * the open run extends it in place (same run id, same valid_from,
  * summed n_events) and a delta that changes type closes it exactly
  * where the batch build would.
  *
  * Scale contract: every stage — the open/closed split (semi/anti join
  * on delta users), the seed union, the change-detection window, the
  * run aggregate, the interval-closing lead — keys on user_id, so the
  * whole merge is ONE partitioning; only rows of users PRESENT IN THE
  * DELTA are rewritten (closed history and untouched users pass through
  * untouched — at 100 TB that is the difference between rewriting a
  * dimension and appending to it).
  */
object Scd2 {

  /** Batch build from an event stream with columns
    * (user_id, ts, event_id, event_type). */
  def build(events: DataFrame): DataFrame =
    buildWeighted(events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("w", lit(1L)).withColumn("base", lit(0L)))

  /** Run detection over (user_id, ts, event_id, event_type, w, base):
    * `w` is the row's event weight (seed rows carry their interval's
    * n_events), `base` a per-user constant added to the run counter
    * (seed rows re-number the recomputed segment to continue the old
    * dimension's run sequence). */
  private[graft] def buildWeighted(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run"))
    ev
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
             lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run",
        col("base") + sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run"))
      .agg(max(col("event_type")).as("event_type"),
           min(col("ts")).as("vf"),
           sum(col("w")).cast("long").as("n_events"))
      .select(col("user_id"), col("run"), col("event_type"),
              unix_micros(col("vf")).as("valid_from_us"),
              lead(unix_micros(col("vf")), 1).over(wRun).as("valid_to_us"),
              col("n_events"))
  }

  /** Incremental merge: `dimOld` is a previous [[build]] output,
    * `delta` the events strictly after the old build's horizon
    * (columns user_id, ts, event_id, event_type; every delta ts must be
    * ≥ every old ts — the append-only contract of an event log). */
  def merge(dimOld: DataFrame, delta: DataFrame): DataFrame = {
    // materialize the dimension once: the merge reads it through four
    // branches (semi/anti split, open/closed filters) and plan-level
    // subtree reuse across union branches is not guaranteed — without
    // this a dimOld that is itself a build(...) plan re-runs its window
    // machinery four times (the dedupGroups precedent; in production
    // dimOld is a stored table and this is a no-op-cost scan)
    val dim = dimOld.localCheckpoint(true)
    val deltaEv = delta
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val deltaUsers = deltaEv.select(col("user_id")).distinct()
    val touched = dim.join(deltaUsers, Seq("user_id"), "left_semi")
    val untouched = dim.join(deltaUsers, Seq("user_id"), "left_anti")
    val open = touched.filter(col("valid_to_us").isNull)
    val closed = touched.filter(col("valid_to_us").isNotNull)
    // the open interval as a weighted pseudo-event; Long.MinValue as
    // event_id keeps it first among equal timestamps (delta timestamps
    // are strictly later anyway under the append-only contract)
    val seed = open.select(col("user_id"),
      timestamp_micros(col("valid_from_us")).as("ts"),
      lit(Long.MinValue).as("event_id"), col("event_type"),
      col("n_events").as("w"), (col("run") - 1L).as("base"))
    val deltaWithBase = deltaEv
      .join(open.select(col("user_id"), (col("run") - 1L).as("base")),
            Seq("user_id"), "left")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
              lit(1L).as("w"), coalesce(col("base"), lit(0L)).as("base"))
    val recomputed = buildWeighted(seed.unionByName(deltaWithBase))
    untouched.unionByName(closed).unionByName(recomputed)
  }
}
