package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * tables are grid-sized and broadcast.
  *
  * Result: (group, p, value) with `percentile`/`quantile_cont`
  * interpolation semantics — lo + (k − ⌊k⌋)·(hi − lo) on the two
  * neighboring order statistics.
  */
object Quantiles {

  /** @param statsOpt optional precomputed per-group (group, n, mn, mx)
    *   frame — groups' non-null counts and exact min/max. When the
    *   input is a melt of a wide table, one no-Expand aggregate over
    *   the wide form produces this and saves a whole corpus pass
    *   (q119); table-metadata stats work too. Must agree exactly with
    *   the data or bucket location breaks. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     ps: Seq[Double], buckets: Int = 1024,
                     statsOpt: Option[DataFrame] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions must be in [0,1]: $ps")
    val in = df.select(col(groupCol).as("g"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
    // the grid-sized intermediates (group stats, histogram cumsums,
    // rank targets) are each REUSED by later stages — materialize them
    // once (they are ≤ groups×buckets rows) or every broadcast re-scans
    // and re-derives the corpus-sized input: measured 3.5 s → 1 s on
    // the q119 melt. The corpus itself is never checkpointed.
    val stats = statsOpt
      .map(_.select(col(groupCol).as("g"), col("n"), col("mn"), col("mx")))
      .getOrElse(in.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx")))
      .localCheckpoint(true)
    // bucket id: equal-width over [mn, mx]; constant groups (mx == mn)
    // collapse to bucket 0. The expression is shared by both passes so
    // assignment is bit-identical.
    def bucketOf(v: Column): Column =
      when(col("mx") > col("mn"),
        least(lit(buckets - 1),
          floor((v - col("mn")) / ((col("mx") - col("mn")) / buckets))
            .cast("int")))
        .otherwise(lit(0))
    val hist = in.join(broadcast(stats), Seq("g"))
      .groupBy(col("g"), bucketOf(col("v")).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("below", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .localCheckpoint(true)
    // the order statistics every requested p needs: k = (n-1)p, ranks
    // ⌊k⌋ and ⌈k⌉ (distinct-aggregated — p=0.5 and p=1 may share ranks)
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
    // pass 2 over only the target buckets — but rank DISTINCT VALUES
    // with cumulative counts, never rows: a tie-heavy bucket (a
    // discrete column can drop 10% of the corpus on one value) would
    // make a row_number partition corpus-sized, while its distinct
    // values stay few. The order statistic at local index i is the
    // value whose cumulative-count range contains i.
    val targetBuckets = targets.select(col("g"), col("b")).distinct()
    val valCounts = in.join(broadcast(stats), Seq("g"))
      .withColumn("b", bucketOf(col("v")))
      .join(broadcast(targetBuckets), Seq("g", "b"))
      .groupBy(col("g"), col("b"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wVal = Window.partitionBy(col("g"), col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val statValues = valCounts
      .withColumn("vbelow", coalesce(sum(col("c")).over(wVal), lit(0L)))
      .join(broadcast(targets), Seq("g", "b"))
      .filter(col("local") >= col("vbelow") &&
              col("local") < col("vbelow") + col("c"))
      .select(col("g"), col("rank"), col("v"))
    // interpolate: value(p) = lo + (k - ⌊k⌋) * (hi - lo); for integer k
    // the two rank branches resolve to the same row (lo == hi)
    needs.join(statValues, Seq("g", "rank"))
      .groupBy(col("g"), col("p"), col("k"))
      .agg(max(when(col("rank") === floor(col("k")).cast("long"), col("v"))).as("lo"),
           max(when(col("rank") === ceil(col("k")).cast("long"), col("v"))).as("hi"))
      .select(col("g").as(groupCol), col("p"),
        (col("lo") + (col("k") - floor(col("k"))) * (col("hi") - col("lo")))
          .as("value"))
  }
}
