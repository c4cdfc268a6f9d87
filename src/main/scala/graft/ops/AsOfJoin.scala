package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the most recent right row
  * of the same key with right.ts STRICTLY before left.ts.
  *
  * Spark-first formulation — the union + last-observed-carry-forward
  * window, not a per-row lookup: tag both inputs, sort each key's
  * timeline once, and let `last(_, ignoreNulls)` carry the latest right
  * timestamp forward. ONE shuffle + sort total, the same cost class as
  * any windowed aggregation — versus a naive range join's quadratic
  * key-group blowup. Equal timestamps do NOT match (right rows sort
  * after left rows on ties), matching `ASOF JOIN ... ON l.ts > r.ts`.
  *
  * Returns the left rows plus `asof_<valueName>` = the matched right
  * timestamp (null when no earlier right row exists).
  */
object AsOfJoin {

  def lastBefore(left: DataFrame, right: DataFrame,
                 keyCol: String, tsCol: String,
                 valueName: String = "right_ts"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(0))
      .withColumn("__pts", lit(null).cast(left.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol))
      .withColumn("__tag", lit(1))
      .withColumn("__pts", col(tsCol))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // rights at the same ts sort AFTER lefts (__tag 1 > 0), so a left
    // row only sees strictly-earlier rights — and last(__pts) is
    // deterministic under right-ts ties because the carried value IS
    // the sort key.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    combined
      .withColumn(s"asof_$valueName", last(col("__pts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(leftCols.map(col) :+ col(s"asof_$valueName"): _*)
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row of the
    * same key with right.ts strictly after left.ts (pandas
    * `merge_asof(direction='forward')`, strict). Mirror of
    * [[lastBefore]]: rights at the same ts sort BEFORE lefts
    * (__tag −1 < 0) so they fall outside the left row's following
    * frame — strictly-later rights only. Same one-shuffle cost class. */
  def firstAfter(left: DataFrame, right: DataFrame,
                 keyCol: String, tsCol: String,
                 valueName: String = "right_ts"): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__tag", lit(0))
      .withColumn("__pts", lit(null).cast(left.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol))
      .withColumn("__tag", lit(-1))
      .withColumn("__pts", col(tsCol))
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    combined
      .withColumn(s"asof_$valueName", first(col("__pts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(leftCols.map(col) :+ col(s"asof_$valueName"): _*)
  }

  /** The nearest-selection COLUMN over already-computed directional
    * matches (no window of its own): the closer of `prevCol`/`nextCol`
    * relative to `tsCol`, ties broken BACKWARD (pandas semantics),
    * matches farther than `toleranceUs` µs dropped to null. Exposed so
    * a caller that already ran both directional passes (e.g. q113) pays
    * ZERO extra window stages for the nearest column. */
  def nearestCol(tsCol: String, prevCol: String, nextCol: String,
                 toleranceUs: Long): Column = {
    val dPrev = unix_micros(col(tsCol)) - unix_micros(col(prevCol))
    val dNext = unix_micros(col(nextCol)) - unix_micros(col(tsCol))
    val nearest =
      when(col(prevCol).isNull, col(nextCol))
        .when(col(nextCol).isNull, col(prevCol))
        .when(dNext < dPrev, col(nextCol))
        .otherwise(col(prevCol))
    val dist = unix_micros(nearest) - unix_micros(col(tsCol))
    when(abs(dist) <= toleranceUs, nearest)
  }

  /** NEAREST as-of within a tolerance (pandas
    * `merge_asof(direction='nearest', tolerance=...)`, strict on both
    * sides): [[nearestCol]] over the two directional passes — two
    * window stages on the same (key, ts) partitioning, so at scale the
    * second reuses the first's exchange. */
  def nearestWithin(left: DataFrame, right: DataFrame,
                    keyCol: String, tsCol: String, toleranceUs: Long,
                    valueName: String = "right_ts"): DataFrame = {
    val leftCols = left.columns
    val withBoth = firstAfter(lastBefore(left, right, keyCol, tsCol, "__prev"),
                              right, keyCol, tsCol, "__next")
    withBoth
      .withColumn(s"asof_$valueName",
        nearestCol(tsCol, "asof___prev", "asof___next", toleranceUs))
      .select(leftCols.map(col) :+ col(s"asof_$valueName"): _*)
  }
}
