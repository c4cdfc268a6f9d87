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

  /** NEAREST as-of within a tolerance (pandas
    * `merge_asof(direction='nearest', tolerance=...)`, strict on both
    * sides): the closer of the strictly-before and strictly-after
    * matches, ties broken BACKWARD (pandas semantics), matches farther
    * than `toleranceUs` µs dropped to null. Composes the two directional
    * passes — two window stages over the same (key, ts) partitioning,
    * so at scale the second reuses the first's exchange. */
  def nearestWithin(left: DataFrame, right: DataFrame,
                    keyCol: String, tsCol: String, toleranceUs: Long,
                    valueName: String = "right_ts"): DataFrame = {
    val leftCols = left.columns
    val withPrev = lastBefore(left, right, keyCol, tsCol, "__prev")
    val withBoth = firstAfter(withPrev, right, keyCol, tsCol, "__next")
    val dPrev = unix_micros(col(tsCol)) - unix_micros(col("asof___prev"))
    val dNext = unix_micros(col("asof___next")) - unix_micros(col(tsCol))
    val nearest =
      when(col("asof___prev").isNull, col("asof___next"))
        .when(col("asof___next").isNull, col("asof___prev"))
        .when(dNext < dPrev, col("asof___next"))
        .otherwise(col("asof___prev"))
    val dist = unix_micros(nearest) - unix_micros(col(tsCol))
    withBoth
      .withColumn(s"asof_$valueName",
        when(abs(dist) <= toleranceUs, nearest))
      .select(leftCols.map(col) :+ col(s"asof_$valueName"): _*)
  }
}
