package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric helpers shared by every query that must hash-match a DuckDB
  * oracle (SURVEY.md §5, §7.4).
  *
  * Floating-point sums are NOT associative, and both Spark and DuckDB
  * aggregate in nondeterministic partition order — so any double SUM over
  * many rows differs between engines in the low bits. The fix used across
  * the engine: sum in exact DECIMAL(38,6) (order-independent), cast the
  * exact result back to double. Per-row double arithmetic (+,*,-,/) is
  * IEEE-deterministic and needs no such treatment.
  */
object Num {
  /** Exact-sum input type. A compact-Long (18,6) variant was A/B'd in
    * round 6 and measured NO gain at sf0.1 (the ~1 s cost of the Q1
    * shape is the per-query scheduling/scan floor, not decimal adds),
    * so the overflow-proof full precision stays. */
  val D: DecimalType = DecimalType(38, 6)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Integer sum normalized to long (DuckDB sums int to HUGEINT). */
  def lsum(c: Column): Column = sum(c).cast("long")

  /** count(...) normalized to long. */
  def lcount(c: Column): Column = count(c).cast("long")

  /** Division that yields null (not Infinity/NaN) on a zero denominator —
    * the reference's inf→NaN dance (main.py:266-269,284-286) normalized,
    * SURVEY.md E9/E11-E13. */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= lit(0), num / den)
}
