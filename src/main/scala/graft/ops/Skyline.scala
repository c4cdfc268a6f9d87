package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier / skyline (q173; Borzsony et al. 2001, "The
  * Skyline Operator"): rows not dominated on (x, y), where q dominates
  * p iff q >= p on both axes and q > p on at least one. Exact
  * duplicates are mutually non-dominating and BOTH survive (standard
  * strict-dominance semantics).
  *
  * Scale form — never the quadratic dominance self-join:
  *
  *  1. bucket x (caller-chosen width; pick bucket count ~1e4 at
  *     100 TB), take max(y) per bucket, and a BOUNDED-grid window
  *     gives hmax(b) = best y in any strictly HIGHER bucket. Any
  *     point with y <= hmax is dominated by an (ultimately unpruned,
  *     by induction up the bucket chain) point with strictly greater
  *     x — bucket floors make "higher bucket" imply "strictly greater
  *     x" — so only y > hmax survives. Pruning is
  *     dominance-transitive-closed: skyline(candidates) ==
  *     skyline(all), and candidates shrink to ~frontier size.
  *  2. the exact pass runs only on candidates: per-x max, then a
  *     frontier-sized cummax window over strictly-greater x (ties on
  *     x keep only that x's max-y rows; equal y at strictly higher x
  *     dominates, hence the STRICT > filter), then a broadcast
  *     membership join back to the candidate rows so duplicates of
  *     surviving points all emerge.
  *
  * The corpus pays whatever produced the input frame plus one pass;
  * the windows run over the bucket grid and the candidate set, both
  * broadcast back. Comparisons happen on the raw column values (no
  * rounding) — callers that must hash-match an oracle should pass
  * already-deterministic x/y.
  */
object Skyline {

  /** Frontier rows of `df` on (xCol maximize, yCol maximize), keeping
    * every input column. `bucketWidth` only affects pruning
    * efficiency, never the result set. */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 bucketWidth: Double): DataFrame = {
    val x: Column = col(xCol)
    val y: Column = col(yCol)
    // tier 1: bucket prune — hmax(b) = max y over strictly higher
    // buckets; y <= hmax(b) is provably dominated
    val b = df.withColumn("__bkt", floor(x / lit(bucketWidth)).cast("long"))
    val wb = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val hmax = b.groupBy(col("__bkt")).agg(max(y).as("__bmax"))
      .withColumn("__hmax", max(col("__bmax")).over(wb))
      .select(col("__bkt"), col("__hmax"))
    // candidates are ~frontier-sized after pruning, and BOTH the exact
    // pass and the final membership join read them — checkpoint so the
    // upstream corpus subtree runs once, not once per consumer
    val cand = b.join(broadcast(hmax), Seq("__bkt"))
      .filter(col("__hmax").isNull || y > col("__hmax"))
      .localCheckpoint(true)
    // tier 2: exact skyline over the pruned candidates
    val wa = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = cand.groupBy(x.as("__x")).agg(max(y).as("__gmax"))
      .withColumn("__amax", max(col("__gmax")).over(wa))
      .filter(col("__amax").isNull || col("__gmax") > col("__amax"))
      .select(col("__x"), col("__gmax"))
    cand.join(broadcast(keep), x === col("__x") && y === col("__gmax"))
      .drop("__bkt", "__hmax", "__x", "__gmax")
  }
}
