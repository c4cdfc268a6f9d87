package graft.ops

import graft.functions.TextFunctions
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002;
  * the estimator family behind DataSketches' theta sketch).
  *
  * Why next to q37's HLL: Spark's `approx_count_distinct` is a fine
  * engine-internal estimator, but its register contents are
  * engine-SPECIFIC — the estimate itself can never be verified against
  * another engine, only bounded (q37's within-5% check). KMV built on
  * the portable 60-bit md5 hash is the opposite trade: the sketch IS
  * `k` concrete hash values, so the k-smallest set, the kth value, and
  * therefore the ESTIMATE are bit-reproducible in any engine with md5
  * — the DuckDB oracle hash-matches the estimate, not just a bound.
  *
  * Estimator: with `m_k` = the kth smallest of the distinct 60-bit
  * hashes (uniform on [0, 2^60)), distinct-count ≈ (k-1)·2^60 / m_k;
  * when fewer than k distinct values exist the sketch is the complete
  * hash set and the count is exact. Standard error ≈ 1/sqrt(k-2).
  *
  * Scale: the sketch build is the map-side-bounded [[TopK]] operator —
  * every input partition reduces to ≤ k rows per group BEFORE the
  * exchange, so a group with 10⁹ members ships k rows, not 10⁹ (the
  * same bounded-heap argument as q62). KMV sketches are mergeable
  * (k smallest of a union = k smallest of the per-part sketch union),
  * which is exactly what the partial/final heap pair computes.
  */
object KmvSketch {

  /** Size of the portable-hash value space: 2^60 (15 hex chars). */
  val HashSpace: Double = 1152921504606846976.0

  /** Per-group KMV sketch rows (`g`, `h`): the k smallest DISTINCT
    * portable hashes of `value` per `group`. The distinct runs first
    * (map-side partial dedup) so duplicate members can never occupy
    * two of the k slots. */
  def sketch(df: DataFrame, group: Column, value: Column, k: Int, seed: Int): DataFrame = {
    val hashed = df
      .select(group.as("g"), TextFunctions.portableHash(value.cast("string"), seed).as("h"))
      .distinct()
    sketchHashed(hashed)(k)
  }

  /** Sketch build over an ALREADY-hashed distinct (`g`, `h`) frame —
    * for callers that keep the whole analysis on the hash plane (one
    * corpus pass feeding exact counts, sketches, and overlaps). */
  def sketchHashed(hashed: DataFrame)(k: Int): DataFrame =
    TopK.perKey(hashed, Seq(col("g")), Seq(col("h")), k)

  /** Distinct-count estimate from (sketch row count, kth-smallest hash),
    * 4-dp floor-rounded with the portable recipe. Mirrors the oracle
    * expression token for token — same literals, same associativity —
    * so the doubles are bit-identical cross-engine. */
  def estimate(sketchSize: Column, kthHash: Column, k: Int): Column =
    when(sketchSize < k, sketchSize.cast("double"))
      .otherwise(
        floor(lit((k - 1).toDouble) * lit(HashSpace) / kthHash.cast("double") * 1e4 + 0.5) / 1e4)

  /** SQL fragment for the same estimator over (`szExpr`, `mkExpr`). */
  def estimateSql(szExpr: String, mkExpr: String, k: Int): String =
    s"CASE WHEN $szExpr < $k THEN CAST($szExpr AS DOUBLE) ELSE " +
      s"floor(${(k - 1).toDouble} * 1152921504606846976.0 / CAST($mkExpr AS DOUBLE) * 1e4 + 0.5) / 1e4 END"
}
