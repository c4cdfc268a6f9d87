package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark's planner turns a pure
  * inequality join (`p.ts BETWEEN i.start AND i.end`) into a
  * BroadcastNestedLoopJoin (or worse, a cartesian) — O(|points|×|ivs|)
  * comparisons. This operator makes it an EQUI-join:
  *
  *  - every interval is exploded to the time buckets it covers
  *    (`bucketSeconds` wide);
  *  - every point maps to its single bucket;
  *  - join on (bucket, extra equi keys), then the exact `[start, end)`
  *    predicate filters within the bucket.
  *
  * Each point lands in exactly one bucket, so matches are emitted once
  * — no distinct needed. Cost: |intervals| × (span/bucketSeconds)
  * replicated rows; pick bucketSeconds near the median interval span so
  * the replication factor stays O(1). The shuffle is a plain hash
  * exchange on (bucket, keys) — distributed, AQE-skew-splittable,
  * nothing nested-loop anywhere.
  */
object RangeJoin {

  /** @param keys additional equi-join keys (e.g. user_id) present on
    *             both sides — they ride in the hash key, sharpening the
    *             shuffle distribution and shrinking bucket fan-in. */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L // work in microseconds
    val p = points.withColumn("__bucket", floor(unix_micros(col(tsCol)) / w))
    // inverted intervals (end < start — swapped columns, zeroed
    // timestamps) can match nothing, but sequence() would still step
    // BACKWARDS through the whole span (a 1970 epoch default explodes
    // to ~10⁷ bucket rows before the filter discards them all) — drop
    // them up front, which is semantics-preserving and free
    val iv = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(floor(unix_micros(col(startCol)) / w),
                         floor(unix_micros(col(endCol)) / w))))
    p.join(iv, Seq("__bucket") ++ keys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
