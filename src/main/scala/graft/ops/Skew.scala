package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's
  * skew-join split, for the cases AQE can't fix (skewed AGGREGATION
  * keys, or a skewed join where the hot side must stay unsplit).
  *
  * At 100 TB a single hot key (empty-string document, null user, the
  * "the quick brown fox" shingle) can pin one reducer for hours; both
  * helpers bound any reducer's share of a key to 1/saltBuckets.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(keys + salt) computes bounded
    * partials, then a second groupBy(keys) merges them. `partialAggs`
    * must be decomposable (sum/count/min/max — the partial and final
    * functions coincide after renaming).
    *
    * saltedAgg(df, Seq(col("k")), 16, count(lit(1)).as("n") -> sum(col("n")).cast("long").as("n"))
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int,
                aggs: (Column, Column)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(aggs.head._1, aggs.tail.map(_._1): _*)
    partial
      .groupBy(keys: _*)
      .agg(aggs.head._2, aggs.tail.map(_._2): _*)
  }

  /** Salted join of a skewed fact side against a dimension: the fact
    * side gets a random-ish salt in [0, saltBuckets); the dimension is
    * exploded ×saltBuckets so every (key, salt) pair finds its match.
    * Correct for inner/left joins on `key`; dimension must be the small
    * side (it is replicated saltBuckets times).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
