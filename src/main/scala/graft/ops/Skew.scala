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
    *
    * This is the UNCONDITIONAL form — every dimension row pays the
    * ×saltBuckets replication whether or not its key is hot. Production
    * callers should prefer [[skewAwareJoin]], which salts only the keys
    * a frequency probe actually finds hot.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-aware fact-dimension join: detect the hot keys first, salt
    * ONLY those, and join the cold majority completely unsalted — the
    * production form of [[saltedJoin]] (round-6 advice: a salt the data
    * doesn't need is a ×saltBuckets dimension replication for nothing).
    *
    * Hot-key detection is a deterministic-seed SAMPLE of the fact side
    * (`sampleFraction`), counting keys and keeping those whose sampled
    * count exceeds `hotThreshold × sampleFraction`. The probe costs one
    * scan over the sample (tiny shuffle on the sampled keys only) and
    * the hot set it yields is bounded by 1/(hotThreshold·fraction) keys
    * — broadcast-sized by construction, so the hot-flag lookups on both
    * join sides stay broadcast.
    *
    * Correctness does NOT depend on the probe: the hot flag only picks
    * each key's salting regime — hot keys spread over real salts with a
    * replicated dimension row per salt, cold keys join on the single
    * salt 0 — so the result equals the unsalted join for ANY hot set (a
    * missed hot key costs performance, never rows). That invariant is
    * what PropertySpec's hot+cold skewAwareJoin tests pin, and why the sampling
    * seed is fixed: the ROUTING is reproducible run to run even though
    * any seed gives the same result set.
    *
    * At 100 TB: this is what AQE's skew-join does for sort-merge joins
    * at runtime; the explicit operator covers the cases AQE can't see —
    * a broadcast-hash plan whose build side is fine but whose STREAM
    * side stalls one task, pre-shuffle-write skew, or a join under an
    * operator AQE won't re-plan. The sample fraction keeps the probe
    * O(corpus/1000) regardless of table size.
    */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, key: String,
                    saltBuckets: Int, hotThreshold: Long,
                    sampleFraction: Double = 0.02,
                    joinType: String = "inner"): DataFrame = {
    require(hotThreshold > 0, s"hotThreshold=$hotThreshold must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction=$sampleFraction must be in (0, 1]")
    // below 1 expected sampled row per hot key the probe cannot tell hot
    // from cold — every key with one sampled row would be flagged "hot"
    // and the broadcast-sized hot-set bound above silently collapses to
    // "all sampled keys" (an unconditional saltedJoin with extra steps)
    require(hotThreshold * sampleFraction >= 1,
      s"hotThreshold=$hotThreshold x sampleFraction=$sampleFraction < 1: " +
        "the probe needs >= 1 expected sampled row per hot key; raise the " +
        "threshold or the fraction")
    // the probe's __n and the routing's __hot/__salt are appended to user
    // frames mid-flight; refuse collisions instead of silently clobbering
    // (same contract as Sampling.prioritySample, round-6 advice)
    Seq(fact -> "fact", dim -> "dim").foreach { case (df, side) =>
      Seq("__hot", "__salt", "__n").foreach(c => require(!df.columns.contains(c),
        s"$side side already has a '$c' column - skewAwareJoin uses it internally; rename it first"))
    }
    val sampledMin = math.max(1L, (hotThreshold * sampleFraction).toLong)
    val hot = fact.sample(withReplacement = false, sampleFraction, seed = 97L)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= sampledMin)
      .select(col(key), lit(true).as("__hot"))
    // ONE join pass, not a hot/cold branch pair: branching would scan
    // the fact table twice (semi + anti). Instead the broadcast hot set
    // flags each row, hot fact rows draw a real salt while cold rows
    // take salt 0, and the dimension replicates ONLY its hot rows
    // (explode of a 1-element array for cold keys). With an empty hot
    // set this degenerates to the plain join plus two broadcast
    // lookups — the no-skew corpus pays nothing.
    val saltedFact = fact
      .join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
          .otherwise(lit(0)).cast("int"))
      .drop("__hot")
    val explodedDim = dim
      .join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
