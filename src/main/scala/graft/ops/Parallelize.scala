package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Window}

/** Partition-count guard for CPU-heavy per-row stages (shingling,
  * hashing, vector math).
  *
  * On a real cluster a 100 TB table arrives in ~100k input splits and
  * this is a no-op. The guarded case is the other end of the scale
  * spectrum: a small table stored as ONE parquet row-group (e.g. a
  * dimension snapshot, or the local bench fixtures) gives the scan a
  * single partition, and any expensive per-row compute downstream
  * serializes onto one core no matter how many executors exist. A
  * round-robin repartition costs one tiny shuffle and buys full
  * parallelism for the compute stage.
  */
object Parallelize {

  /** Repartition to the default parallelism iff the plan is a narrow
    * scan pipeline whose estimated split count is under half that;
    * otherwise leave the plan (and its existing partitioning) untouched.
    *
    * The probe is driver-side only: it reads the optimized logical
    * plan's size statistics — never `df.rdd`, which under AQE compiles
    * (and eagerly executes the shuffle stages of) a throwaway physical
    * plan just to report a partition count, doubling the upstream work
    * of every dedup call on a derived DataFrame. Plans that already
    * contain an exchange-inducing operator (join / aggregate / window /
    * repartition) inherit `spark.sql.shuffle.partitions` from that
    * exchange and are left alone.
    */
  def forCompute(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    val hasExchange = plan.exists {
      case _: Join | _: Aggregate | _: Window | _: RepartitionOperation => true
      // a cached relation REPLACES the subtree it was built from, so a
      // table cached as repartition(scan) (Bench's warm tier) shows up
      // here as a bare InMemoryRelation leaf — without this case the
      // already-32-way cache would be repartitioned a second time,
      // paying one full extra shuffle of the payload per call. The
      // cached PHYSICAL plan is probed the same way this match probes
      // the logical plan: did the plan the cache was built from carry
      // an exchange? (outputPartitioning is useless here — under AQE
      // the cached plan is an AdaptiveSparkPlanExec reporting Unknown
      // until finalized, and AQE wraps exactly the exchange-bearing
      // plans, so the wrapper itself is evidence of a shuffle; a
      // cached bare scan is NOT wrapped and correctly falls through
      // to the size-based repartition decision below)
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.exists {
          case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => true
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
          case _ => false
        }
      case _ => false
    }
    if (hasExchange) df
    else {
      val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
      // sizeInBytes for file relations = sum of file sizes, the same
      // quantity FilePartition packing splits by — a faithful estimate
      // of scan parallelism without touching the physical plan
      val estSplits = (plan.stats.sizeInBytes / maxSplit) + 1
      if (estSplits >= BigInt(math.max(2, want / 2))) df
      else df.repartition(want)
    }
  }
}
