package graft.ops

import org.apache.spark.sql.DataFrame

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

  /** Repartition to the default parallelism iff the plan currently has
    * fewer than half that many partitions; otherwise leave the plan (and
    * its existing partitioning) untouched. */
  def forCompute(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, want / 2)) df
    else df.repartition(want)
  }
}
