package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sharded (bounded-partition) twins of the per-group sequential scans:
  * the q61 sequence-packing offsets and [[Sampling.tokenBudgetSelect]].
  *
  * A running sum partitioned by `lang` alone funnels an entire
  * language's corpus through ONE task — the classic scale-killer of a
  * naive prefix sum (an "en" slice of a 100 TB corpus is most of the
  * corpus). The fix is the textbook two-pass scan:
  *
  *  - pass 1: per-(group, shard) token totals — a tiny aggregate, one
  *    row per shard, full map-side combine;
  *  - prefix: running sum over those totals in shard order — a window
  *    over ≤ nShards rows per group, trivially bounded;
  *  - pass 2: within-shard running sum (window partition bounded by the
  *    shard width) plus the broadcast-joined shard base offset.
  *
  * Because shards are CONTIGUOUS ranges of the global order key
  * (doc-id ranges for packing; quality-range buckets for budget
  * selection, where every doc in a higher bucket sorts before every doc
  * in a lower one), concatenating shards in shard order IS the global
  * order — so the output is row-for-row IDENTICAL to the single-window
  * form. Proven two ways: ShardedPrefixSpec's property test (random
  * corpora, exact equality vs the unsharded plan) and q61b/q68b, which
  * reuse q61/q68's oracle SQL verbatim and hash-match it.
  */
object ShardedPrefix {

  /** q61 twin: global running token offsets in `idCol` order per group,
    * sharded by fixed id ranges (shard = floor(id / shardWidth) — a
    * pure function of the row, stable under reruns and cluster size; a
    * production build picks shardWidth from the id distribution).
    * Output: (grp, doc_id, n_tokens, start_off) where start_off is the
    * number of tokens strictly before this doc in the global order. */
  def packedOffsets(docs: DataFrame, groupCol: String, idCol: String,
                    tokensCol: String, shardWidth: Long): DataFrame = {
    require(shardWidth > 0, s"shardWidth=$shardWidth must be positive")
    val base = docs.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        col(tokensCol).as("n_tokens"))
      .withColumn("shard", floor(col("doc_id") / shardWidth))
    val wShards = Window.partitionBy(col("grp")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = base.groupBy(col("grp"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("shard_base",
        sum(col("shard_tokens")).over(wShards) - col("shard_tokens"))
      .select(col("grp"), col("shard"), col("shard_base"))
    val wWithin = Window.partitionBy(col("grp"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(bases), Seq("grp", "shard"))
      .withColumn("start_off",
        col("shard_base") + sum(col("n_tokens")).over(wWithin) - col("n_tokens"))
      .select(col("grp"), col("doc_id"), col("n_tokens"), col("start_off"))
  }

  /** q68 twin: greedy token-budget selection in (quality desc, doc_id)
    * order per group, sharded by quality-RANGE buckets (the first-pass
    * histogram split the unsharded operator's Scaladoc promises).
    * Bucket b holds quality in [b/n, (b+1)/n), so every doc in a higher
    * bucket precedes every doc in a lower one and equal qualities share
    * a bucket — the bucket-desc concatenation is exactly the global
    * greedy order. Same output columns as
    * [[Sampling.tokenBudgetSelect]]. */
  def tokenBudgetSelectSharded(docs: DataFrame, groupCol: String, textCol: String,
                               idCol: String, budget: Long,
                               nBuckets: Int = 8): DataFrame = {
    import graft.functions.TextFunctions.{qualityScore, tokenCount}
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        tokenCount(col(textCol)).as("n_tokens"),
        qualityScore(col(textCol)).as("quality"))
      // quality is in [0, 1]; clamp so quality == 1.0 joins the top bucket
      .withColumn("qb", least(greatest(floor(col("quality") * nBuckets), lit(0L)),
                              lit(nBuckets - 1L)))
    val wBuckets = Window.partitionBy(col("grp")).orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = base.groupBy(col("grp"), col("qb"))
      .agg(sum(col("n_tokens")).as("b_tokens"))
      .withColumn("b_base", sum(col("b_tokens")).over(wBuckets) - col("b_tokens"))
      .select(col("grp"), col("qb"), col("b_base"))
    val wWithin = Window.partitionBy(col("grp"), col("qb"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(bases), Seq("grp", "qb"))
      .withColumn("cum_tokens", col("b_base") + sum(col("n_tokens")).over(wWithin))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("grp"), col("n_tokens"), col("quality"),
              col("cum_tokens"))
  }
}
