package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (round 14): sf1 equality certificate for the guarded pair
  * plane — the guarded operators must equal the r13 uncapped plane
  * EXACTLY at sf1 (max (lang,shingle) df 62 ≤ budget 64, so the capped
  * tier is complete and the LSH tier adds nothing new). r13's sf1
  * oracle green for q48/q52/q121/q125/q177/q184 then carries over to
  * the guarded forms without re-running the (hours-long at sf1)
  * DuckDB recursive/quadratic oracle CTEs. */
object Prof10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val docs = Tables(spark, d, "documents")

    val oldPairs = graft.ext.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", "lang", 3, 0.5, maxDf = Int.MaxValue)
    val newPairs = graft.ext.Dedup.guardedJaccardPairs(
      docs, "text", "doc_id", "lang", 3, 0.5)
    val pairDiff = oldPairs.exceptAll(newPairs).count() +
      newPairs.exceptAll(oldPairs).count()
    println(s"[prof10] jaccard-pairs symmetric diff at $d: $pairDiff " +
      s"(old=${oldPairs.count()}, new=${newPairs.count()})")

    val oldStats = graft.ext.Dedup.pairSimilarityStats(
      docs, "text", "doc_id", "lang", 3, 0.5, 0.6, maxDf = Int.MaxValue)
    val newStats = graft.ext.Dedup.guardedSimilarityStats(
      docs, "text", "doc_id", "lang", 3, 0.5, 0.6)
    val statsDiff = oldStats.exceptAll(newStats).count() +
      newStats.exceptAll(oldStats).count()
    println(s"[prof10] similarity-stats symmetric diff at $d: $statsDiff " +
      s"(old=${oldStats.count()}, new=${newStats.count()})")
    spark.stop()
  }
}
