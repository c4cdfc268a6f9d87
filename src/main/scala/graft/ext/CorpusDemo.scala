package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end corpus-curation demo — the LLM-plane twin of
  * [[graft.pipeline.SnapshotDemo]]: read a raw documents table, run the
  * full curation funnel (quality filter → exact dedup → MinHash+LSH
  * near-dup groups → segment boilerplate removal), write the curated
  * corpus as partitioned parquet, and print the per-stage survival
  * report. Every stage is the same library call the oracle-checked
  * queries use (q20/q22/q48/q65/q67) — this main just composes them the
  * way a training-data pipeline would, with a persisted sink instead of
  * a hash-compare.
  *
  * Usage: runMain graft.ext.CorpusDemo [sfDir] [outDir]
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("curated").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables(spark, sfDir, "documents")
    val nRaw = docs.count()

    // stage 1: quality floor (same scorer as q27/q65)
    val scored = docs.select(col("doc_id"), col("lang"), col("source"), col("text"),
        qualityScore(col("text")).as("quality"))
      .localCheckpoint(true)
    val quality = scored.filter(col("quality") >= 0.75)
    val nQuality = quality.count()

    // stage 2: exact dedup on the 128-bit content key (q20 semantics)
    val exact = quality
      .join(Dedup.exactKeepIds(quality, "text", "doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val nExact = exact.count()

    // stage 3: near-dup groups via the 100 TB MinHash+LSH path (q59)
    val groups = Dedup.dedupGroups(
      Dedup.minhashLshPairs(exact, "text", "doc_id", "lang", 3,
                            numHashes = 8, bands = 4, threshold = 0.5),
      "id_a", "id_b")
    val drop = groups.filter(col("doc_id") =!= col("group_rep")).select(col("doc_id"))
    val nearDeduped = exact.join(drop, Seq("doc_id"), "left_anti")
    val nNear = nearDeduped.count()

    // stage 4: corpus-wide boilerplate removal (q67 semantics, 10-token
    // segments repeated >= 2 times across the surviving corpus)
    val cleaned = Dedup.segmentDedup(nearDeduped, "text", "doc_id",
                                     segLen = 10, minRep = 2)
    val curated = nearDeduped.drop("text")
      .join(cleaned.select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        col("text"), tokenCount(col("text")).as("n_tokens"))

    // sink: lang-partitioned parquet — partition pruning for per-lang
    // consumers, append-able for the next snapshot's increment (q66)
    curated.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/curated")
    val back = spark.read.parquet(s"$outDir/curated")
    val nFinal = back.count()
    val tokFinal = back.agg(sum(col("n_tokens"))).head().getLong(0)

    println(s"[corpus-demo] raw=$nRaw quality=$nQuality exact=$nExact " +
      s"near=$nNear final=$nFinal tokens=$tokFinal out=$outDir/curated")
    back.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"))
      .orderBy(col("lang")).show(truncate = false)
    spark.stop()
  }
}
