package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of the round-14 guarded pair plane at
  * sf1 — which stage pays: the sets checkpoint, the exact-tier
  * expansion+distinct, the LSH plane, or the verification join? */
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

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[prof10] $tag ${(System.nanoTime - t0) / 1e9}%.3f s")
      r
    }

    import graft.functions.TextFunctions._
    val in = graft.ops.Parallelize.forCompute(docs)
    val sets = time("sets checkpoint") {
      in.select(col("doc_id").as("id"), col("lang").as("block"),
          array_sort(wordShingleHashes(col("text"), 3)).as("ss"))
        .localCheckpoint(true)
    }
    val sh = sets.select(col("id"), col("block"), explode(col("ss")).as("sh"))
    val lists = sh.groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 64)
    val exactCand = lists.select(col("ids"), posexplode(col("ids")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "pa")
      .select(col("pa"),
        explode(slice(col("ids"), col("i") + lit(2),
                      greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("pb"))
      .select(col("pa").as("id_a"), col("pb").as("id_b"))
    time("exact tier raw count")(println(exactCand.count()))
    val exD = time("exact tier distinct")(exactCand.distinct().localCheckpoint(true))
    println(exD.count())
    val full = time("full guardedJaccardPairs") {
      graft.ext.Dedup.guardedJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5)
        .count()
    }
    println(full)
    val old = time("old uncapped ngramJaccardPairs") {
      graft.ext.Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5,
        maxDf = Int.MaxValue).count()
    }
    println(old)
    spark.stop()
  }
}
