package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q21 capped-vs-uncapped df correction branch cost. */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof4] $tag%-18s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    (1 to 4).foreach { r =>
      time(s"capped/$r")(noop(graft.ext.Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5)))
      time(s"uncapped/$r")(noop(graft.ext.Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5, maxDf = Int.MaxValue)))
    }
    spark.stop()
  }
}
