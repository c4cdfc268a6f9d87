package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch: q21 posting-list representation shootout. */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof4] $tag%-22s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    val in = graft.ops.Parallelize.forCompute(docs)
    def sh() = in.select(col("doc_id").as("id"), col("lang").as("block"),
        wordShingleHashes(col("text"), 3).as("ss"))
      .select(col("id"), col("block"), size(col("ss")).as("n_sh"),
              explode(col("ss")).as("sh"))
    // (a) current: struct + array_sort
    def listsStruct() = sh().groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
      .filter(size(col("ids")) > 1)
    // (b) struct, no sort
    def listsNoSort() = sh().groupBy(col("block"), col("sh"))
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // (c) packed long + sort
    def listsPacked() = sh().select(col("block"), col("sh"),
        (col("id") * (1L << 20) + col("n_sh")).as("pk"))
      .groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(col("pk"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // (d) bare id longs + sort (sizes joined later)
    def listsBare() = sh().groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    (1 to 3).foreach { r =>
      time(s"a-struct-sort/$r")(noop(listsStruct()))
      time(s"b-struct-nosort/$r")(noop(listsNoSort()))
      time(s"c-packed-sort/$r")(noop(listsPacked()))
      time(s"d-bare-sort/$r")(noop(listsBare()))
    }
    spark.stop()
  }
}
