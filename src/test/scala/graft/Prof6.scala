package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the q157 floor (round 10): where do the
  * ~1.6 s go when the corpus pays only 4 jobs over cached lineitem? */
object Prof6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.conf.set(Tables.ParallelizeScans, "lineitem,orders")
    Seq("lineitem", "orders").foreach(n => Tables(spark, d, n).persist().count())
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof6] $tag%-22s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    val li = Tables(spark, d, "lineitem")
      .select(lit("all").as("g"), col("l_extendedprice").as("v"),
              (col("l_returnflag") === "R").as("bad"))
    // warm codegen
    li.groupBy(col("g")).agg(count(lit(1))).collect()
    val ps = (1 to 9).map(_ / 10.0)
    (1 to 3).foreach { rep =>
      time(s"quantiles#$rep") {
        graft.ops.Quantiles.exactQuantiles(
          li.select(col("g"), col("v")), "g", "v", ps).collect()
      }
      time(s"stats-agg#$rep") {
        li.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect()
      }
      time(s"bin-count#$rep") {
        li.select((col("v") > 1000.0).as("p"), col("bad"))
          .groupBy(col("p")).agg(count(when(col("bad"), 1))).collect()
      }
    }
    spark.stop()
  }
}
