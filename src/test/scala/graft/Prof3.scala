package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q82 profiler strategy shootout on cached 32-way lineitem. */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(Tables.ParallelizeScans, "lineitem,orders")
    val dir = "/root/testdata/sf0.1"
    Tables(spark, dir, "lineitem").persist().count()
    val numCols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val strCols = Seq("l_returnflag", "l_linestatus")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof3] $tag%-16s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    def unionForm(): DataFrame =
      graft.queries.SketchOps.profileAgg(Tables(spark, dir, "lineitem"), numCols, strCols)
    // single agg, Expand-based multi-distinct; same stats, 1-row wide
    def expandForm(): DataFrame = {
      val aggs = (numCols ++ strCols).flatMap { c =>
        Seq(count_distinct(col(c)).as(s"nd_$c"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
            min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
      } :+ count(lit(1)).as("n_rows")
      Tables(spark, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    }
    // hybrid: one scan for all non-distinct stats + 6 distinct-only branches
    def hybridForm(): DataFrame = {
      val base = Tables(spark, dir, "lineitem")
      val nd = (numCols ++ strCols).map(c =>
        base.agg(count_distinct(col(c)).as("nd")).select(lit(c).as("c"), col("nd")))
      nd.reduce(_ unionByName _)
    }
    (1 to 3).foreach { rep =>
      time(s"union/$rep")(noop(unionForm()))
      time(s"expand/$rep")(noop(expandForm()))
      time(s"hybrid-nd/$rep")(noop(hybridForm()))
    }
    spark.stop()
  }
}
