package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: q119 vc-build A/B — melt+groupBy vs union-of-4 per-column
  * aggs; also job-count accounting via a listener. */
object Prof5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(Tables.ParallelizeScans, "lineitem,orders")
    val d = "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val j0 = jobs.get; val t0 = System.nanoTime; f
      println(f"[prof5] $tag%-24s ${(System.nanoTime - t0) / 1e9}%.3f s  jobs=${jobs.get - j0}")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables(spark, d, "lineitem"); li.cache(); li.count()
    (1 to 3).foreach { r =>
      time(s"vc-melt/$r") {
        val long = Tables(spark, d, "lineitem").select(cols.map(col): _*)
          .unpivot(Array.empty[org.apache.spark.sql.Column],
                   cols.map(col).toArray, "metric", "val")
        long.groupBy(col("metric"), col("val")).agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
      }
      time(s"vc-union4/$r") {
        val wide = Tables(spark, d, "lineitem")
        cols.map { c =>
          wide.groupBy(col(c).as("val")).agg(count(lit(1)).as("c"))
            .select(lit(c).as("metric"), col("val"), col("c"))
        }.reduce(_ unionAll _).localCheckpoint(true)
      }
      time(s"q119-full/$r") {
        noop(SparkEntry.queries("q119_robust_scaling")(spark, d))
      }
    }
    spark.stop()
  }
}
