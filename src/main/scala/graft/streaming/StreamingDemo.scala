package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Runnable streaming pipeline: file-source events → watermarked daily
  * stats → micro-batch append sink on a processing-time trigger — the
  * Structured-Streaming rendering of the reference's
  * `while True: main(); sleep(3600)` scheduler (main.py:353-359), with
  * the sleep replaced by Trigger.ProcessingTime and the CSV append by a
  * streaming parquet sink with checkpointing (exactly-once).
  *
  * Feeds itself: copies slices of the sf0.001 events table into the
  * watched directory to simulate arriving batches, then stops.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("stream-demo")
    val inDir = work.resolve("in").toString
    val outDir = work.resolve("out").toString
    val ckDir = work.resolve("ck").toString
    new java.io.File(inDir).mkdirs()

    // stage 2 arrival batches from the fixture table
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    events.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(s"$inDir/b0")
    val stream = EventStreams.eventFileStream(spark, s"$inDir/b*")
    val q = EventStreams.dailyStatsStream(stream)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    events.filter(col("event_id") % 2 === 1).write.mode("overwrite").parquet(s"$inDir/b1")
    q.processAllAvailable()
    q.stop()

    val result = spark.read.parquet(outDir)
    println(s"[streaming-demo] finalized window rows=${result.count()}")
    result.orderBy(col("day_start"), col("event_type")).show(8, truncate = false)
    spark.stop()
  }
}
