package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch: debug q172's 1e-6 chi2 divergence (round 10). */
object Prof7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
    val digit = substring(col("value").cast(DecimalType(18, 2))
      .cast("string"), 1, 1)
    val counted = ev.filter(col("value") >= 1)
      .groupBy(window(col("ts"), "1 day"))
      .agg((1 to 9).map(i => count(when(digit === i.toString, 1)).as(s"d$i")).head,
           (1 to 9).map(i => count(when(digit === i.toString, 1)).as(s"d$i")).tail: _*)
      .select(col("window.start").as("win_start"),
        array((1 to 9).map(i => col(s"d$i")): _*).as("counts"))
      .withColumn("n", aggregate(col("counts"), lit(0L), (a, c) => a + c))
      .filter(unix_micros(col("win_start")) === 1704067200000000L)
    val cols = (1 to 9).flatMap { i =>
      val obs = round(element_at(col("counts"), i).cast("double") / col("n"), 6)
      val ex = round(log10(lit(1.0) + lit(1.0) / lit(i.toDouble)), 6)
      Seq(obs.as(s"obs$i"), ex.as(s"ex$i"),
          round((obs - ex) * (obs - ex) / ex, 12).as(s"t$i"))
    }
    val r = counted.select(cols: _*).head()
    (0 until 27).grouped(3).zipWithIndex.foreach { case (g, i) =>
      println(s"d${i + 1} obs=${r.get(g(0))} ex=${r.get(g(1))} term=${r.get(g(2))}")
    }
    spark.stop()
  }
}
