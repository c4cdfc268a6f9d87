package graft

import org.apache.spark.sql.SparkSession

/** Scratch: plan + timing check of the round-10 seventh batch
  * (q173 skyline, q174 frame plan, q175 gains, q176 seasonal). */
object Prof9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = Seq("q175_gains_deciles", "q176_seasonal_decomposition")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      println(s"===== $n")
      df.explain("formatted")
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime
        SparkEntry.queries(n)(spark, d).collect()
        println(f"[prof9] $n rep$rep ${(System.nanoTime - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
