package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch (round 17): measure scheduler job counts for the canary
  * pins with EXACTLY the PerfCanarySpec methodology (local[4], shuffle
  * partitions 4, AQE default, sf0.01, full query lifecycle, stable
  * 3×500ms poll). Three runs per query; a pin is only recorded when
  * all three agree. Used to extend PerfCanary.jobCeilings to
  * q163/q187 (VERDICT r16 #4) and to re-pin q142/q144 on the round-17
  * driver twin.
  */
object Prof16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"

    def jobCount(name: String): Int = {
      val sc = spark.sparkContext
      val jobs = new ConcurrentLinkedQueue[Int]()
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          jobs.add(js.jobId)
      }
      sc.addSparkListener(listener)
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        var stable = 0
        var cur = jobs.size
        var spins = 0
        while (stable < 3 && spins < 30) {
          Thread.sleep(500)
          val next = jobs.size
          if (next == cur) stable += 1 else { stable = 0; cur = next }
          spins += 1
        }
        cur
      } finally sc.removeSparkListener(listener)
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q163_spearman", "q187_half_sample_ci",
      "q142_triangle_count", "q144_local_clustering")
    names.foreach { n =>
      val counts = (1 to 3).map(_ => jobCount(n))
      println(s"[prof16] $n jobs=${counts.mkString(",")}" +
        (if (counts.distinct.size == 1) "  STABLE" else "  UNSTABLE"))
    }
    spark.stop()
  }
}
