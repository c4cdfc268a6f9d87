package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch (round 18): per-STAGE task metrics for the named queries —
  * task count, total/max task runtime, input/shuffle volumes. Prof15's
  * job timeline showed q142's census at sf1 spending 168 s in ONE job
  * where q144's perNode (strictly more work per row) spends 37 s; this
  * tells whether that job is one straggler task, few tasks, or
  * uniformly slow tasks. Usage:
  *   Test/runMain graft.Prof19 <sfDir> <query> [<query>...]
  */
object Prof19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        if (tm != null && si.completionTime.isDefined) {
          val wall = si.completionTime.get - si.submissionTime.getOrElse(0L)
          if (wall > 500)
            println(f"[prof19] stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"wall=${wall / 1e3}%8.2f s run=${tm.executorRunTime / 1e3}%8.2f s " +
              f"gc=${tm.jvmGCTime / 1e3}%7.2f s " +
              f"in=${tm.inputMetrics.bytesRead / 1e6}%9.1f MB " +
              f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%9.1f MB " +
              f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%9.1f MB  ${si.name.take(60)}")
        }
      }
    })
    Tables.names.foreach { n => Tables(spark, d, n).persist().count() }
    args.drop(1).foreach { n =>
      println(s"===== $n")
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof19] $n wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(500)
    }
    spark.stop()
  }
}
