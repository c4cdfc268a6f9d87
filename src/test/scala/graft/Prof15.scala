package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch (round 17, optimization round 1): where do q142/q144's
  * 2.4-2.6 s go? The triangle core is a chain of eager
  * localCheckpoints + adaptive-broadcast count probes + the final
  * edge⨝adjacency join — each an ISOLATED scheduler job, so the
  * suspicion is that the queries are serial-job-floor-bound (many
  * ~0.2-0.3 s jobs back to back) rather than compute-bound in any one
  * stage. A job-level timeline (start/end per scheduler job, with
  * gaps) separates the two: compute-bound shows one fat job,
  * floor-bound shows 8-12 thin ones whose SUM is the query.
  *
  * Also times q96 / q65 / q191 the same way for the round-17 operator
  * checklist.
  */
object Prof15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    // per-job timeline listener
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, (e.time, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (t0, desc) =>
          done.add((e.jobId, t0, e.time, desc))
        }
      }
    })

    // warm the tables like Bench does
    Tables.names.foreach { n => Tables(spark, d, n).persist().count() }

    def execute(name: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()

    def timeline(name: String): Unit = {
      execute(name) // warm (codegen)
      System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(200)
      done.clear()
      val t0 = System.nanoTime()
      execute(name)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val evs = done.toArray(Array.empty[(Int, Long, Long, String)]).sortBy(_._2)
      val base = if (evs.nonEmpty) evs.map(_._2).min else 0L
      println(f"[prof15] ===== $name wall=$wall%.3f s, ${evs.length} jobs =====")
      var prevEnd = base
      evs.foreach { case (id, s, e, desc) =>
        val gap = (s - prevEnd) / 1e3
        println(f"[prof15] job $id%3d  +${(s - base) / 1e3}%7.3f s  dur=${(e - s) / 1e3}%6.3f s  gap=$gap%6.3f s  $desc")
        prevEnd = math.max(prevEnd, e)
      }
      val jobSum = evs.map(e => e._3 - e._2).sum / 1e3
      println(f"[prof15] $name job-time sum=$jobSum%.3f s vs wall=$wall%.3f s")
    }

    args.drop(1).toSeq match {
      case Nil =>
        Seq("q142_triangle_count", "q144_local_clustering",
            "q96_lsh_recall", "q65_curation_pipeline",
            "q191_label_propagation").foreach(timeline)
      case qs => qs.foreach(timeline)
    }
    spark.stop()
  }
}
