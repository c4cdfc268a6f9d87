package graft

import org.apache.spark.sql.SparkSession

/** Scratch (round 18): print the FINAL adaptive plan (post-execution,
  * AQE-resolved — shows ReusedExchange / runtime join strategy) for the
  * named queries. The initial `explain` shows duplicated aggregate
  * subtrees that AQE's stage cache may dedupe at runtime; judging a
  * "duplicate pass" claim needs the executed plan, not the static one.
  * Usage: Test/runMain graft.Prof18 <query> [<query>...]
  */
object Prof18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $n FINAL adaptive plan =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
