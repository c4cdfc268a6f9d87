package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch (round 18, optimization round 2): dump `.explain("formatted")`
  * for the named queries to `<outDir>/<query>_<suffix>.txt` — the
  * before/after plan evidence the optimization record commits under
  * plans/r18/. Usage:
  *   Test/runMain graft.Prof17 <outDir> <suffix> <query> [<query>...]
  */
object Prof17 {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get(outDir))
    args.drop(2).foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[prof17] wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
