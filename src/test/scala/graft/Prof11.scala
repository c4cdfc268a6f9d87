package graft

import org.apache.spark.sql.SparkSession

/** Scratch (round 14): detection evidence for the guarded pair plane at
  * sf10 — the per-lang keep/drop summary must show real drops (the
  * planted exact/near dup clusters), proving the sf10 linearity was not
  * bought by an empty answer. */
object Prof11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/repo/fixtures/sf1", "/root/repo/fixtures/sf10").foreach { d =>
      println(s"===== q52_dedup_apply @ $d")
      SparkEntry.queries("q52_dedup_apply")(spark, d)
        .orderBy("lang").collect().foreach(r => println("[prof11] " + r))
    }
    spark.stop()
  }
}
