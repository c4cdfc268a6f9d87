package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of q171 (round 10). */
object Prof8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.conf.set(Tables.ParallelizeScans, "lineitem,orders")
    Seq("orders").foreach(n => Tables(spark, d, n).persist().count())
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof8] $tag%-16s ${(System.nanoTime - t0) / 1e9}%.3f s")
    }
    import graft.ops.Num.D
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val k = col("o_orderkey")
      val orders = Tables(spark, d, "orders")
      val oldS = orders.filter(k % 10 =!= 3)
      val raw = orders.filter(k % 10 =!= 7)
        .withColumn("o_totalprice",
          when(k % 13 === 0, -col("o_totalprice"))
            .otherwise(when(k % 5 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice"))))
        .withColumn("o_orderpriority",
          when(k % 7 === 0, lit("0-REPRIORITIZED"))
            .otherwise(col("o_orderpriority")))
      val ok = col("o_totalprice") > 0 &&
        col("o_orderstatus").isin("F", "O", "P")
      val gated = raw.filter(ok)
      time("quar")(raw.filter(!ok).agg(count(lit(1))).head)
      var diff: org.apache.spark.sql.DataFrame = null
      time("diff-ckpt") {
        diff = graft.ops.Cdc.snapshotDiff(oldS, gated,
          Seq("o_orderkey"), Seq("o_totalprice", "o_orderpriority"))
          .localCheckpoint(true)
      }
      time("chg")(diff.groupBy(col("change_type")).agg(count(lit(1))).collect())
      time("maintained") {
        val oldAgg = oldS.groupBy(col("o_orderpriority").as("g"))
          .agg(count(lit(1)).cast("long").as("n"),
               sum(col("o_totalprice").cast(D)).as("sd"))
        val removed = diff.filter(col("change_type").isin("delete", "update"))
          .select(col("old_o_orderpriority").as("g"), lit(-1L).as("dn"),
                  (col("old_o_totalprice").cast(D) * -1).as("dv"))
        val added = diff.filter(col("change_type").isin("insert", "update"))
          .select(col("new_o_orderpriority").as("g"), lit(1L).as("dn"),
                  col("new_o_totalprice").cast(D).as("dv"))
        val delta = removed.unionByName(added).groupBy(col("g"))
          .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
        oldAgg.join(delta, Seq("g"), "full_outer")
          .select(
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .cast("long").as("n"),
            (coalesce(col("sd"), lit(0).cast(D)) + coalesce(col("dv"), lit(0).cast(D)))
              .as("sd"))
          .filter(col("n") > 0)
          .agg(sum(col("n")).cast("long").as("mn"),
               sum(col("sd")).cast("double").as("mt"),
               count(lit(1)).cast("long").as("np")).head()
      }
      time("rfm") {
        graft.queries.WarehouseOps.rfmGrid(gated)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
