package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch (round 16): q171 stage decomposition AFTER the RFM
  * four-link cut — which pole is the composition's wall-clock now?
  * The round-13 closure said "the audit side is fully hidden behind
  * the RFM chain"; round 16 shortened the RFM chain (q169 isolated
  * 0.72 s), so the question is whether the CDC diff aggregate (a
  * full-outer join + grid rollup, ~4 serial stage barriers inside one
  * job) now pokes out past it. Arms, min-of-6 isolated at sf0.1:
  *
  *  A. the diff-grid aggregate alone (q171's fGridRows action);
  *  B. rfmGrid(gated) end-to-end (the q169 side incl. readout);
  *  C. quarantine count alone;
  *  D. old-snapshot rollup alone;
  *  E. q171 end-to-end (the shipped query).
  *
  * Expected identity if overlap is at max: E ≈ max(A, C, D, B-minus-
  * readout) + readout — the composition costs its longest pole, and
  * the poles are measured here for the QueryDef's closure text.
  */
object Prof14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val orders = Tables(spark, d, "orders")
    orders.persist().count()

    val k = col("o_orderkey")
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
    import graft.ops.Num.D

    def diffGrid(): Unit =
      graft.ops.Cdc.snapshotDiff(oldS, gated,
          Seq("o_orderkey"), Seq("o_totalprice", "o_orderpriority"))
        .groupBy(col("change_type"),
          col("old_o_orderpriority").as("og"),
          col("new_o_orderpriority").as("ng"))
        .agg(count(lit(1)).as("n"),
             sum(col("old_o_totalprice").cast(D)).as("ov"),
             sum(col("new_o_totalprice").cast(D)).as("nv"))
        .collect()

    def time(label: String)(act: => Unit): Double = {
      val ts = (1 to 6).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        act
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof14] $label%-28s min=${ts.min}%.3f  samples=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    // warmup (codegen/JIT for every arm)
    diffGrid()
    queries.WarehouseOps.rfmGrid(gated).write.format("noop").mode("overwrite").save()
    SparkEntry.queries("q171_warehouse_pipeline")(spark, d)
      .write.format("noop").mode("overwrite").save()

    val a = time("A diff-grid aggregate")(diffGrid())
    val b = time("B rfmGrid incl. readout") {
      queries.WarehouseOps.rfmGrid(gated)
        .write.format("noop").mode("overwrite").save() }
    val c = time("C quarantine count") {
      raw.filter(!ok).agg(count(lit(1))).head.getLong(0): Unit }
    val dd = time("D old-snapshot rollup") {
      oldS.groupBy(col("o_orderpriority").as("g"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("o_totalprice").cast(D)).as("sd"))
        .collect(): Unit }
    val e = time("E q171 end-to-end") {
      SparkEntry.queries("q171_warehouse_pipeline")(spark, d)
        .write.format("noop").mode("overwrite").save() }
    println(f"[prof14] poles: A=$a%.2f B=$b%.2f C=$c%.2f D=$dd%.2f -> max=${Seq(a,b,c,dd).max}%.2f vs E=$e%.2f")
    spark.stop()
  }
}
