package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (round 15): q100 nProbe tuning table (VERDICT r14 #6) —
  * recall@5 of the IVF path vs probe cost (scored candidates = the
  * corpus fraction each query actually ranks) for nProbe ∈ {4,8,12,16}
  * over the 16-cell codebook, on the shipped fixture operators. The
  * shipped q100 stays at nProbe=4; this table is the measured basis
  * for the 100 TB knob decision recorded in its QueryDef. */
object Prof13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val e = graft.Tables(spark, d, "embeddings")
    e.persist().count()
    val q = e.filter(col("vec_id") < 10)
    val truth = graft.ext.SimilaritySearch.bruteForceTopK(e, q, 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nTruth = truth.count()
    val corpus = e.count()
    for (nProbe <- Seq(4, 8, 12, 16)) {
      val t0 = System.nanoTime()
      val ivf = graft.ext.SimilaritySearch.ivfTopK(e, q,
          centroidIds = (100L until 116L), nProbe = nProbe, k = 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val secs = (System.nanoTime() - t0) / 1e9
      val nHit = truth.join(ivf, Seq("query_id", "neighbor_id")).count()
      // probe cost: candidates actually scored = members of probed cells
      val cands = graft.ext.SimilaritySearch.ivfTopK(e, q,
          centroidIds = (100L until 116L), nProbe = nProbe, k = 1 << 20)
        .count()
      println(f"[prof13] nProbe=$nProbe%2d recall@5=${nHit.toDouble / nTruth}%.3f " +
        f"scored=${cands}%d (${cands * 100.0 / (corpus * 10)}%.1f%% of corpus x 10q) secs=$secs%.2f")
    }
    spark.stop()
  }
}
