package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch (round 15): q82 plan-level A/B (VERDICT r14 #4) — the
  * remaining idea for the profiler floor is branch-count reduction.
  * Arms, all producing the q82 output frame (6 rows × 8 cols):
  *
  *  A. shipped union-of-6 single-distinct aggregates (profileAgg);
  *  B. ONE aggregate with all six count_distincts — Spark 4's
  *     multi-distinct Expand path (re-measure of the round-7 negative:
  *     2.4 s then, on Spark 4.1 now), reshaped on the driver;
  *  C. two-column fusion: three branches of two count_distincts each —
  *     halves the branch count, each branch pays an Expand ×2.
  *
  * min-of-6 isolated at sf0.1, same hygiene as the bench harness.
  */
object Prof12 {
  val numCols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
  val strCols = Seq("l_returnflag", "l_linestatus")

  def armB(df: DataFrame): DataFrame = {
    val aggs =
      numCols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"mi_$c"),
        max(col(c)).cast("double").as(s"ma_$c")) } ++
      strCols.flatMap { c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c).cast("string")).as(s"mis_$c"),
        max(col(c).cast("string")).as(s"mas_$c")) }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val r = wide.head()
    val spark = df.sparkSession
    import spark.implicits._
    val n = r.getAs[Long]("n_rows")
    val rows =
      numCols.map { c => (c, n, r.getAs[Long](s"nn_$c"), r.getAs[Long](s"nd_$c"),
        Option(r.getAs[java.lang.Double](s"mi_$c")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double](s"ma_$c")).map(_.doubleValue),
        Option.empty[String], Option.empty[String]) } ++
      strCols.map { c => (c, n, r.getAs[Long](s"nn_$c"), r.getAs[Long](s"nd_$c"),
        Option.empty[Double], Option.empty[Double],
        Option(r.getAs[String](s"mis_$c")), Option(r.getAs[String](s"mas_$c"))) }
    rows.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
              "min_num", "max_num", "min_str", "max_str")
  }

  def armC(df: DataFrame): DataFrame = {
    val nulD = lit(null).cast("double")
    val nulS = lit(null).cast("string")
    def pairNum(c1: String, c2: String) =
      df.agg(count(lit(1)).as("n_rows"),
        sum(when(col(c1).isNull, 1L).otherwise(0L)).as("nn1"),
        count_distinct(col(c1)).as("nd1"),
        min(col(c1)).cast("double").as("mi1"), max(col(c1)).cast("double").as("ma1"),
        sum(when(col(c2).isNull, 1L).otherwise(0L)).as("nn2"),
        count_distinct(col(c2)).as("nd2"),
        min(col(c2)).cast("double").as("mi2"), max(col(c2)).cast("double").as("ma2"))
        .select(explode(array(
          struct(lit(c1).as("col_name"), col("n_rows"), col("nn1").as("n_nulls"),
            col("nd1").as("n_distinct"), col("mi1").as("min_num"),
            col("ma1").as("max_num"), nulS.as("min_str"), nulS.as("max_str")),
          struct(lit(c2).as("col_name"), col("n_rows"), col("nn2").as("n_nulls"),
            col("nd2").as("n_distinct"), col("mi2").as("min_num"),
            col("ma2").as("max_num"), nulS.as("min_str"), nulS.as("max_str")))).as("e"))
        .select(col("e.*"))
    def pairStr(c1: String, c2: String) =
      df.agg(count(lit(1)).as("n_rows"),
        sum(when(col(c1).isNull, 1L).otherwise(0L)).as("nn1"),
        count_distinct(col(c1)).as("nd1"),
        min(col(c1).cast("string")).as("mi1"), max(col(c1).cast("string")).as("ma1"),
        sum(when(col(c2).isNull, 1L).otherwise(0L)).as("nn2"),
        count_distinct(col(c2)).as("nd2"),
        min(col(c2).cast("string")).as("mi2"), max(col(c2).cast("string")).as("ma2"))
        .select(explode(array(
          struct(lit(c1).as("col_name"), col("n_rows"), col("nn1").as("n_nulls"),
            col("nd1").as("n_distinct"), nulD.as("min_num"), nulD.as("max_num"),
            col("mi1").as("min_str"), col("ma1").as("max_str")),
          struct(lit(c2).as("col_name"), col("n_rows"), col("nn2").as("n_nulls"),
            col("nd2").as("n_distinct"), nulD.as("min_num"), nulD.as("max_num"),
            col("mi2").as("min_str"), col("ma2").as("max_str")))).as("e"))
        .select(col("e.*"))
    pairNum(numCols(0), numCols(1))
      .unionByName(pairNum(numCols(2), numCols(3)))
      .unionByName(pairStr(strCols(0), strCols(1)))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Tables(spark, d, "lineitem")
    li.persist().count()

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 6).map { _ =>
        System.gc(); Thread.sleep(150)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof12] $label%-22s min=${ts.min}%.3f  samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // warmup all arms once (codegen/JIT)
    queries.SketchOps.profileAgg(li, numCols, strCols).write.format("noop").mode("overwrite").save()
    armB(li).write.format("noop").mode("overwrite").save()
    armC(li).write.format("noop").mode("overwrite").save()

    time("A union-of-6 (shipped)") { queries.SketchOps.profileAgg(li, numCols, strCols) }
    time("B single multi-distinct") { armB(li) }
    time("C pairwise fusion x3") { armC(li) }
    // equality of arm outputs (sorted rows)
    val a = queries.SketchOps.profileAgg(li, numCols, strCols).orderBy("col_name").collect().toSeq
    val b = armB(li).orderBy("col_name").collect().toSeq
    val c = armC(li).orderBy("col_name").collect().toSeq
    println(s"[prof12] B==A: ${b == a}  C==A: ${c == a}")
    spark.stop()
  }
}
