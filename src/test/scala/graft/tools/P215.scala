package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
object P215 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val daily = graft.Tables(spark, "/root/repo/fixtures/sf1", "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double").as("x"))
    val mx = daily.groupBy((year(col("day")) * lit(12) + month(col("day"))).cast("long").as("tm"))
      .agg(max(col("x")).as("m"))
    def d6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 6))
    val m6 = col("m") / lit(1e6)
    val mo = mx.agg(count(lit(1)).as("nb"),
      sum(d6(m6)).as("s1d"),
      sum(d6(floor(m6 * m6 * lit(1e6) + lit(0.5)) / lit(1e6))).as("s2d"))
    val r = mo.collect().head
    println(s"nb=${r.getLong(0)} s1=${r.getDecimal(1)} s2=${r.getDecimal(2)}")
    // and the per-month s2 terms for the first diffs
    val terms = mx.select(col("tm"), d6(m6).as("t1"),
        d6(floor(m6 * m6 * lit(1e6) + lit(0.5)) / lit(1e6)).as("t2"))
      .collect().map(r2 => (r2.getLong(0), r2.getDecimal(1).toString, r2.getDecimal(2).toString)).sortBy(_._1)
    val out = terms.map { case (t, a, b) => s""""$t": ["$a", "$b"]""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/spark_terms.json"), out)
    spark.stop()
  }
}
