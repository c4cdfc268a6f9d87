package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param doc    which SURVEY.md §2 operator(s) this exercises
  * @param fn     (spark, sfDir) => result DataFrame
  * @param oracle equivalent ANSI SQL for the DuckDB oracle; None → the
  *               driver records a weaker rows-only check (used for ops
  *               whose hash functions are not portable to SQL)
  */
final case class QueryDef(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.LongType

  /** All driver-provided parquet fixtures (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Loads a fixture table. `events.ts` is INT64 TIMESTAMP(NANOS), which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless read as a
    * raw long — so we enable the legacy nanos-as-long read and rebuild a
    * proper TimestampType column. The ns→µs conversion MUST be integer
    * division (`div`): at ~1.7e18 ns a double round-trip is off by up to
    * ±0.25 µs, enough to corrupt timestamps at µs boundaries.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
