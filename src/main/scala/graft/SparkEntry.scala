package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Num._
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered as QueryDefs in graft.queries.* and flattened
  * here into the (name -> fn) / (name -> sql) maps the driver consumes.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    _root_.graft.queries.ReferenceParity.defs ++
      _root_.graft.queries.StreamingParity.defs ++
      _root_.graft.queries.LlmOps.defs ++
      _root_.graft.queries.LlmOps2.defs ++
      _root_.graft.queries.CorpusOps.defs ++
      _root_.graft.queries.VectorOps.defs ++
      _root_.graft.queries.SketchOps.defs ++
      _root_.graft.queries.Analytics.defs ++
      _root_.graft.queries.TimeSeries.defs ++
      _root_.graft.queries.SetGraphOps.defs ++
      _root_.graft.queries.WarehouseOps.defs ++
      _root_.graft.queries.BehaviorOps.defs ++
      _root_.graft.queries.StatsOps.defs ++
      _root_.graft.queries.EvalOps.defs ++
      _root_.graft.queries.ImageOps.defs ++
      _root_.graft.queries.AudioOps.defs ++
      _root_.graft.queries.VideoOps.defs

  /** Flagship: the reference's snapshot pipeline shape (scan → filter →
    * argmax-latest → broadcast join → derived metrics → string fold) on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables(spark, d, "lineitem")
    val orders = Tables(spark, d, "orders")
    // latest lineitem per order (A1), summed over ties (A2)
    val latest = Relational.latestByKey(li, Seq(col("l_orderkey")), Seq(col("l_shipdate")))
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("last_qty"),
           dsum(col("l_extendedprice")).as("last_value"),
           Relational.stringFold(
             struct(col("l_linenumber"), col("l_quantity")),
             x => format_string("%d: %d", x.getField("l_linenumber"),
                                floor(x.getField("l_quantity")).cast("long")))
             .as("bins"))
    orders.join(latest, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"),
              coalesce(col("last_qty"), lit(0.0)).as("last_qty"),
              coalesce(col("last_value"), lit(0.0)).as("last_value"),
              when(col("o_totalprice") =!= 0,
                   round(coalesce(col("last_value"), lit(0.0)) / col("o_totalprice") * 100, 4))
                .as("last_pct_of_total"),
              col("bins"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
