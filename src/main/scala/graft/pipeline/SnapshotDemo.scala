package graft.pipeline

import graft.model.Schemas
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable demo of the reference snapshot pipeline over inline fixture
  * payloads (the same shapes a REST/RPC connector would deliver — the
  * offline stand-in for main.py's extract plane, SURVEY.md §7.3).
  * Prints the 46-column snapshot rows.
  */
object SnapshotDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def json(rows: Seq[String], schema: org.apache.spark.sql.types.StructType) =
      spark.read.schema(schema).json(rows.toDS)

    val pool1d = json(Seq(
      """{"pairAddress":"P1","name":"AVAX-USDC","filterBy":"1d","volumeUsd":"50000.0","liquidityUsd":"250000.0","feesUsd":125.0,"reserveX":"8000.5","reserveY":"49000.25","lbBinStep":"25","lbBaseFeePct":"0.1","lbMaxFeePct":"1.5","protocolSharePct":"10.0","activeBinId":"8388608","liquidityDepthMinus":"1000.0","liquidityDepthPlus":"1100.0","liquidityDepthTokenX":"40.5","liquidityDepthTokenY":"26000.0","tokenX":{"address":"0xA","symbol":"AVAX","decimals":"18","priceUsd":"25.0"},"tokenY":{"address":"0xB","symbol":"USDC","decimals":"6","priceUsd":"1.0"}}"""),
      Schemas.poolStats)
    val pool1h = json(Seq(
      """{"pairAddress":"P1","filterBy":"1h","volumeUsd":"2000.5","feesUsd":"5.25"}"""),
      Schemas.poolStats)
    // history arrives through the DataSource V2 connector (the offline
    // REST-source stand-in), exercising its pushdown/pruning path
    val histFile = java.nio.file.Files.createTempFile("history", ".jsonl")
    java.nio.file.Files.writeString(histFile, Seq(
      """{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-06 10:00:00","isDeposit":true,"blockNumber":120,"tokenX":{"amount":"2.0","price":"25.0"},"tokenY":{"amount":"50","price":"1.0"}}""",
      """{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-06 10:00:00","isDeposit":true,"blockNumber":120,"tokenX":{"amount":"0.5","price":"25.0"},"tokenY":{"amount":"25","price":"1.0"}}""",
      """{"user_address":"U1","poolAddress":"P1","timestamp":"2023-12-01 10:00:00","isDeposit":true,"blockNumber":90,"tokenX":{"amount":"9.0","price":"20.0"},"tokenY":{"amount":"9","price":"1.0"}}""").mkString("\n"))
    val history = spark.read
      .format("graft.sources.FixtureJsonSource")
      .option("payload", "userHistory")
      .load(histFile.toString)
      .filter(col("blockNumber") > 100) // pushed into the connector scan
    val fees = json(Seq(
      """{"user_address":"U1","poolAddress":"P1","binId":"8388608","accruedFeesX":"0.5","accruedFeesY":0.25}"""),
      Schemas.feesEarned)
    // bins arrive through the JSON-RPC connector (the offline stand-in
    // for main.py:203-219's eth_call): a canned node answers the batched
    // getBinsReserveOf POST with an ABI-encoded fixture result, and the
    // connector decodes it into binReserves rows on the executors
    val binsResult = graft.sources.BinsAbi.encodeResult(8388608L, Seq(
      (8388608L, new java.math.BigInteger("4000000000000000000"),
        java.math.BigInteger.ZERO, java.math.BigInteger.valueOf(500L),
        java.math.BigInteger.valueOf(1000L))))
    graft.sources.RpcTransport.setOverride { (_, body) =>
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      (0 until req.size())
        .map(i => s"""{"jsonrpc":"2.0","id":${req.get(i).get("id").asLong()},"result":"$binsResult"}""")
        .mkString("[", ",", "]")
    }
    val bins = spark.read.format("graft.sources.RpcBinsSource")
      .option("endpoint", "https://node/ext/bc/C/rpc")
      .option("contract", "0xA5c68C9E55Dde3505e60c4B5eAe411e2977dfB35")
      .option("tasks", "P1,U1,8388608,1000,1000")
      .load()
    val tasks = Seq(("U1", "P1"), ("U2", "P1")).toDF("user_address", "pool_address")

    val snap = Snapshot.build(Snapshot.Inputs(tasks, pool1d, pool1h, history, fees, bins),
      nowUnix = unix_timestamp(current_timestamp()),
      nowStr = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    snap.show(truncate = false)
    println(s"[snapshot-demo] rows=${snap.count()} cols=${snap.columns.length}")

    // K1 load step: two ticks into the single-file CSV (header once)
    val csv = java.nio.file.Files.createTempDirectory("report").resolve("merged_data.csv").toString
    graft.sinks.ReportSink.appendCsvSingleFile(snap, csv)
    graft.sinks.ReportSink.appendCsvSingleFile(snap, csv)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(csv))
    println(s"[snapshot-demo] csv lines=${lines.size()} (1 header + ${lines.size() - 1} rows), header once=${lines.stream().filter(_.startsWith("current_unix_timestamp")).count() == 1}")
    spark.stop()
  }
}
