package graft

import graft.pipeline.{LiveEndpoints, Snapshot}
import graft.sources.{HttpReaderFactory, HttpScan, HttpTransport, RpcTransport}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class LiveEndpointsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = LiveEndpoints.Config(
    dexBase = "https://dex.example", feesBase = "https://fees.example",
    rpcEndpoint = "https://node.example/rpc", contract = "0xC0",
    apiKey = Some("k-123"), startTimeUnix = 1704067200L,
    endTimeUnix = 1704672000L)

  describe("LiveEndpoints config (the reference's operating mode, env-gated)") {

    it("fromEnv is offline (None) by default, live when the base URL is set") {
      assert(LiveEndpoints.fromEnv(Map.empty).isEmpty)
      val c = LiveEndpoints.fromEnv(Map(
        "GRAFT_LIVE_DEX_BASE" -> "https://dex.example",
        "GRAFT_LIVE_API_KEY" -> "secret",
        "GRAFT_LIVE_START_UNIX" -> "100",
        "GRAFT_LIVE_END_UNIX" -> "200")).get
      assert(c.dexBase == "https://dex.example")
      assert(c.feesBase == "https://dex.example") // falls back to dex base
      assert(c.rpcEndpoint.endsWith("/ext/bc/C/rpc")) // reference default
      assert(c.apiKey.contains("secret"))
      assert(c.startTimeUnix == 100L && c.endTimeUnix == 200L)
    }

    it("URL builders reproduce the reference's param-merge shapes (main.py:30-51,104,155)") {
      assert(LiveEndpoints.poolStatsUrl(cfg, "P1", "1d") ==
        "https://dex.example/v1/pools/avalanche/P1" +
          "?pageSize=100&startTime=1704067200&endTime=1704672000&filterBy=1d")
      assert(LiveEndpoints.userHistoryUrl(cfg, "U1", "P1") ==
        "https://dex.example/v1/user/avalanche/history/U1/P1" +
          "?pageSize=100&startTime=1704067200&endTime=1704672000")
      assert(LiveEndpoints.feesEarnedUrl(cfg, "U1", "P1") ==
        "https://fees.example/v1/user/fees-earned/avalanche/U1/P1" +
          "?pageSize=100&startTime=1704067200&endTime=1704672000")
      assert(LiveEndpoints.headerSpec(cfg) == "x-traderjoe-api-key: k-123")
    }

    it("urls and headers options plumb through to the partition reader") {
      val df = spark.read.format("graft.sources.HttpJsonSource")
        .option("payload", "poolStats")
        .option("urls", LiveEndpoints.poolStatsUrl(cfg, "P1", "1d"))
        .option("urlDelimiter", "|")
        .option("headers", LiveEndpoints.headerSpec(cfg))
        .load()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b.scan
      }.get.asInstanceOf[HttpScan]
      assert(scan.headers == "x-traderjoe-api-key: k-123")
      assert(scan.planInputPartitions().length == 1)
      val factory = scan.createReaderFactory().asInstanceOf[HttpReaderFactory]
      assert(factory.headers == "x-traderjoe-api-key: k-123")
      assert(HttpTransport.parseHeaders(factory.headers) ==
        Seq("x-traderjoe-api-key" -> "k-123"))
    }

    it("inputs() drives the whole extract plane: every live URL is fetched by executors and the snapshot builds") {
      // per-URL fetch COUNTS, not a set: the 1d pool scan is consumed
      // twice (activeBinId collect + snapshot input) and must still hit
      // the API exactly once — a set would hide a double fetch
      val fetched = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val poolJson = (filterBy: String) =>
        s"""{"pairAddress":"P1","name":"AVAX-USDC","filterBy":"$filterBy","volumeUsd":"50000.0","liquidityUsd":"250000.0","feesUsd":125.0,"reserveX":"8000.5","reserveY":"49000.25","lbBinStep":"25","lbBaseFeePct":"0.1","lbMaxFeePct":"1.5","protocolSharePct":"10.0","activeBinId":"8388608","liquidityDepthMinus":"1000.0","liquidityDepthPlus":"1100.0","liquidityDepthTokenX":"40.5","liquidityDepthTokenY":"26000.0","tokenX":{"address":"0xA","symbol":"AVAX","decimals":"18","priceUsd":"25.0"},"tokenY":{"address":"0xB","symbol":"USDC","decimals":"6","priceUsd":"1.0"}}"""
      val histJson =
        """{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-06 10:00:00","isDeposit":true,"blockNumber":120,"tokenX":{"amount":"2.0","price":"25.0"},"tokenY":{"amount":"50","price":"1.0"}}"""
      val feesJson =
        """{"user_address":"U1","poolAddress":"P1","binId":"8388608","accruedFeesX":"0.5","accruedFeesY":0.25}"""
      HttpTransport.setOverride { url =>
        fetched.merge(url, 1, (a, b) => a + b)
        if (url.contains("/v1/pools/")) Iterator(poolJson(
          if (url.contains("filterBy=1h")) "1h" else "1d"))
        else if (url.contains("/history/")) Iterator(histJson)
        else if (url.contains("/fees-earned/")) Iterator(feesJson)
        else sys.error(s"unexpected live URL $url")
      }
      val binsResult = graft.sources.BinsAbi.encodeResult(8388608L, Seq(
        (8388608L, new java.math.BigInteger("4000000000000000000"),
          java.math.BigInteger.ZERO, java.math.BigInteger.valueOf(500L),
          java.math.BigInteger.valueOf(1000L))))
      RpcTransport.setOverride { (endpoint, body) =>
        assert(endpoint == cfg.rpcEndpoint)
        val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        (0 until req.size())
          .map(i => s"""{"jsonrpc":"2.0","id":${req.get(i).get("id").asLong()},"result":"$binsResult"}""")
          .mkString("[", ",", "]")
      }
      try {
        val tasks = Seq(("U1", "P1"))
        val in = LiveEndpoints.inputs(spark, cfg, tasks)
        val snap = Snapshot.build(in,
          nowUnix = lit(1704500000L), nowStr = lit("2024-01-05 00:00:00"))
        assert(snap.columns.length == 46)
        // collect the FULL row, not count(): count() lets Catalyst
        // eliminate the aggregated left joins outright (their keys are
        // provably unique), which would skip the history/fees fetches
        // this test exists to observe
        val rows = snap.collect()
        assert(rows.length == 1)
        val row = rows.head
        assert(row.getAs[Double]("accrued_fees_token_x") == 0.5)
        assert(row.getAs[String]("MostRecentDepositTime") == "2024-01-06 10:00:00")
        assert(fetched.containsKey(LiveEndpoints.poolStatsUrl(cfg, "P1", "1h")))
        assert(fetched.containsKey(LiveEndpoints.userHistoryUrl(cfg, "U1", "P1")))
        assert(fetched.containsKey(LiveEndpoints.feesEarnedUrl(cfg, "U1", "P1")))
        assert(fetched.size == 4)
        // the 1d pool stats feed BOTH the activeBinId lookup and the
        // snapshot's pool frame, from ONE fetch: inputs() materializes
        // the dimension-sized frame locally instead of re-scanning the
        // connector (a second scan would double live-API quota and could
        // read an activeBinId inconsistent with the snapshot's frame)
        assert(fetched.get(LiveEndpoints.poolStatsUrl(cfg, "P1", "1d")) == 1)
      } finally {
        HttpTransport.clearOverride()
        RpcTransport.clearOverride()
      }
    }
  }
}
