package graft

import graft.sources.HttpTransport
import org.apache.spark.sql.types.{StringType, StructField, StructType}

class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-05 10:00:00","isDeposit":true,"blockNumber":100,"tokenX":{"amount":"1.5","price":"24.0"},"tokenY":{"amount":"100","price":"1.0"}}"""

  describe("HttpJsonSource (executor-side extract plane)") {
    it("fans URLs out one-per-partition and decodes through the shared plane") {
      HttpTransport.setOverride {
        case u if u.endsWith("/a") => Iterator(good)
        case u if u.endsWith("/b") =>
          Iterator(good.replace("U1", "U2").replace("100", "200"))
        case u => sys.error(s"unexpected $u")
      }
      try {
        val df = spark.read.format("graft.sources.HttpJsonSource")
          .option("payload", "userHistory")
          .option("urls", "https://x/a,https://x/b")
          .load()
        assert(df.rdd.getNumPartitions == 2) // 1 URL = 1 partition
        assert(df.select($"user_address").as[String].collect().toSet == Set("U1", "U2"))
      } finally HttpTransport.clearOverride()
    }

    it("pushes predicates and prunes columns like the fixture source") {
      HttpTransport.setOverride(_ => Iterator(good, good.replace("\"blockNumber\":100", "\"blockNumber\":50")))
      try {
        val df = spark.read.format("graft.sources.HttpJsonSource")
          .option("payload", "userHistory").option("urls", "https://x/a").load()
          .filter($"blockNumber" > 60).select($"user_address", $"blockNumber")
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("GreaterThan(blockNumber,60)"), s"plan:\n$plan")
        assert(df.count() == 1)
      } finally HttpTransport.clearOverride()
    }

    it("quarantines a failed fetch as one corrupt row in PERMISSIVE mode") {
      HttpTransport.setOverride {
        case u if u.endsWith("/ok")   => Iterator(good)
        case u                        => throw new java.io.IOException("boom 503")
      }
      try {
        val schema = StructType(
          graft.sources.FixtureJsonSource.payloadSchema("userHistory").fields :+
            StructField("_corrupt_record", StringType))
        val df = spark.read.format("graft.sources.HttpJsonSource")
          .schema(schema)
          .option("urls", "https://x/ok,https://x/down")
          .option("mode", "PERMISSIVE").load()
        assert(df.count() == 2)
        val bad = df.filter($"_corrupt_record".isNotNull)
          .select($"_corrupt_record").as[String].collect()
        assert(bad.length == 1 && bad(0).contains("setup-failed") &&
          bad(0).contains("url=https://x/down") && bad(0).contains("boom 503"))
      } finally HttpTransport.clearOverride()
    }
  }
}
