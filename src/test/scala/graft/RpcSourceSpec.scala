package graft

import graft.sources.{BinsAbi, RpcBinsTask, RpcTransport}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.math.BigInteger

/** The JSON-RPC extract connector (S7 twin): batched eth_call POSTs,
  * ABI encode/decode round-trip, id-matched response decode, and
  * item-granular quarantine through the shared JSONL plane. */
class RpcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def bi(s: String) = new BigInteger(s)

  private val bins1 = Seq(
    (8388607L, bi("4000000000000000000"), BigInteger.ZERO,
      bi("500"), bi("1000")),
    (8388608L, bi("123456789012345678901234567890"), bi("7"),
      bi("250"), bi("1000")))
  private val result1 = BinsAbi.encodeResult(8388608L, bins1)

  /** Canned node: answers every call in the batch with `resultFor`,
    * recording request bodies (synchronized — partitions fetch
    * concurrently from executor threads). */
  private def cannedNode(record: scala.collection.mutable.Buffer[String],
                         resultFor: Long => String): RpcTransport.Post =
    (_, body) => {
      record.synchronized { record += body }
      val req = mapper.readTree(body)
      assert(req.isArray, "connector must POST a JSON-RPC batch array")
      val items = (0 until req.size()).map { i =>
        val id = req.get(i).get("id").asLong()
        s"""{"jsonrpc":"2.0","id":$id,"result":"${resultFor(id)}"}"""
      }
      // reversed: the connector must match by id, not position
      items.reverse.mkString("[", ",", "]")
    }

  describe("BinsAbi (public Solidity ABI rules)") {
    it("encodes calldata as selector + five static words") {
      val data = BinsAbi.encodeCall(RpcBinsTask("0xA5c68C9E55Dde3505e60c4B5eAe411e2977dfB35",
        "0xaB12", 8388608L, 1000L, 1000L))
      assert(data.startsWith("0x" + BinsAbi.selector))
      assert(BinsAbi.selector.length == 8)
      assert(data.length == 2 + 8 + 5 * 64)
      // uint24 args land right-aligned in their words
      assert(data.substring(2 + 8 + 2 * 64, 2 + 8 + 3 * 64).endsWith("800000"))
      assert(data.substring(2 + 8 + 3 * 64, 2 + 8 + 4 * 64).endsWith("3e8"))
    }
    it("decodeBins inverts encodeResult, including uint128-scale reserves") {
      assert(BinsAbi.decodeBins(result1) == bins1)
      assert(BinsAbi.decodeBins(BinsAbi.encodeResult(1L, Nil)) == Nil)
    }
  }

  describe("RpcBinsSource (executor-side batched eth_call plane)") {
    it("batches tasks into one POST per partition and decodes matched-by-id rows") {
      val posts = scala.collection.mutable.Buffer.empty[String]
      RpcTransport.setOverride(cannedNode(posts, _ => result1))
      try {
        val tasks = (1 to 5).map(i => s"0xP$i,0xU$i,8388608,1000,1000").mkString(";")
        val df = spark.read.format("graft.sources.RpcBinsSource")
          .option("endpoint", "https://node/rpc")
          .option("contract", "0xA5c68C9E55Dde3505e60c4B5eAe411e2977dfB35")
          .option("tasks", tasks).option("batchSize", "2").load()
        assert(df.rdd.getNumPartitions == 3) // ceil(5/2) batches
        val rows = df.collect()
        assert(rows.length == 5 * bins1.length)
        assert(posts.size == 3)
        // every batch body is JSON-RPC 2.0 eth_call with our calldata
        posts.foreach { b =>
          val arr = mapper.readTree(b)
          (0 until arr.size()).foreach { i =>
            assert(arr.get(i).get("method").asText() == "eth_call")
            assert(arr.get(i).get("params").get(0).get("data").asText()
              .startsWith("0x" + BinsAbi.selector))
          }
        }
        // the uint128-scale reserve survives the decimal(38,0) decode
        val big = df.filter($"binId" === 8388608L)
          .select($"reserveX".cast("string")).as[String].collect().toSet
        assert(big == Set("123456789012345678901234567890"))
        // task identity is carried onto every decoded row
        assert(df.select($"user_address").as[String].distinct().collect().toSet ==
          (1 to 5).map(i => s"0xU$i").toSet)
      } finally RpcTransport.clearOverride()
    }

    it("quarantines a per-item RPC error without losing the rest of the batch") {
      RpcTransport.setOverride { (_, body) =>
        val req = mapper.readTree(body)
        (0 until req.size()).map { i =>
          val id = req.get(i).get("id").asLong()
          if (id == 1)
            s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32000,"message":"execution reverted"}}"""
          else s"""{"jsonrpc":"2.0","id":$id,"result":"$result1"}"""
        }.mkString("[", ",", "]")
      }
      try {
        val schema = StructType(graft.model.Schemas.binReserves.fields :+
          StructField("_corrupt_record", StringType))
        val df = spark.read.format("graft.sources.RpcBinsSource")
          .schema(schema)
          .option("endpoint", "https://node/rpc").option("contract", "0xC")
          .option("tasks", "0xP1,0xU1,1,1,1;0xP2,0xU2,1,1,1;0xP3,0xU3,1,1,1")
          .option("batchSize", "10").option("mode", "PERMISSIVE").load()
        val bad = df.filter($"_corrupt_record".isNotNull)
          .select($"_corrupt_record").as[String].collect()
        assert(bad.length == 1 && bad(0).contains("rpc-error") &&
          bad(0).contains("0xU2") && bad(0).contains("execution reverted"))
        assert(df.filter($"_corrupt_record".isNull).count() == 2 * bins1.length)
      } finally RpcTransport.clearOverride()
    }

    it("fails the whole scan on a transport error only in FAILFAST") {
      RpcTransport.setOverride((_, _) => throw new java.io.IOException("node down"))
      try {
        val read = spark.read.format("graft.sources.RpcBinsSource")
          .option("endpoint", "https://node/rpc").option("contract", "0xC")
          .option("tasks", "0xP1,0xU1,1,1,1")
        assertThrows[org.apache.spark.SparkException] {
          read.load().collect()
        }
        val schema = StructType(graft.model.Schemas.binReserves.fields :+
          StructField("_corrupt_record", StringType))
        val lenient = read.schema(schema).option("mode", "PERMISSIVE").load()
        val bad = lenient.select($"_corrupt_record").as[String].collect()
        assert(bad.length == 1 && bad(0).contains("setup-failed") &&
          bad(0).contains("node down"))
      } finally RpcTransport.clearOverride()
    }

    it("prunes columns and pushes predicates like the other connectors") {
      RpcTransport.setOverride(cannedNode(
        scala.collection.mutable.Buffer.empty[String], _ => result1))
      try {
        val df = spark.read.format("graft.sources.RpcBinsSource")
          .option("endpoint", "https://node/rpc").option("contract", "0xC")
          .option("tasks", "0xP1,0xU1,1,1,1").load()
          .filter($"binId" === 8388607L).select($"binId", $"shares")
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("EqualTo(binId,8388607)"), s"plan:\n$plan")
        assert(plan.contains("binId") && !plan.contains("reserveY"), s"plan:\n$plan")
        assert(df.count() == 1)
      } finally RpcTransport.clearOverride()
    }
  }
}
