package graft

import graft.functions.{Eip55, Keccak256}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Eip55Spec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  describe("Keccak-256") {
    it("matches the published digests (original Keccak padding, not FIPS SHA3)") {
      assert(hex(Keccak256.hash(Array.empty)) ==
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
      assert(hex(Keccak256.hash("abc".getBytes("UTF-8"))) ==
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    }
    it("absorbs multi-block and exact-rate-boundary messages") {
      val a135 = Keccak256.hash(Array.fill[Byte](135)('a'))
      val a136 = Keccak256.hash(Array.fill[Byte](136)('a')) // full padding block
      val a300 = Keccak256.hash(Array.fill[Byte](300)('a')) // 3-block absorb
      assert(Seq(a135, a136, a300).forall(_.length == 32))
      assert(hex(a135) != hex(a136) && hex(a136) != hex(a300))
    }
  }

  describe("EIP-55 checksum") {
    // the EIP's own published test vectors
    val vectors = Seq(
      "0x52908400098527886E0F7030069857D2E4169EE7", // all caps
      "0x8617E340B3D01FA5F11F306F4090FD50E238070D",
      "0xde709f2102306220921060314715629080e2fb77", // all lower
      "0x27b1fdb04752bbc536007a920d24acb045561c26",
      "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed", // mixed
      "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
      "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
      "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb")

    it("reproduces every test vector from the EIP") {
      vectors.foreach { v =>
        assert(Eip55.checksum(UTF8String.fromString(v.toLowerCase)).toString == v)
      }
    }
    it("works as a codegen'd column expression") {
      val out = vectors.map(_.toLowerCase).toDF("addr")
        .select(Eip55.eip55_checksum($"addr").as("c")).as[String].collect().toSeq
      assert(out == vectors)
    }
    it("yields null on malformed input instead of failing the task") {
      val bad = Seq("xyz", "0x1234", "0xgg08400098527886e0f7030069857d2e4169ee7")
        .toDF("addr").select(Eip55.eip55_checksum($"addr")).collect()
      assert(bad.forall(_.isNullAt(0)))
    }
  }
}
