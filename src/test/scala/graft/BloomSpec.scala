package graft

import graft.functions.BloomFns._
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 12
  private val K = 5

  private def bitmapOf(keys: Seq[String], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(bloomBuild($"k", M, K).as("bf"))
      .select($"bf").as[Array[Byte]].head()

  describe("BloomBuildAgg / BloomMightContain") {
    it("has zero false negatives: every inserted key probes true") {
      val keys = (0 until 200).map(i => s"key-$i")
      val bloom = keys.toDF("k").agg(bloomBuild($"k", M, K).as("bf"))
      val misses = keys.toDF("k").crossJoin(bloom)
        .filter(!bloomMightContain($"bf", $"k", M, K)).count()
      assert(misses == 0)
    }
    it("bitmap is partition-independent (merge = OR is order-insensitive)") {
      val keys = (0 until 500).map(i => s"key-$i")
      assert(java.util.Arrays.equals(bitmapOf(keys, 1), bitmapOf(keys, 7)))
    }
    it("empty input yields the all-zero bitmap and probes all-false") {
      val empty = Seq.empty[String].toDF("k").agg(bloomBuild($"k", M, K).as("bf"))
      val probes = Seq("a", "b").toDF("k").crossJoin(empty)
        .filter(bloomMightContain($"bf", $"k", M, K)).count()
      assert(probes == 0)
      assert(empty.select($"bf").as[Array[Byte]].head().forall(_ == 0))
    }
    it("null keys are skipped, not inserted") {
      val bloom = Seq(Some("x"), None, Some("y")).toDF("k")
        .agg(bloomBuild($"k", M, K).as("bf"))
      val one = Seq("x").toDF("k").crossJoin(bloom)
        .filter(bloomMightContain($"bf", $"k", M, K)).count()
      assert(one == 1)
    }
    it("a saturated tiny filter produces false positives but still no false negatives") {
      // 64 bits, 40 keys x 3 hashes: essentially every bit set
      val inserted = (0 until 40).map(i => s"in-$i")
      val bloom = inserted.toDF("k").agg(bloomBuild($"k", 64, 3).as("bf"))
      val fn = inserted.toDF("k").crossJoin(bloom)
        .filter(!bloomMightContain($"bf", $"k", 64, 3)).count()
      assert(fn == 0)
      val fp = (0 until 40).map(i => s"out-$i").toDF("k").crossJoin(bloom)
        .filter(bloomMightContain($"bf", $"k", 64, 3)).count()
      assert(fp > 0, "a saturated 64-bit filter must collide")
    }
  }
}
