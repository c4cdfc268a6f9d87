package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "abc", "en", "src1", 3L),
    (2L, "", "de", "src0", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  describe("mediaFromDocuments") {
    it("builds binary payloads with typed metadata") {
      val m = Multimodal.mediaFromDocuments(docs)
      assert(m.schema("payload").dataType.typeName == "binary")
      val r = m.filter($"media_id" === 0).head()
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("sample_rate") == 16000)
      val mods = m.select($"modality").as[String].collect().toSet
      assert(mods.subsetOf(Set("image", "audio", "video")))
    }
  }

  describe("extractFeatures (partition-batched decode stub)") {
    it("emits deterministic byte statistics per payload") {
      val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      val r = f.filter($"media_id" === 1).head() // "abc" = bytes 97,98,99
      assert(r.getAs[Long]("n_bytes") == 3)
      assert(r.getAs[Double]("byte_mean") == 98.0)
      val hist = r.getAs[scala.collection.Seq[Long]]("histogram")
      assert(hist.sum == 3)
      assert(hist(97 % 16) >= 1)
      // empty payload handled, not crashed
      val empty = f.filter($"media_id" === 2).head()
      assert(empty.getAs[Long]("n_bytes") == 0 && empty.getAs[Double]("byte_mean") == 0.0)
    }
  }

  describe("frameSamplePlan (q174 schedule)") {
    it("pins the uniform-stride schedule properties per video") {
      // videos with n_frames sweeping below/at/above the budget:
      // doc_id % 3 == 2 selects videos; n_frames = n_chars % 64 + 1
      val wide = (0L until 60L).map { i =>
        (i, "x" * (i % 70).toInt, "en", s"src${i % 3}", i % 70)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val plan = Multimodal
        .frameSamplePlan(Multimodal.mediaFromDocuments(wide), budget = 8)
        .collect()
        .groupBy(_.getAs[Long]("media_id"))
      assert(plan.nonEmpty)
      plan.foreach { case (_, rows) =>
        val n = rows.head.getAs[Int]("n_frames")
        val sorted = rows.sortBy(_.getAs[Int]("sample_i"))
        val idx = sorted.map(_.getAs[Long]("frame_idx"))
        // exactly min(n, budget) samples, sample_i dense from 0
        assert(rows.length == math.min(n, 8))
        assert(sorted.map(_.getAs[Int]("sample_i")).toSeq ==
          (0 until rows.length))
        // schedule starts at frame 0, stays in range, strictly increases
        assert(idx.head == 0L)
        assert(idx.last <= n - 1L)
        assert(idx.zip(idx.tail).forall { case (a, b) => a < b })
        // below the budget the schedule is the identity (every frame)
        if (n < 8) assert(idx.toSeq == (0L until n.toLong))
      }
    }
  }

  describe("sampleFrames") {
    it("partitions the payload into stride-sampled frame chunks") {
      val frames = Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docs), stride = 2)
      val f0 = frames.filter($"media_id" === 0).orderBy($"frame_idx").collect()
      assert(f0.nonEmpty)
      assert(f0.map(_.getAs[Int]("frame_idx")).forall(_ % 2 == 0))
      assert(f0.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
    }
  }
}
